// Native H.264 baseline-intra slice codec — the hot path behind
// codecs/h264.py's compressed V1 texture track. Bit-identical port of
// codecs/h264_intra.py (the Python SliceCoder stays as oracle and
// fallback; parity locked by tests/test_h264_intra.py):
//   encode: I_4x4 mode decision (SAD + mode-bit cost), chroma DC/H/V,
//           per-MB I_PCM escape rows, CAVLC, full slice RBSP emit.
//   decode: I_PCM + I_4x4 + I_16x16 + all chroma modes, slice-header
//           parse for the SPS/PPS shapes the Python layer validates.
// Build: g++ -O3 -shared -fPIC h264_native.cpp -o libuvt_h264.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <vector>

namespace {

#include "h264_tables.inc"

// ---------------------------------------------------------------------------
// Bit I/O (MSB-first) + Exp-Golomb
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t *d;
  long nbits, pos = 0;
  bool ok = true;
  BitReader(const uint8_t *data, long nbytes) : d(data), nbits(8 * nbytes) {}
  uint32_t u(int bits) {
    if (pos + bits > nbits) { ok = false; return 0; }
    uint32_t v = 0;
    for (int i = 0; i < bits; ++i) {
      v = (v << 1) | ((d[pos >> 3] >> (7 - (pos & 7))) & 1);
      ++pos;
    }
    return v;
  }
  uint32_t ue() {
    int zeros = 0;
    while (ok && u(1) == 0) {
      if (++zeros > 31) { ok = false; return 0; }
    }
    return ((1u << zeros) - 1) + (zeros ? u(zeros) : 0);
  }
  int32_t se() {
    uint32_t k = ue();
    return (k % 2) ? (int32_t)((k + 1) / 2) : -(int32_t)(k / 2);
  }
  void align() { pos = (pos + 7) & ~7L; }
  const uint8_t *bytes_at(long n) {
    if (pos % 8 || pos + 8 * n > nbits) { ok = false; return nullptr; }
    const uint8_t *p = d + (pos >> 3);
    pos += 8 * n;
    return p;
  }
};

struct BitWriter {
  std::vector<uint8_t> bytes;
  uint32_t acc = 0;
  int n = 0;
  void u(uint32_t v, int bits) {
    for (int i = bits - 1; i >= 0; --i) {
      acc = (acc << 1) | ((v >> i) & 1);
      if (++n == 8) { bytes.push_back((uint8_t)acc); acc = 0; n = 0; }
    }
  }
  void ue(uint32_t v) {
    ++v;
    int nb = 32 - __builtin_clz(v);
    u(0, nb - 1);
    u(v, nb);
  }
  void se(int32_t v) { ue(v > 0 ? 2 * v - 1 : -2 * v); }
  void align() { while (n) u(0, 1); }
  void raw(const uint8_t *p, long len) {
    bytes.insert(bytes.end(), p, p + len);
  }
  void trailing() { u(1, 1); align(); }
};

int read_vlc(BitReader &r, const uint8_t *lens, const uint8_t *bits, int n,
             int max_len = 24) {
  uint32_t code = 0;
  for (int length = 1; length <= max_len; ++length) {
    if (!r.ok) return -1;
    code = (code << 1) | r.u(1);
    for (int i = 0; i < n; ++i)
      if (lens[i] == length && bits[i] == code) return i;
  }
  r.ok = false;
  return -1;
}

// ---------------------------------------------------------------------------
// CAVLC residual block (9.2) — mirrors read/write_residual_block
// ---------------------------------------------------------------------------

int read_residual(BitReader &r, int nc, int max_coeff, int64_t out[16]) {
  std::memset(out, 0, 16 * sizeof(int64_t));
  int idx;
  if (nc == -1) {
    idx = read_vlc(r, kCdcTokenLen, kCdcTokenBits, 20);
  } else if (nc < 2) {
    idx = read_vlc(r, kCoeffTokenLen0, kCoeffTokenBits0, 68);
  } else if (nc < 4) {
    idx = read_vlc(r, kCoeffTokenLen1, kCoeffTokenBits1, 68);
  } else if (nc < 8) {
    idx = read_vlc(r, kCoeffTokenLen2, kCoeffTokenBits2, 68);
  } else {
    uint32_t code = r.u(6);
    idx = (code == 3) ? 0 : 4 * (code / 4 + 1) + code % 4;
  }
  if (idx < 0 || !r.ok) return -1;
  int total_coeff = idx / 4, t1s = idx % 4;
  if (total_coeff == 0) return 0;
  if (total_coeff > max_coeff) return -1;
  int64_t levels[16];
  int nl = 0;
  for (int i = 0; i < t1s; ++i) levels[nl++] = r.u(1) ? -1 : 1;
  int suffix_length = (total_coeff > 10 && t1s < 3) ? 1 : 0;
  for (int i = 0; i < total_coeff - t1s; ++i) {
    int prefix = 0;
    while (r.ok && r.u(1) == 0)
      if (++prefix > 32) return -1;
    if (!r.ok) return -1;
    int size;
    if (prefix == 14 && suffix_length == 0) size = 4;
    else if (prefix >= 15) size = prefix - 3;
    else size = suffix_length;
    int64_t suffix = size ? r.u(size) : 0;
    int64_t level_code = ((int64_t)(prefix < 15 ? prefix : 15)
                          << suffix_length) + suffix;
    if (prefix >= 15 && suffix_length == 0) level_code += 15;
    if (prefix >= 16) level_code += (1ll << (prefix - 3)) - 4096;
    if (i == 0 && t1s < 3) level_code += 2;
    int64_t level = (level_code + 2) >> 1;
    if (level_code & 1) level = -level;
    levels[nl++] = level;
    if (suffix_length == 0) suffix_length = 1;
    if (llabs(level) > (3ll << (suffix_length - 1)) && suffix_length < 6)
      ++suffix_length;
  }
  int tz = 0;
  if (total_coeff < max_coeff) {
    if (nc == -1)
      tz = read_vlc(r, kCdcTzLen + 4 * (total_coeff - 1),
                    kCdcTzBits + 4 * (total_coeff - 1), 4);
    else
      tz = read_vlc(r, kTzLen + 16 * (total_coeff - 1),
                    kTzBits + 16 * (total_coeff - 1), 16);
    if (tz < 0) return -1;
  }
  if (total_coeff + tz > max_coeff) return -1;
  int pos = total_coeff + tz - 1;
  int zeros_left = tz;
  for (int i = 0; i < total_coeff; ++i) {
    if (pos < 0) return -1;
    out[pos] = levels[i];
    if (i < total_coeff - 1) {
      int run = 0;
      if (zeros_left > 0) {
        int zl = zeros_left < 7 ? zeros_left : 7;
        run = read_vlc(r, kRunLen + 15 * (zl - 1), kRunBits + 15 * (zl - 1),
                       15);
        if (run < 0 || run > zeros_left) return -1;
      }
      zeros_left -= run;
      pos -= run + 1;
    }
  }
  return total_coeff;
}

void write_level_code(BitWriter &w, int64_t level_code, int s) {
  int64_t s_base;
  if (s == 0) {
    if (level_code < 14) { w.u(1, (int)level_code + 1); return; }
    if (level_code < 30) { w.u(1, 15); w.u((uint32_t)(level_code - 14), 4); return; }
    level_code -= 15;
    s_base = 15;
  } else {
    s_base = 15ll << s;
    if (level_code < s_base) {
      w.u(1, (int)(level_code >> s) + 1);
      w.u((uint32_t)(level_code & ((1 << s) - 1)), s);
      return;
    }
  }
  if (level_code < s_base + 4096) {
    w.u(1, 16);
    w.u((uint32_t)(level_code - s_base), 12);
    return;
  }
  int p = 16;
  while (level_code - s_base - ((1ll << (p - 3)) - 4096) >= (1ll << (p - 3)))
    ++p;
  w.u(1, p + 1);
  w.u((uint32_t)(level_code - s_base - ((1ll << (p - 3)) - 4096)), p - 3);
}

int write_residual(BitWriter &w, const int64_t *coeffs, int max_coeff,
                   int nc) {
  int nz[16], total_coeff = 0;
  for (int i = 0; i < max_coeff; ++i)
    if (coeffs[i]) nz[total_coeff++] = i;
  int t1s = 0;
  for (int i = total_coeff - 1; i >= 0; --i) {
    if (llabs(coeffs[nz[i]]) == 1 && t1s < 3) ++t1s;
    else break;
  }
  int idx = total_coeff * 4 + t1s;
  if (nc == -1) w.u(kCdcTokenBits[idx], kCdcTokenLen[idx]);
  else if (nc < 2) w.u(kCoeffTokenBits0[idx], kCoeffTokenLen0[idx]);
  else if (nc < 4) w.u(kCoeffTokenBits1[idx], kCoeffTokenLen1[idx]);
  else if (nc < 8) w.u(kCoeffTokenBits2[idx], kCoeffTokenLen2[idx]);
  else w.u(kCoeffTokenBits3[idx], 6);
  if (total_coeff == 0) return 0;
  for (int i = 0; i < t1s; ++i)
    w.u(coeffs[nz[total_coeff - 1 - i]] < 0 ? 1 : 0, 1);
  int suffix_length = (total_coeff > 10 && t1s < 3) ? 1 : 0;
  for (int i = 0; i < total_coeff - t1s; ++i) {
    int64_t level = coeffs[nz[total_coeff - 1 - t1s - i]];
    int64_t level_code = 2 * llabs(level) - 2 + (level < 0 ? 1 : 0);
    if (i == 0 && t1s < 3) level_code -= 2;
    write_level_code(w, level_code, suffix_length);
    if (suffix_length == 0) suffix_length = 1;
    if (llabs(level) > (3ll << (suffix_length - 1)) && suffix_length < 6)
      ++suffix_length;
  }
  int tz = nz[total_coeff - 1] + 1 - total_coeff;
  if (total_coeff < max_coeff) {
    if (nc == -1)
      w.u(kCdcTzBits[4 * (total_coeff - 1) + tz],
          kCdcTzLen[4 * (total_coeff - 1) + tz]);
    else
      w.u(kTzBits[16 * (total_coeff - 1) + tz],
          kTzLen[16 * (total_coeff - 1) + tz]);
  }
  int zeros_left = tz;
  for (int i = 0; i < total_coeff - 1; ++i) {
    int run = nz[total_coeff - 1 - i] - nz[total_coeff - 2 - i] - 1;
    if (zeros_left > 0) {
      int zl = zeros_left < 7 ? zeros_left : 7;
      w.u(kRunBits[15 * (zl - 1) + run], kRunLen[15 * (zl - 1) + run]);
    }
    zeros_left -= run;
  }
  return total_coeff;
}

// ---------------------------------------------------------------------------
// Transforms / quant
// ---------------------------------------------------------------------------

inline uint8_t clip8(int64_t x) {
  return (uint8_t)(x < 0 ? 0 : (x > 255 ? 255 : x));
}

void forward4x4(const int64_t x[16], int64_t w[16]) {
  static const int c[4][4] = {
      {1, 1, 1, 1}, {2, 1, -1, -2}, {1, -1, -1, 1}, {1, -2, 2, -1}};
  int64_t t[16];
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      int64_t s = 0;
      for (int k = 0; k < 4; ++k) s += c[i][k] * x[4 * k + j];
      t[4 * i + j] = s;
    }
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      int64_t s = 0;
      for (int k = 0; k < 4; ++k) s += t[4 * i + k] * c[j][k];
      w[4 * i + j] = s;
    }
}

void inverse4x4(const int64_t d[16], int64_t out[16]) {
  int64_t f[16];
  for (int i = 0; i < 4; ++i) {  // rows
    int64_t d0 = d[4 * i], d1 = d[4 * i + 1], d2 = d[4 * i + 2],
            d3 = d[4 * i + 3];
    int64_t e0 = d0 + d2, e1 = d0 - d2, e2 = (d1 >> 1) - d3,
            e3 = d1 + (d3 >> 1);
    f[4 * i] = e0 + e3;
    f[4 * i + 1] = e1 + e2;
    f[4 * i + 2] = e1 - e2;
    f[4 * i + 3] = e0 - e3;
  }
  for (int j = 0; j < 4; ++j) {  // columns
    int64_t f0 = f[j], f1 = f[4 + j], f2 = f[8 + j], f3 = f[12 + j];
    int64_t g0 = f0 + f2, g1 = f0 - f2, g2 = (f1 >> 1) - f3,
            g3 = f1 + (f3 >> 1);
    out[j] = (g0 + g3 + 32) >> 6;
    out[4 + j] = (g1 + g2 + 32) >> 6;
    out[8 + j] = (g1 - g2 + 32) >> 6;
    out[12 + j] = (g0 - g3 + 32) >> 6;
  }
}

void quant4x4(const int64_t w[16], int qp, bool skip_dc, int64_t out[16]) {
  int qbits = 15 + qp / 6;
  int64_t f = (1ll << qbits) / 3;
  for (int i = 0; i < 16; ++i) {
    int64_t mf = kQuantMF[3 * (qp % 6) + kPosClass[i]];
    int64_t lv = (llabs(w[i]) * mf + f) >> qbits;
    out[i] = w[i] < 0 ? -lv : lv;
  }
  if (skip_dc) out[0] = 0;
}

void dequant4x4(const int64_t c[16], int qp, int64_t out[16]) {
  for (int i = 0; i < 16; ++i) {
    int64_t v = kDequantV[3 * (qp % 6) + kPosClass[i]];
    out[i] = (c[i] * v) << (qp / 6);
  }
}

// ---------------------------------------------------------------------------
// Intra prediction
// ---------------------------------------------------------------------------

// left[4] / top[4] / tr[4] / tl valid per flags; out row-major 4x4
bool predict4x4(int mode, const int64_t *left, const int64_t *top,
                const int64_t *tr, int64_t tl, bool has_l, bool has_t,
                bool has_tl, int64_t p[16]) {
  int64_t t[8];
  if (has_t) {
    for (int i = 0; i < 4; ++i) t[i] = top[i];
    for (int i = 0; i < 4; ++i) t[4 + i] = tr ? tr[i] : top[3];
  }
  auto T = [&](int i) { return i < 0 ? tl : t[i]; };
  auto L = [&](int i) { return i < 0 ? tl : left[i]; };
  switch (mode) {
    case 0:
      if (!has_t) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) p[4 * y + x] = t[x];
      return true;
    case 1:
      if (!has_l) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) p[4 * y + x] = left[y];
      return true;
    case 2: {
      int64_t dc;
      if (has_t && has_l) {
        int64_t s = 0;
        for (int i = 0; i < 4; ++i) s += t[i] + left[i];
        dc = (s + 4) >> 3;
      } else if (has_t) {
        int64_t s = t[0] + t[1] + t[2] + t[3];
        dc = (s + 2) >> 2;
      } else if (has_l) {
        int64_t s = left[0] + left[1] + left[2] + left[3];
        dc = (s + 2) >> 2;
      } else {
        dc = 128;
      }
      for (int i = 0; i < 16; ++i) p[i] = dc;
      return true;
    }
    case 3:
      if (!has_t) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          if (x == 3 && y == 3)
            p[4 * y + x] = (T(6) + 3 * T(7) + 2) >> 2;
          else {
            int i = x + y;
            p[4 * y + x] = (T(i) + 2 * T(i + 1) + T(i + 2) + 2) >> 2;
          }
        }
      return true;
    case 4:
      if (!has_t || !has_l) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          if (x > y)
            p[4 * y + x] =
                (T(x - y - 2) + 2 * T(x - y - 1) + T(x - y) + 2) >> 2;
          else if (x < y)
            p[4 * y + x] =
                (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2;
          else
            p[4 * y + x] = (T(0) + 2 * tl + L(0) + 2) >> 2;
        }
      return true;
    case 5:
      if (!has_t || !has_l) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = 2 * x - y, i = x - (y >> 1);
          if (z >= 0 && z % 2 == 0)
            p[4 * y + x] = (T(i - 1) + T(i) + 1) >> 1;
          else if (z >= 0)
            p[4 * y + x] = (T(i - 2) + 2 * T(i - 1) + T(i) + 2) >> 2;
          else if (z == -1)
            p[4 * y + x] = (L(0) + 2 * tl + T(0) + 2) >> 2;
          else
            p[4 * y + x] = (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2;
        }
      return true;
    case 6:
      if (!has_t || !has_l) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = 2 * y - x, i = y - (x >> 1);
          if (z >= 0 && z % 2 == 0)
            p[4 * y + x] = (L(i - 1) + L(i) + 1) >> 1;
          else if (z >= 0)
            p[4 * y + x] = (L(i - 2) + 2 * L(i - 1) + L(i) + 2) >> 2;
          else if (z == -1)
            p[4 * y + x] = (L(0) + 2 * tl + T(0) + 2) >> 2;
          else
            p[4 * y + x] = (T(x - 1) + 2 * T(x - 2) + T(x - 3) + 2) >> 2;
        }
      return true;
    case 7:
      if (!has_t) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int i = x + (y >> 1);
          if (y % 2 == 0)
            p[4 * y + x] = (T(i) + T(i + 1) + 1) >> 1;
          else
            p[4 * y + x] = (T(i) + 2 * T(i + 1) + T(i + 2) + 2) >> 2;
        }
      return true;
    case 8:
      if (!has_l) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = x + 2 * y, i = y + (x >> 1);
          if (z % 2 == 0 && z < 6)
            p[4 * y + x] = (L(i) + L(i + 1) + 1) >> 1;
          else if (z % 2 == 1 && z < 5)
            p[4 * y + x] = (L(i) + 2 * L(i + 1) + L(i + 2) + 2) >> 2;
          else if (z == 5)
            p[4 * y + x] = (L(2) + 3 * L(3) + 2) >> 2;
          else
            p[4 * y + x] = L(3);
        }
      return true;
  }
  return false;
}

// chroma 8x8 prediction into p[64] (row-major)
bool predict_chroma(int mode, const uint8_t *plane, int stride, int cx,
                    int cy, bool has_l, bool has_t, int64_t p[64]) {
  int64_t left[8], top[8];
  if (has_l)
    for (int i = 0; i < 8; ++i) left[i] = plane[(cy + i) * stride + cx - 1];
  if (has_t)
    for (int i = 0; i < 8; ++i) top[i] = plane[(cy - 1) * stride + cx + i];
  if (mode == 0) {
    for (int qy = 0; qy < 8; qy += 4)
      for (int qx = 0; qx < 8; qx += 4) {
        int64_t dc;
        bool use_t = has_t, use_l = has_l;
        if (qx != qy) {  // off-diagonal quadrants prefer one side
          if (qx == 4) { use_l = has_l && !has_t; }
          else { use_t = has_t && !has_l; }
        }
        int64_t st = 0, sl = 0;
        for (int i = 0; i < 4; ++i) {
          if (has_t) st += top[qx + i];
          if (has_l) sl += left[qy + i];
        }
        if (use_t && use_l) dc = (st + sl + 4) >> 3;
        else if (use_t) dc = (st + 2) >> 2;
        else if (use_l) dc = (sl + 2) >> 2;
        else dc = 128;
        for (int y = 0; y < 4; ++y)
          for (int x = 0; x < 4; ++x) p[(qy + y) * 8 + qx + x] = dc;
      }
    return true;
  }
  if (mode == 1) {
    if (!has_l) return false;
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x) p[8 * y + x] = left[y];
    return true;
  }
  if (mode == 2) {
    if (!has_t) return false;
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x) p[8 * y + x] = top[x];
    return true;
  }
  if (mode == 3) {
    if (!has_t || !has_l) return false;
    int64_t tl = plane[(cy - 1) * stride + cx - 1];
    int64_t hh = 0, vv = 0;
    for (int i = 0; i < 4; ++i) {
      hh += (i + 1) * (top[4 + i] - (2 - i >= 0 ? top[2 - i] : tl));
      vv += (i + 1) * (left[4 + i] - (2 - i >= 0 ? left[2 - i] : tl));
    }
    int64_t a = 16 * (left[7] + top[7]);
    int64_t b = (17 * hh + 16) >> 5, c = (17 * vv + 16) >> 5;
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x)
        p[8 * y + x] = clip8((a + b * (x - 3) + c * (y - 3) + 16) >> 5);
    return true;
  }
  return false;
}

bool predict16(int mode, const uint8_t *plane, int stride, int x0, int y0,
               bool has_l, bool has_t, int64_t p[256]) {
  int64_t left[16], top[16];
  if (has_l)
    for (int i = 0; i < 16; ++i) left[i] = plane[(y0 + i) * stride + x0 - 1];
  if (has_t)
    for (int i = 0; i < 16; ++i) top[i] = plane[(y0 - 1) * stride + x0 + i];
  if (mode == 0) {
    if (!has_t) return false;
    for (int y = 0; y < 16; ++y)
      for (int x = 0; x < 16; ++x) p[16 * y + x] = top[x];
    return true;
  }
  if (mode == 1) {
    if (!has_l) return false;
    for (int y = 0; y < 16; ++y)
      for (int x = 0; x < 16; ++x) p[16 * y + x] = left[y];
    return true;
  }
  if (mode == 2) {
    int64_t dc;
    if (has_t && has_l) {
      int64_t s = 0;
      for (int i = 0; i < 16; ++i) s += top[i] + left[i];
      dc = (s + 16) >> 5;
    } else if (has_t || has_l) {
      int64_t s = 0;
      const int64_t *src = has_t ? top : left;
      for (int i = 0; i < 16; ++i) s += src[i];
      dc = (s + 8) >> 4;
    } else {
      dc = 128;
    }
    for (int i = 0; i < 256; ++i) p[i] = dc;
    return true;
  }
  if (mode == 3) {
    if (!has_t || !has_l) return false;
    int64_t tl = plane[(y0 - 1) * stride + x0 - 1];
    int64_t hh = 0, vv = 0;
    for (int i = 0; i < 8; ++i) {
      hh += (i + 1) * (top[8 + i] - (6 - i >= 0 ? top[6 - i] : tl));
      vv += (i + 1) * (left[8 + i] - (6 - i >= 0 ? left[6 - i] : tl));
    }
    int64_t a = 16 * (left[15] + top[15]);
    int64_t b = (5 * hh + 32) >> 6, c = (5 * vv + 32) >> 6;
    for (int y = 0; y < 16; ++y)
      for (int x = 0; x < 16; ++x)
        p[16 * y + x] = clip8((a + b * (x - 7) + c * (y - 7) + 16) >> 5);
    return true;
  }
  return false;
}

// ---------------------------------------------------------------------------
// Slice context
// ---------------------------------------------------------------------------

struct Slice {
  int cw, ch, qp, cqp_off;
  uint8_t *y, *cb, *cr;
  std::vector<int16_t> tc_y, tc_cb, tc_cr;
  std::vector<int8_t> modes;
  Slice(int w, int h, int qp_, int cqp, uint8_t *py, uint8_t *pcb,
        uint8_t *pcr)
      : cw(w), ch(h), qp(qp_), cqp_off(cqp), y(py), cb(pcb), cr(pcr),
        tc_y((h / 4) * (w / 4), 0), tc_cb((h / 8) * (w / 8), 0),
        tc_cr((h / 8) * (w / 8), 0), modes((h / 4) * (w / 4), -1) {}
  int nc_of(const std::vector<int16_t> &plane, int cols, int bx, int by) {
    int na = bx > 0 ? plane[by * cols + bx - 1] : -1;
    int nb = by > 0 ? plane[(by - 1) * cols + bx] : -1;
    if (na >= 0 && nb >= 0) return (na + nb + 1) >> 1;
    if (na >= 0) return na;
    if (nb >= 0) return nb;
    return 0;
  }
  int nc_luma(int bx, int by) { return nc_of(tc_y, cw / 4, bx, by); }
  int pred_mode4(int bx, int by) {
    int a = bx > 0 ? modes[by * (cw / 4) + bx - 1] : -1;
    int b = by > 0 ? modes[(by - 1) * (cw / 4) + bx] : -1;
    if (a < 0 || b < 0) return 2;
    return a < b ? a : b;
  }
  void mark_pcm(int mbx, int mby) {
    for (int j = 0; j < 4; ++j)
      for (int i = 0; i < 4; ++i) {
        tc_y[(4 * mby + j) * (cw / 4) + 4 * mbx + i] = 16;
        modes[(4 * mby + j) * (cw / 4) + 4 * mbx + i] = 2;
      }
    for (int j = 0; j < 2; ++j)
      for (int i = 0; i < 2; ++i) {
        tc_cb[(2 * mby + j) * (cw / 8) + 2 * mbx + i] = 16;
        tc_cr[(2 * mby + j) * (cw / 8) + 2 * mbx + i] = 16;
      }
  }
  // luma 4x4 neighbors; returns availability mask
  void luma_neighbors(int x0, int y0, int blk, int64_t left[4],
                      int64_t top[4], int64_t tr[4], int64_t &tl,
                      bool &has_l, bool &has_t, bool &has_tr) {
    has_l = x0 > 0;
    has_t = y0 > 0;
    static const bool no_tr[16] = {0, 0, 0, 1, 0, 0, 0, 1,
                                   0, 0, 0, 1, 0, 1, 0, 1};
    has_tr = has_t && (x0 + 8 <= cw) && !no_tr[blk];
    if (has_l)
      for (int i = 0; i < 4; ++i) left[i] = y[(y0 + i) * cw + x0 - 1];
    if (has_t)
      for (int i = 0; i < 4; ++i) top[i] = y[(y0 - 1) * cw + x0 + i];
    if (has_tr)
      for (int i = 0; i < 4; ++i) tr[i] = y[(y0 - 1) * cw + x0 + 4 + i];
    tl = (has_l && has_t) ? y[(y0 - 1) * cw + x0 - 1] : 0;
  }
};

void add_block(uint8_t *plane, int stride, int x0, int y0,
               const int64_t pred[16], const int64_t d[16]) {
  int64_t res[16];
  inverse4x4(d, res);
  for (int y = 0; y < 4; ++y)
    for (int x = 0; x < 4; ++x)
      plane[(y0 + y) * stride + x0 + x] = clip8(pred[4 * y + x] + res[4 * y + x]);
}

void scan_to_raster(const int64_t scan[16], int64_t raster[16]) {
  for (int i = 0; i < 16; ++i) raster[kZigzag[i]] = scan[i];
}

}  // namespace

// ---------------------------------------------------------------------------
// Decode entry
// ---------------------------------------------------------------------------

extern "C" int uvt_h264_decode_slice(
    const uint8_t *rbsp, long rbsp_len,
    int coded_w, int coded_h, int log2_max_frame_num, int poc_type,
    int log2_max_poc, int pic_init_qp, int cqp_offset,
    int deblock_present, int bottom_poc_present, int redundant_present,
    int idr, int nal_ref_idc,
    const uint8_t *prev_y, const uint8_t *prev_cb, const uint8_t *prev_cr,
    uint8_t *out_y, uint8_t *out_cb, uint8_t *out_cr) {
  BitReader r(rbsp, rbsp_len);
  if (r.ue() != 0) return -2;  // multi-slice
  uint32_t slice_type = r.ue();
  bool is_p = slice_type % 5 == 0;
  if (!is_p && slice_type % 5 != 2) return -2;
  if (is_p && (idr || !prev_y)) return -2;
  r.ue();
  r.u(log2_max_frame_num);
  if (idr) r.ue();
  if (poc_type == 0) {
    r.u(log2_max_poc);
    if (bottom_poc_present) r.se();
  }
  if (redundant_present) r.ue();
  if (is_p) {
    if (r.u(1)) {           // num_ref_idx_active_override
      if (r.ue() != 0) return -2;  // multi-ref: Python raises
    }
    if (r.u(1)) return -2;  // ref_pic_list_modification
  }
  if (idr) { r.u(1); r.u(1); }
  else if (nal_ref_idc) {
    if (r.u(1)) return -2;  // adaptive ref marking
  }
  int qp = pic_init_qp + r.se();
  if (qp < 0 || qp > 51) return -1;  // spec range; also guards table reads
  if (deblock_present) {
    uint32_t idc = r.ue();
    if (idc != 1) return -3;  // deblocking on: unsupported (Python raises)
  } else {
    return -3;  // no control flag => filter implicitly ON: refuse
  }
  if (!r.ok) return -1;
  Slice sc(coded_w, coded_h, qp, cqp_offset, out_y, out_cb, out_cr);
  std::memset(out_y, 0, (size_t)coded_w * coded_h);
  std::memset(out_cb, 0, (size_t)(coded_w / 2) * (coded_h / 2));
  std::memset(out_cr, 0, (size_t)(coded_w / 2) * (coded_h / 2));

  int w_mb = coded_w / 16, h_mb = coded_h / 16;
  int total_mbs = w_mb * h_mb;
  int mb_i = 0;
  while (mb_i < total_mbs) {
    {
      int mbx = mb_i % w_mb, mby = mb_i / w_mb;
      if (is_p) {
        uint32_t skip_run = r.ue();
        if (!r.ok || skip_run > (uint32_t)(total_mbs - mb_i)) return -1;
        for (uint32_t k = 0; k < skip_run; ++k) {
          mbx = mb_i % w_mb;
          mby = mb_i / w_mb;
          // P_Skip: copy the co-located reference macroblock
          for (int j = 0; j < 16; ++j)
            std::memcpy(out_y + (16 * mby + j) * coded_w + 16 * mbx,
                        prev_y + (16 * mby + j) * coded_w + 16 * mbx, 16);
          for (int j = 0; j < 8; ++j) {
            std::memcpy(out_cb + (8 * mby + j) * (coded_w / 2) + 8 * mbx,
                        prev_cb + (8 * mby + j) * (coded_w / 2) + 8 * mbx, 8);
            std::memcpy(out_cr + (8 * mby + j) * (coded_w / 2) + 8 * mbx,
                        prev_cr + (8 * mby + j) * (coded_w / 2) + 8 * mbx, 8);
          }
          for (int j = 0; j < 4; ++j)
            for (int i2 = 0; i2 < 4; ++i2) {
              sc.tc_y[(4 * mby + j) * (coded_w / 4) + 4 * mbx + i2] = 0;
              sc.modes[(4 * mby + j) * (coded_w / 4) + 4 * mbx + i2] = 2;
            }
          for (int j = 0; j < 2; ++j)
            for (int i2 = 0; i2 < 2; ++i2) {
              sc.tc_cb[(2 * mby + j) * (coded_w / 8) + 2 * mbx + i2] = 0;
              sc.tc_cr[(2 * mby + j) * (coded_w / 8) + 2 * mbx + i2] = 0;
            }
          ++mb_i;
        }
        if (mb_i >= total_mbs) break;
        mbx = mb_i % w_mb;
        mby = mb_i / w_mb;
      }
      ++mb_i;
      uint32_t mb_type = r.ue();
      if (!r.ok) return -1;
      if (is_p) {
        if (mb_type < 5) return -2;  // inter-predicted MB: Python raises
        mb_type -= 5;
      }
      if (mb_type == 25) {  // I_PCM
        r.align();
        const uint8_t *py = r.bytes_at(256);
        const uint8_t *pcb = r.bytes_at(64);
        const uint8_t *pcr = r.bytes_at(64);
        if (!r.ok) return -1;
        for (int j = 0; j < 16; ++j)
          std::memcpy(out_y + (16 * mby + j) * coded_w + 16 * mbx,
                      py + 16 * j, 16);
        for (int j = 0; j < 8; ++j) {
          std::memcpy(out_cb + (8 * mby + j) * (coded_w / 2) + 8 * mbx,
                      pcb + 8 * j, 8);
          std::memcpy(out_cr + (8 * mby + j) * (coded_w / 2) + 8 * mbx,
                      pcr + 8 * j, 8);
        }
        sc.mark_pcm(mbx, mby);
        continue;
      }
      int i16_pred = -1, cbp = 0;
      int mode4[16];
      int chroma_mode;
      if (mb_type == 0) {  // I_4x4
        for (int blk = 0; blk < 16; ++blk) {
          int bx = 4 * mbx + kBlkX[blk], by = 4 * mby + kBlkY[blk];
          int pm = sc.pred_mode4(bx, by);
          int mode;
          if (r.u(1)) mode = pm;
          else {
            int rem = r.u(3);
            mode = rem + (rem >= pm ? 1 : 0);
          }
          sc.modes[by * (coded_w / 4) + bx] = (int8_t)mode;
          mode4[blk] = mode;
        }
        chroma_mode = r.ue();
        if (chroma_mode > 3 || !r.ok) return -1;
        uint32_t code = r.ue();
        if (code >= 48) return -1;
        cbp = kCbpIntraFromCode[code];
        if (cbp) sc.qp = ((sc.qp + r.se() + 52) % 52 + 52) % 52;
      } else if (mb_type <= 24) {  // I_16x16
        i16_pred = (mb_type - 1) % 4;
        int cbp_chroma = ((mb_type - 1) / 4) % 3;
        int cbp_luma = (int)(mb_type - 1) >= 12 ? 15 : 0;
        chroma_mode = r.ue();
        if (chroma_mode > 3 || !r.ok) return -1;
        sc.qp = ((sc.qp + r.se() + 52) % 52 + 52) % 52;
        cbp = cbp_luma | (cbp_chroma << 4);
      } else {
        return -1;
      }
      // I16 DC block first
      int64_t dc16[16] = {0};
      if (i16_pred >= 0) {
        int64_t scan[16];
        int tc = read_residual(r, sc.nc_luma(4 * mbx, 4 * mby), 16, scan);
        if (tc < 0) return -1;
        int64_t c[16];
        scan_to_raster(scan, c);
        // inverse 4x4 Hadamard
        static const int hh[4][4] = {{1, 1, 1, 1}, {1, 1, -1, -1},
                                     {1, -1, -1, 1}, {1, -1, 1, -1}};
        int64_t t[16], f[16];
        for (int i = 0; i < 4; ++i)
          for (int j = 0; j < 4; ++j) {
            int64_t s = 0;
            for (int k = 0; k < 4; ++k) s += hh[i][k] * c[4 * k + j];
            t[4 * i + j] = s;
          }
        for (int i = 0; i < 4; ++i)
          for (int j = 0; j < 4; ++j) {
            int64_t s = 0;
            for (int k = 0; k < 4; ++k) s += t[4 * i + k] * hh[k][j];
            f[4 * i + j] = s;
          }
        int q = sc.qp;
        int64_t ls = 16ll * kDequantV[3 * (q % 6)];
        for (int i = 0; i < 16; ++i) {
          if (q >= 36) dc16[i] = (f[i] * ls) << (q / 6 - 6);
          else dc16[i] = (f[i] * ls + (1ll << (5 - q / 6))) >> (6 - q / 6);
        }
      }
      // luma residual blocks
      int64_t luma[16][16];
      std::memset(luma, 0, sizeof(luma));
      int max_l = i16_pred >= 0 ? 15 : 16;
      for (int i8 = 0; i8 < 4; ++i8)
        for (int i4 = 0; i4 < 4; ++i4) {
          int blk = 4 * i8 + i4;
          int bx = 4 * mbx + kBlkX[blk], by = 4 * mby + kBlkY[blk];
          if (cbp & (1 << i8)) {
            int64_t scan[16] = {0};
            int64_t tmp[16];
            int tc = read_residual(r, sc.nc_luma(bx, by), max_l, tmp);
            if (tc < 0) return -1;
            for (int k = 0; k < max_l; ++k) scan[16 - max_l + k] = tmp[k];
            std::memcpy(luma[blk], scan, sizeof(scan));
            sc.tc_y[by * (coded_w / 4) + bx] = (int16_t)tc;
          } else {
            sc.tc_y[by * (coded_w / 4) + bx] = 0;
          }
        }
      // chroma residuals
      int64_t cdc[2][4] = {{0}};
      int64_t cac[2][4][16];
      std::memset(cac, 0, sizeof(cac));
      if (cbp >> 4) {
        for (int c = 0; c < 2; ++c) {
          int64_t tmp[16];
          int tc = read_residual(r, -1, 4, tmp);
          if (tc < 0) return -1;
          for (int k = 0; k < 4; ++k) cdc[c][k] = tmp[k];
        }
      }
      for (int c = 0; c < 2; ++c) {
        std::vector<int16_t> &tp = c == 0 ? sc.tc_cb : sc.tc_cr;
        for (int blk = 0; blk < 4; ++blk) {
          int bx = 2 * mbx + blk % 2, by = 2 * mby + blk / 2;
          if ((cbp >> 4) == 2) {
            int64_t tmp[16];
            int tc = read_residual(r, sc.nc_of(tp, coded_w / 8, bx, by), 15,
                                   tmp);
            if (tc < 0) return -1;
            for (int k = 0; k < 15; ++k) cac[c][blk][1 + k] = tmp[k];
            tp[by * (coded_w / 8) + bx] = (int16_t)tc;
          } else {
            tp[by * (coded_w / 8) + bx] = 0;
          }
        }
      }
      // ---- reconstruction ----
      if (i16_pred >= 0) {
        int64_t pred[256];
        if (!predict16(i16_pred, out_y, coded_w, 16 * mbx, 16 * mby, mbx > 0,
                       mby > 0, pred))
          return -1;
        for (int blk = 0; blk < 16; ++blk) {
          int bxx = kBlkX[blk], byy = kBlkY[blk];
          int64_t c[16], d[16];
          scan_to_raster(luma[blk], c);
          dequant4x4(c, sc.qp, d);
          d[0] = dc16[4 * byy + bxx];
          int64_t pp[16];
          for (int yy = 0; yy < 4; ++yy)
            for (int xx = 0; xx < 4; ++xx)
              pp[4 * yy + xx] = pred[16 * (4 * byy + yy) + 4 * bxx + xx];
          add_block(out_y, coded_w, 16 * mbx + 4 * bxx, 16 * mby + 4 * byy,
                    pp, d);
        }
        for (int j = 0; j < 4; ++j)
          for (int i = 0; i < 4; ++i)
            sc.modes[(4 * mby + j) * (coded_w / 4) + 4 * mbx + i] = 2;
      } else {
        for (int blk = 0; blk < 16; ++blk) {
          int bx = 4 * mbx + kBlkX[blk], by = 4 * mby + kBlkY[blk];
          int x0 = 4 * bx, y0 = 4 * by;
          int64_t left[4], top[4], tr[4], tl;
          bool hl, ht, htr;
          sc.luma_neighbors(x0, y0, blk, left, top, tr, tl, hl, ht, htr);
          int64_t pred[16];
          if (!predict4x4(mode4[blk], left, top, htr ? tr : nullptr, tl, hl,
                          ht, hl && ht, pred))
            return -1;
          int64_t c[16], d[16];
          scan_to_raster(luma[blk], c);
          dequant4x4(c, sc.qp, d);
          add_block(out_y, coded_w, x0, y0, pred, d);
        }
      }
      // chroma recon
      int qpc_i = sc.qp + sc.cqp_off;
      qpc_i = qpc_i < 0 ? 0 : (qpc_i > 51 ? 51 : qpc_i);
      int qpc = kChromaQp[qpc_i];
      for (int c = 0; c < 2; ++c) {
        uint8_t *plane = c == 0 ? out_cb : out_cr;
        int stride = coded_w / 2;
        int64_t pred[64];
        if (!predict_chroma(chroma_mode, plane, stride, 8 * mbx, 8 * mby,
                            mbx > 0, mby > 0, pred))
          return -1;
        int64_t f00 = cdc[c][0] + cdc[c][1] + cdc[c][2] + cdc[c][3];
        int64_t f01 = cdc[c][0] - cdc[c][1] + cdc[c][2] - cdc[c][3];
        int64_t f10 = cdc[c][0] + cdc[c][1] - cdc[c][2] - cdc[c][3];
        int64_t f11 = cdc[c][0] - cdc[c][1] - cdc[c][2] + cdc[c][3];
        int64_t ls = 16ll * kDequantV[3 * (qpc % 6)];
        int64_t dcv[4] = {((f00 * ls) << (qpc / 6)) >> 5,
                          ((f01 * ls) << (qpc / 6)) >> 5,
                          ((f10 * ls) << (qpc / 6)) >> 5,
                          ((f11 * ls) << (qpc / 6)) >> 5};
        for (int blk = 0; blk < 4; ++blk) {
          int64_t cc[16], d[16];
          scan_to_raster(cac[c][blk], cc);
          dequant4x4(cc, qpc, d);
          d[0] = dcv[blk];
          int64_t pp[16];
          int bxx = blk % 2, byy = blk / 2;
          for (int yy = 0; yy < 4; ++yy)
            for (int xx = 0; xx < 4; ++xx)
              pp[4 * yy + xx] = pred[8 * (4 * byy + yy) + 4 * bxx + xx];
          add_block(plane, stride, 8 * mbx + 4 * bxx, 8 * mby + 4 * byy, pp,
                    d);
        }
      }
    }
  }
  return r.ok ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Encode entry — whole IDR slice RBSP (header + MBs + trailing)
// ---------------------------------------------------------------------------

extern "C" long uvt_h264_encode_slice(
    const uint8_t *src_y, const uint8_t *src_cb, const uint8_t *src_cr,
    int w, int h, int qp, int pcm_from_mby, int idr_pic_id,
    const uint8_t *prev_y, const uint8_t *prev_cb, const uint8_t *prev_cr,
    int frame_num, double skip_thresh,
    uint8_t *recon_y, uint8_t *recon_cb, uint8_t *recon_cr,
    uint8_t *out, long out_cap) {
  const bool is_p = prev_y != nullptr;
  BitWriter bw;
  bw.ue(0);                       // first_mb_in_slice
  bw.ue(is_p ? 5 : 7);            // slice_type (all slices)
  bw.ue(0);                       // pps id
  bw.u(is_p ? (frame_num & 0xF) : 0, 4);
  if (!is_p) bw.ue(idr_pic_id & 0xFFFF);
  if (is_p) {
    bw.u(0, 1);  // num_ref_idx_active_override
    bw.u(0, 1);  // ref_pic_list_modification_flag_l0
    bw.u(0, 1);  // adaptive_ref_pic_marking (sliding window)
  } else {
    bw.u(0, 1);
    bw.u(0, 1);  // dec_ref_pic_marking (IDR form)
  }
  bw.se(qp - 26);
  bw.ue(1);  // deblocking off

  std::vector<uint8_t> ry((size_t)w * h), rcb((size_t)(w / 2) * (h / 2)),
      rcr((size_t)(w / 2) * (h / 2));
  Slice sc(w, h, qp, 0, ry.data(), rcb.data(), rcr.data());
  double lam_f = 0.85 * std::pow(2.0, (qp - 12) / 3.0);
  int64_t lam = (int64_t)lam_f;
  if (lam < 1) lam = 1;
  const int mb_off = is_p ? 5 : 0;

  int qpc = kChromaQp[qp < 0 ? 0 : (qp > 51 ? 51 : qp)];
  int w_mb = w / 16, h_mb = h / 16;
  uint32_t skip_run = 0;
  for (int mby = 0; mby < h_mb; ++mby)
    for (int mbx = 0; mbx < w_mb; ++mbx) {
      const bool is_pcm = pcm_from_mby >= 0 && mby >= pcm_from_mby;
      if (is_p) {
        // P_Skip decision: SSD of the co-located reference MB; counter
        // strip MBs may only skip when BIT-EXACT (ssd == 0)
        int64_t ssd = 0;
        for (int j = 0; j < 16; ++j)
          for (int i2 = 0; i2 < 16; ++i2) {
            int64_t d = (int64_t)src_y[(16 * mby + j) * w + 16 * mbx + i2] -
                        prev_y[(16 * mby + j) * w + 16 * mbx + i2];
            ssd += d * d;
          }
        for (int j = 0; j < 8; ++j)
          for (int i2 = 0; i2 < 8; ++i2) {
            long o = (8 * mby + j) * (w / 2) + 8 * mbx + i2;
            int64_t d0 = (int64_t)src_cb[o] - prev_cb[o];
            int64_t d1 = (int64_t)src_cr[o] - prev_cr[o];
            ssd += d0 * d0 + d1 * d1;
          }
        if ((double)ssd <= (is_pcm ? 0.0 : skip_thresh)) {
          for (int j = 0; j < 16; ++j)
            std::memcpy(ry.data() + (16 * mby + j) * w + 16 * mbx,
                        prev_y + (16 * mby + j) * w + 16 * mbx, 16);
          for (int j = 0; j < 8; ++j) {
            std::memcpy(rcb.data() + (8 * mby + j) * (w / 2) + 8 * mbx,
                        prev_cb + (8 * mby + j) * (w / 2) + 8 * mbx, 8);
            std::memcpy(rcr.data() + (8 * mby + j) * (w / 2) + 8 * mbx,
                        prev_cr + (8 * mby + j) * (w / 2) + 8 * mbx, 8);
          }
          for (int j = 0; j < 4; ++j)
            for (int i2 = 0; i2 < 4; ++i2) {
              sc.tc_y[(4 * mby + j) * (w / 4) + 4 * mbx + i2] = 0;
              sc.modes[(4 * mby + j) * (w / 4) + 4 * mbx + i2] = 2;
            }
          for (int j = 0; j < 2; ++j)
            for (int i2 = 0; i2 < 2; ++i2) {
              sc.tc_cb[(2 * mby + j) * (w / 8) + 2 * mbx + i2] = 0;
              sc.tc_cr[(2 * mby + j) * (w / 8) + 2 * mbx + i2] = 0;
            }
          ++skip_run;
          continue;
        }
        bw.ue(skip_run);
        skip_run = 0;
      }
      if (is_pcm) {  // I_PCM
        bw.ue(25 + mb_off);
        bw.align();
        uint8_t buf[384];
        for (int j = 0; j < 16; ++j)
          std::memcpy(buf + 16 * j, src_y + (16 * mby + j) * w + 16 * mbx,
                      16);
        for (int j = 0; j < 8; ++j) {
          std::memcpy(buf + 256 + 8 * j,
                      src_cb + (8 * mby + j) * (w / 2) + 8 * mbx, 8);
          std::memcpy(buf + 320 + 8 * j,
                      src_cr + (8 * mby + j) * (w / 2) + 8 * mbx, 8);
        }
        bw.raw(buf, 384);
        for (int j = 0; j < 16; ++j)
          std::memcpy(ry.data() + (16 * mby + j) * w + 16 * mbx, buf + 16 * j,
                      16);
        for (int j = 0; j < 8; ++j) {
          std::memcpy(rcb.data() + (8 * mby + j) * (w / 2) + 8 * mbx,
                      buf + 256 + 8 * j, 8);
          std::memcpy(rcr.data() + (8 * mby + j) * (w / 2) + 8 * mbx,
                      buf + 320 + 8 * j, 8);
        }
        sc.mark_pcm(mbx, mby);
        continue;
      }
      // ---- I_4x4 ----
      int modes[16];
      int64_t coeffs[16][16];
      for (int blk = 0; blk < 16; ++blk) {
        int bx = 4 * mbx + kBlkX[blk], by = 4 * mby + kBlkY[blk];
        int x0 = 4 * bx, y0 = 4 * by;
        int64_t left[4], top[4], tr[4], tl;
        bool hl, ht, htr;
        sc.luma_neighbors(x0, y0, blk, left, top, tr, tl, hl, ht, htr);
        int64_t src[16];
        for (int yy = 0; yy < 4; ++yy)
          for (int xx = 0; xx < 4; ++xx)
            src[4 * yy + xx] = src_y[(y0 + yy) * w + x0 + xx];
        int pm = sc.pred_mode4(bx, by);
        int64_t best_cost = -1;
        int best_mode = 2;
        int64_t best_pred[16];
        for (int mode = 0; mode < 9; ++mode) {
          int64_t pred[16];
          if (!predict4x4(mode, left, top, htr ? tr : nullptr, tl, hl, ht,
                          hl && ht, pred))
            continue;
          int64_t cost = 0;
          for (int i = 0; i < 16; ++i)
            cost += llabs(src[i] - pred[i]);
          cost += lam * (mode == pm ? 1 : 4);
          if (best_cost < 0 || cost < best_cost) {
            best_cost = cost;
            best_mode = mode;
            std::memcpy(best_pred, pred, sizeof(pred));
          }
        }
        modes[blk] = best_mode;
        sc.modes[by * (w / 4) + bx] = (int8_t)best_mode;
        int64_t res[16], wt[16], q[16];
        for (int i = 0; i < 16; ++i) res[i] = src[i] - best_pred[i];
        forward4x4(res, wt);
        quant4x4(wt, qp, false, q);
        for (int i = 0; i < 16; ++i) coeffs[blk][i] = q[kZigzag[i]];
        int64_t d[16];
        dequant4x4(q, qp, d);
        add_block(ry.data(), w, x0, y0, best_pred, d);
      }
      // chroma: best of DC/H/V over both components
      int best_c = 0;
      int64_t best_sad = -1;
      int64_t cpred[2][64];
      for (int cm = 0; cm < 3; ++cm) {
        if (cm == 1 && mbx == 0) continue;
        if (cm == 2 && mby == 0) continue;
        int64_t sad = 0;
        int64_t p0[64], p1[64];
        if (!predict_chroma(cm, rcb.data(), w / 2, 8 * mbx, 8 * mby, mbx > 0,
                            mby > 0, p0))
          continue;
        if (!predict_chroma(cm, rcr.data(), w / 2, 8 * mbx, 8 * mby, mbx > 0,
                            mby > 0, p1))
          continue;
        for (int yy = 0; yy < 8; ++yy)
          for (int xx = 0; xx < 8; ++xx) {
            sad += llabs(
                (int64_t)src_cb[(8 * mby + yy) * (w / 2) + 8 * mbx + xx] -
                p0[8 * yy + xx]);
            sad += llabs(
                (int64_t)src_cr[(8 * mby + yy) * (w / 2) + 8 * mbx + xx] -
                p1[8 * yy + xx]);
          }
        if (best_sad < 0 || sad < best_sad) {
          best_sad = sad;
          best_c = cm;
          std::memcpy(cpred[0], p0, sizeof(p0));
          std::memcpy(cpred[1], p1, sizeof(p1));
        }
      }
      int64_t cdc_q[2][4];
      int64_t cac_q[2][4][16];
      for (int c = 0; c < 2; ++c) {
        const uint8_t *srcp = c == 0 ? src_cb : src_cr;
        uint8_t *recp = c == 0 ? rcb.data() : rcr.data();
        int stride = w / 2;
        int64_t ws[4][16];
        for (int b = 0; b < 4; ++b) {
          int bxx = b % 2, byy = b / 2;
          int64_t res[16];
          for (int yy = 0; yy < 4; ++yy)
            for (int xx = 0; xx < 4; ++xx)
              res[4 * yy + xx] =
                  (int64_t)srcp[(8 * mby + 4 * byy + yy) * stride + 8 * mbx +
                                4 * bxx + xx] -
                  cpred[c][8 * (4 * byy + yy) + 4 * bxx + xx];
          forward4x4(res, ws[b]);
        }
        int64_t d0 = ws[0][0], d1 = ws[1][0], d2 = ws[2][0], d3 = ws[3][0];
        int64_t fdc[4] = {d0 + d1 + d2 + d3, d0 - d1 + d2 - d3,
                          d0 + d1 - d2 - d3, d0 - d1 - d2 + d3};
        int64_t mf = kQuantMF[3 * (qpc % 6)];
        int qbits = 15 + qpc / 6;
        int64_t fdz = 2 * ((1ll << qbits) / 3);
        for (int i = 0; i < 4; ++i) {
          int64_t lv = (llabs(fdc[i]) * mf + fdz) >> (qbits + 1);
          cdc_q[c][i] = fdc[i] < 0 ? -lv : lv;
        }
        for (int b = 0; b < 4; ++b) {
          int64_t q[16];
          quant4x4(ws[b], qpc, true, q);
          for (int i = 0; i < 16; ++i) cac_q[c][b][i] = q[kZigzag[i]];
        }
        // reconstruct
        int64_t g0 = cdc_q[c][0] + cdc_q[c][1] + cdc_q[c][2] + cdc_q[c][3];
        int64_t g1 = cdc_q[c][0] - cdc_q[c][1] + cdc_q[c][2] - cdc_q[c][3];
        int64_t g2 = cdc_q[c][0] + cdc_q[c][1] - cdc_q[c][2] - cdc_q[c][3];
        int64_t g3 = cdc_q[c][0] - cdc_q[c][1] - cdc_q[c][2] + cdc_q[c][3];
        int64_t ls = 16ll * kDequantV[3 * (qpc % 6)];
        int64_t dcv[4] = {((g0 * ls) << (qpc / 6)) >> 5,
                          ((g1 * ls) << (qpc / 6)) >> 5,
                          ((g2 * ls) << (qpc / 6)) >> 5,
                          ((g3 * ls) << (qpc / 6)) >> 5};
        for (int b = 0; b < 4; ++b) {
          int64_t cc[16], d[16];
          scan_to_raster(cac_q[c][b], cc);
          dequant4x4(cc, qpc, d);
          d[0] = dcv[b];
          int64_t pp[16];
          int bxx = b % 2, byy = b / 2;
          for (int yy = 0; yy < 4; ++yy)
            for (int xx = 0; xx < 4; ++xx)
              pp[4 * yy + xx] = cpred[c][8 * (4 * byy + yy) + 4 * bxx + xx];
          add_block(recp, stride, 8 * mbx + 4 * bxx, 8 * mby + 4 * byy, pp,
                    d);
        }
      }
      // cbp
      int cbp = 0;
      for (int i8 = 0; i8 < 4; ++i8) {
        bool any = false;
        for (int i4 = 0; i4 < 4 && !any; ++i4)
          for (int i = 0; i < 16; ++i)
            if (coeffs[4 * i8 + i4][i]) { any = true; break; }
        if (any) cbp |= 1 << i8;
      }
      bool any_ac = false, any_dc = false;
      for (int c = 0; c < 2; ++c) {
        for (int b = 0; b < 4; ++b)
          for (int i = 0; i < 16; ++i)
            if (cac_q[c][b][i]) any_ac = true;
        for (int i = 0; i < 4; ++i)
          if (cdc_q[c][i]) any_dc = true;
      }
      if (any_ac) cbp |= 2 << 4;
      else if (any_dc) cbp |= 1 << 4;
      // syntax
      bw.ue(0 + mb_off);
      for (int blk = 0; blk < 16; ++blk) {
        int bx = 4 * mbx + kBlkX[blk], by = 4 * mby + kBlkY[blk];
        int pm = sc.pred_mode4(bx, by);
        int mode = modes[blk];
        if (mode == pm) bw.u(1, 1);
        else {
          bw.u(0, 1);
          bw.u(mode - (mode > pm ? 1 : 0), 3);
        }
      }
      bw.ue(best_c);
      int code = -1;
      for (int i = 0; i < 48; ++i)
        if (kCbpIntraFromCode[i] == cbp) { code = i; break; }
      bw.ue(code);
      if (cbp) bw.se(0);
      for (int i8 = 0; i8 < 4; ++i8)
        for (int i4 = 0; i4 < 4; ++i4) {
          int blk = 4 * i8 + i4;
          int bx = 4 * mbx + kBlkX[blk], by = 4 * mby + kBlkY[blk];
          if (cbp & (1 << i8))
            sc.tc_y[by * (w / 4) + bx] = (int16_t)write_residual(
                bw, coeffs[blk], 16, sc.nc_luma(bx, by));
          else
            sc.tc_y[by * (w / 4) + bx] = 0;
        }
      if (cbp >> 4)
        for (int c = 0; c < 2; ++c) write_residual(bw, cdc_q[c], 4, -1);
      for (int c = 0; c < 2; ++c) {
        std::vector<int16_t> &tp = c == 0 ? sc.tc_cb : sc.tc_cr;
        for (int blk = 0; blk < 4; ++blk) {
          int bx = 2 * mbx + blk % 2, by = 2 * mby + blk / 2;
          if ((cbp >> 4) == 2)
            tp[by * (w / 8) + bx] = (int16_t)write_residual(
                bw, cac_q[c][blk] + 1, 15, sc.nc_of(tp, w / 8, bx, by));
          else
            tp[by * (w / 8) + bx] = 0;
        }
      }
    }
  if (is_p && skip_run) bw.ue(skip_run);  // trailing skip run
  bw.trailing();
  if ((long)bw.bytes.size() > out_cap) return -2;
  std::memcpy(out, bw.bytes.data(), bw.bytes.size());
  if (recon_y) {
    std::memcpy(recon_y, ry.data(), ry.size());
    std::memcpy(recon_cb, rcb.data(), rcb.size());
    std::memcpy(recon_cr, rcr.data(), rcr.size());
  }
  return (long)bw.bytes.size();
}
