// uvol-tpu native entropy hot loops (C ABI, ctypes-bound).
//
// The TPU owns the array math; these are the sequential host serialization
// loops that Python is too slow for at production frame rates:
//   - Draco-format rANS symbol decode/encode (see uvol_tpu/codecs/rans.py,
//     the bit-exact Python reference these mirror)
//   - Corto-format Tunstall decompress (uvol_tpu/codecs/corto/tunstall.py)
//
// Build: g++ -O3 -shared -fPIC entropy.cpp -o libuvt_entropy.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// rANS (Draco wire layout; see codecs/rans.py for the format notes)
// ---------------------------------------------------------------------------

// Decode `n` symbols. probs: probability table summing to `precision`.
// buf: the rANS byte buffer (renorm bytes + final-state marker).
// Returns 0 on success.
int uvt_rans_decode(const uint32_t* probs, int num_probs, int precision_bits,
                    const uint8_t* buf, int buf_len, uint32_t* out, int n) {
    const uint32_t precision = 1u << precision_bits;
    const uint32_t l_base = precision * 4;

    // slot -> symbol lookup + cumulative table
    std::vector<uint32_t> lut(precision);
    std::vector<uint32_t> cum(num_probs + 1, 0);
    uint32_t c = 0;
    for (int s = 0; s < num_probs; s++) {
        cum[s] = c;
        for (uint32_t k = 0; k < probs[s]; k++) lut[c + k] = s;
        c += probs[s];
    }
    if (c != precision) return -1;

    // read final state from the marker at the end of the buffer
    uint64_t state;
    int offset;
    const uint8_t* b = buf;
    int nb = buf_len;
    uint32_t x = b[nb - 1] >> 6;
    if (x == 0) {
        state = (b[nb - 1] & 0x3F);
        offset = nb - 1;
    } else if (x == 1) {
        state = (b[nb - 2] | (uint32_t(b[nb - 1]) << 8)) & 0x3FFF;
        offset = nb - 2;
    } else if (x == 2) {
        state = (b[nb - 3] | (uint32_t(b[nb - 2]) << 8) |
                 (uint32_t(b[nb - 1]) << 16)) & 0x3FFFFF;
        offset = nb - 3;
    } else {
        state = (b[nb - 4] | (uint32_t(b[nb - 3]) << 8) |
                 (uint32_t(b[nb - 2]) << 16) | (uint32_t(b[nb - 1]) << 24)) &
                0x3FFFFFFF;
        offset = nb - 4;
    }
    state += l_base;

    // precision is a power of two: mask/shift instead of runtime div/mod
    // (the division by a non-constant was ~2x the whole symbol loop)
    const uint32_t mask = precision - 1;
    for (int i = 0; i < n; i++) {
        while (state < l_base && offset > 0) {
            offset--;
            state = state * 256 + b[offset];
        }
        uint32_t rem = (uint32_t)state & mask;
        uint32_t sym = lut[rem];
        state = (state >> precision_bits) * probs[sym] + rem - cum[sym];
        out[i] = sym;
    }
    return 0;
}

// Encode `n` symbols; writes rANS bytes (renorm + marker) into out.
// Returns the payload length, or -1 on overflow.
int uvt_rans_encode(const uint32_t* probs, int num_probs, int precision_bits,
                    const uint32_t* symbols, int n, uint8_t* out,
                    int out_capacity) {
    const uint64_t precision = 1ull << precision_bits;
    const uint64_t l_base = precision * 4;
    std::vector<uint64_t> cum(num_probs + 1, 0);
    for (int s = 0; s < num_probs; s++) cum[s + 1] = cum[s] + probs[s];

    std::vector<uint8_t> renorm;
    renorm.reserve(n);
    uint64_t state = l_base;
    const uint64_t upper_factor = 256 * (l_base / precision);
    for (int i = n - 1; i >= 0; i--) {
        uint32_t s = symbols[i];
        uint64_t p = probs[s];
        uint64_t bound = upper_factor * p;
        while (state >= bound) {
            renorm.push_back((uint8_t)(state % 256));
            state /= 256;
        }
        state = (state / p) * precision + state % p + cum[s];
    }
    // final-state marker
    uint8_t marker[4];
    int mlen;
    uint64_t st = state - l_base;
    if (st < (1ull << 6)) {
        marker[0] = (uint8_t)st;
        mlen = 1;
    } else if (st < (1ull << 14)) {
        uint32_t v = (1u << 14) | (uint32_t)st;
        marker[0] = v & 0xFF;
        marker[1] = v >> 8;
        mlen = 2;
    } else if (st < (1ull << 22)) {
        uint32_t v = (2u << 22) | (uint32_t)st;
        marker[0] = v & 0xFF;
        marker[1] = (v >> 8) & 0xFF;
        marker[2] = v >> 16;
        mlen = 3;
    } else if (st < (1ull << 30)) {
        uint32_t v = (3u << 30) | (uint32_t)st;
        marker[0] = v & 0xFF;
        marker[1] = (v >> 8) & 0xFF;
        marker[2] = (v >> 16) & 0xFF;
        marker[3] = v >> 24;
        mlen = 4;
    } else {
        return -1;
    }
    int total = (int)renorm.size() + mlen;
    if (total > out_capacity) return -1;
    memcpy(out, renorm.data(), renorm.size());
    memcpy(out + renorm.size(), marker, mlen);
    return total;
}

// ---------------------------------------------------------------------------
// Tunstall decompress (Corto): words/lengths tables are built in Python
// (format-critical); this is just the byte-expansion hot loop.
// ---------------------------------------------------------------------------

// words: concatenated dictionary words; index/lengths: per-symbol extents.
int uvt_tunstall_expand(const uint8_t* words, const int32_t* index,
                        const int32_t* lengths, const uint8_t* comp,
                        int comp_len, uint8_t* out, int out_size) {
    if (comp_len == 0) return 0;
    int pos = 0;
    for (int k = 0; k < comp_len - 1; k++) {
        int s = comp[k];
        int len = lengths[s];
        if (pos + len > out_size) return -1;
        memcpy(out + pos, words + index[s], len);
        pos += len;
    }
    int s = comp[comp_len - 1];
    int rest = out_size - pos;
    if (rest < 0) return -1;
    memcpy(out + pos, words + index[s],
           rest < lengths[s] ? rest : lengths[s]);
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// One-call Draco rANS symbol stream decode: varint num_symbols, token-coded
// probability table, varint payload size, rANS bytes. Replaces the Python
// header parse + LUT build + per-call glue (codecs/rans.py
// RansSymbolDecoder + decode_probability_table).
// Returns the new buffer position, or -1 on malformed input.
// ---------------------------------------------------------------------------

extern "C" int64_t uvt_rans_stream_decode(
    const uint8_t* data, int64_t end, int64_t pos,
    int precision_bits, int64_t n, uint32_t* out) {
    auto varint = [&](int64_t* p) -> uint64_t {
        uint64_t result = 0;
        int shift = 0;
        while (*p < end) {
            uint8_t b = data[(*p)++];
            result |= (uint64_t)(b & 0x7F) << shift;
            if (!(b & 0x80)) return result;
            shift += 7;
        }
        return (uint64_t)-1;
    };

    int64_t num_symbols = (int64_t)varint(&pos);
    if (num_symbols < 0 || pos >= end) return -1;
    std::vector<uint32_t> probs(num_symbols, 0);
    int64_t i = 0;
    while (i < num_symbols) {
        if (pos >= end) return -1;
        uint8_t d = data[pos++];
        int token = d & 3;
        if (token == 3) {
            i += (d >> 2) + 1;
            continue;
        }
        uint32_t p = d >> 2;
        for (int b = 1; b <= token; b++) {
            if (pos >= end) return -1;
            p |= (uint32_t)data[pos++] << (8 * b - 2);
        }
        probs[i++] = p;
    }
    const uint32_t precision = 1u << precision_bits;
    uint64_t total = 0;
    for (int64_t s = 0; s < num_symbols; s++) total += probs[s];
    if (total != precision) return -1;

    uint64_t size = varint(&pos);
    if (size == (uint64_t)-1 || pos + (int64_t)size > end) return -1;
    int rc = uvt_rans_decode(probs.data(), (int)num_symbols, precision_bits,
                             data + pos, (int)size, out, (int)n);
    if (rc != 0) return -1;
    return pos + (int64_t)size;
}
