"""ETC1 block codec (JAX, batched) — the TPU-native texture encode path.

The reference consumes compressed textures either as KTX2/Basis or as raw
`etc2` payloads uploaded directly (src/V2/player.ts:338-356,454-470 with
RGB_ETC2_Format). ETC1 blocks are valid ETC2 RGB blocks, so this encoder
produces data the reference player's `etc2` path can consume as-is.

Everything is expressed as dense batched array math over [B, 4, 4, 3]
blocks: modifier-table search is a two-pass scheme (linear ranking +
exact top-2 refine, `_best_table_and_codes`) that XLA maps onto the
VPU/MXU; no per-block Python.

Wire format per block: 64 bits, big-endian (two u32 words), per the
Khronos ETC1 spec: differential/individual base colors + 3-bit modifier
table per subblock + flip bit; word2 holds the 2-bit per-pixel indices in
column-major order (lsb plane | msb plane).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

#: modifier magnitudes (small, large) per table index; pixel bits map
#: msb=sign (1 → negative), lsb=magnitude (1 → large)
MODIFIER_TABLE = np.array(
    [
        [2, 8], [5, 17], [9, 29], [13, 42],
        [18, 60], [24, 80], [33, 106], [47, 183],
    ],
    np.int32,
)

# full per-pixel modifier values per table: [8 tables, 4 pixel codes]
_MODS = np.stack(
    [
        MODIFIER_TABLE[:, 0],  # code 0: +small
        MODIFIER_TABLE[:, 1],  # code 1: +large
        -MODIFIER_TABLE[:, 0],  # code 2: -small
        -MODIFIER_TABLE[:, 1],  # code 3: -large
    ],
    axis=1,
)  # [8, 4]


def _extend5(c: Array) -> Array:
    return (c << 3) | (c >> 2)


def _extend4(c: Array) -> Array:
    return (c << 4) | c


#: pass-1 mask sentinel — exceeds any possible subblock error total
#: (8 pixels x (K + 2*m*G) < 2^23) and is exactly representable in f32,
#: so the int32 and f32 (Pallas) implementations rank identically
_RANK_MASK = np.int32(1 << 30)


def _best_table_and_codes(
    pixels: Array, base: Array
) -> Tuple[Array, Array, Array]:
    """pixels [..., 8, 3] uint8-ish int32, base [..., 3] extended color.

    Two-pass search (the exact brute force spent ~10 vector ops per
    (table, code) candidate; this spends ~4 on ranking and refines):

      pass 1 — rank the 8 modifier tables by the UNCLIPPED linear error
        model: for candidate m, per-pixel err-reduced = K_lin - 2*m*G
        with K_lin = sum(base+m)^2 = Sb2 + 2*m*Sb + 3*m^2 (scalars per
        subblock) and G = sum_ch(p_ch) the only per-pixel term.
      pass 2 — evaluate the top-2 tables EXACTLY (clipped palettes,
        per-pixel best codes), keeping the better; ties keep the
        pass-1 order. Measured on real liam texture content this is
        within 0.03 dB of the exhaustive search at ~2x the throughput
        (99.8% of blocks identical); tests/test_basis quality gates and
        the Pallas kernel (etc_pallas.py) implement the same two-pass,
        so parity is bit-exact.

    Returns (table_idx [...], codes [..., 8], err [...]).
    """
    mods = jnp.asarray(_MODS, jnp.int32)  # [8tab, 4code]
    lum = pixels.astype(jnp.int32)  # [B, 8, 3]
    # ---- pass 1: linear ranking ------------------------------------------
    g = jnp.sum(lum, axis=-1)  # [B, 8pix]
    sb = jnp.sum(base, axis=-1)  # [B]
    sb2 = jnp.sum(base * base, axis=-1)
    m = mods[None]  # [1, 8, 4]
    k_lin = sb2[:, None, None] + 2 * m * sb[:, None, None] + 3 * m * m
    q = k_lin[..., None] - 2 * m[..., None] * g[:, None, None, :]
    tot = jnp.sum(jnp.min(q, axis=-2), axis=-1)  # [B, 8tab]
    t_first = jnp.argmin(tot, axis=-1)  # lowest index wins ties
    masked = jnp.where(
        jax.nn.one_hot(t_first, 8, dtype=bool), _RANK_MASK, tot
    )
    t_second = jnp.argmin(masked, axis=-1)

    # ---- pass 2: exact refine of the two ranked tables -------------------
    def exact(ti):
        mods_t = mods[ti]  # [B, 4]
        cand = jnp.clip(base[:, None, :] + mods_t[:, :, None], 0, 255)
        diff = cand[:, :, None, :] - lum[:, None, :, :]
        err = jnp.sum(diff * diff, axis=-1)  # [B, 4code, 8pix]
        return jnp.argmin(err, axis=-2), jnp.sum(jnp.min(err, axis=-2), -1)

    c1, e1 = exact(t_first)
    c2, e2 = exact(t_second)
    better = e2 < e1  # strict: pass-1 winner keeps ties
    table_idx = jnp.where(better, t_second, t_first)
    codes = jnp.where(better[:, None], c2, c1)
    errv = jnp.where(better, e2, e1)
    return table_idx.astype(jnp.uint32), codes.astype(jnp.uint32), errv


def encode_etc1_blocks(blocks: Array) -> Array:
    """Encode [B, 4, 4, 3] uint8 blocks → [B, 2] uint32 (word1, word2).

    Differential mode with flip search: subblocks are the two 4x2 halves
    (flip=1, rows) or 2x4 halves (flip=0, columns); base colors are the
    5-bit quantized means; modifier tables via the two-pass search
    (`_best_table_and_codes`).
    """
    blocks = blocks.astype(jnp.int32)  # [B,4,4,3] (y, x, c)

    def try_flip(flip: int):
        if flip:  # two 2-row halves
            sub0 = blocks[:, 0:2, :, :].reshape(-1, 8, 3)
            sub1 = blocks[:, 2:4, :, :].reshape(-1, 8, 3)
        else:  # two 2-column halves
            sub0 = blocks[:, :, 0:2, :].reshape(-1, 8, 3)
            sub1 = blocks[:, :, 2:4, :].reshape(-1, 8, 3)
        m0 = jnp.clip(jnp.round(jnp.mean(sub0, axis=1) * 31.0 / 255.0), 0, 31).astype(jnp.int32)
        m1 = jnp.clip(jnp.round(jnp.mean(sub1, axis=1) * 31.0 / 255.0), 0, 31).astype(jnp.int32)
        # differential: clamp delta to [-4, 3]
        d = jnp.clip(m1 - m0, -4, 3)
        m1c = m0 + d
        b0 = _extend5(m0)
        b1 = _extend5(m1c)
        t0, c0, e0 = _best_table_and_codes(sub0, b0)
        t1, c1, e1 = _best_table_and_codes(sub1, b1)
        return (m0, d, t0, t1, c0, c1, e0 + e1)

    r0 = try_flip(0)
    r1 = try_flip(1)
    use1 = (r1[6] < r0[6])[:, None]

    m0 = jnp.where(use1, r1[0], r0[0])
    d = jnp.where(use1, r1[1], r0[1])
    t0 = jnp.where(use1[:, 0], r1[2], r0[2])
    t1 = jnp.where(use1[:, 0], r1[3], r0[3])
    c0 = jnp.where(use1, r1[4], r0[4])
    c1 = jnp.where(use1, r1[5], r0[5])
    flip = use1[:, 0].astype(jnp.uint32)

    du = (d & 0x7).astype(jnp.uint32)  # 3-bit two's complement
    m0u = m0.astype(jnp.uint32)
    word1 = (
        (m0u[:, 0] << 27) | (du[:, 0] << 24)
        | (m0u[:, 1] << 19) | (du[:, 1] << 16)
        | (m0u[:, 2] << 11) | (du[:, 2] << 8)
        | (t0 << 5) | (t1 << 2) | (1 << 1) | flip
    )

    # scatter subblock pixel codes to block positions (column-major j = x*4+y)
    B = blocks.shape[0]
    codes_full = jnp.zeros((B, 16), jnp.uint32)

    def pix_positions(flip_val):
        # returns for (sub0, sub1) the linear j = x*4+y of their 8 pixels in
        # the order the subblock arrays were flattened ((y-major within sub))
        pos0, pos1 = [], []
        if flip_val:
            for y in range(2):
                for x in range(4):
                    pos0.append(x * 4 + y)
            for y in range(2, 4):
                for x in range(4):
                    pos1.append(x * 4 + y)
        else:
            for y in range(4):
                for x in range(2):
                    pos0.append(x * 4 + y)
            for y in range(4):
                for x in range(2, 4):
                    pos1.append(x * 4 + y)
        return np.array(pos0), np.array(pos1)

    p0f0, p1f0 = pix_positions(0)
    p0f1, p1f1 = pix_positions(1)
    codes_f0 = jnp.zeros((B, 16), jnp.uint32).at[:, p0f0].set(r0[4].astype(jnp.uint32)).at[:, p1f0].set(r0[5].astype(jnp.uint32))
    codes_f1 = jnp.zeros((B, 16), jnp.uint32).at[:, p0f1].set(r1[4].astype(jnp.uint32)).at[:, p1f1].set(r1[5].astype(jnp.uint32))
    codes_full = jnp.where(use1, codes_f1, codes_f0)

    lsb = codes_full & 1
    msb = (codes_full >> 1) & 1
    j = jnp.arange(16, dtype=jnp.uint32)
    word2 = jnp.sum(lsb << j, axis=1) + jnp.sum(msb << (j + 16), axis=1)
    return jnp.stack([word1, word2.astype(jnp.uint32)], axis=1)


def _select8(table: Array, vals) -> Array:
    """Arithmetic 8-way table select from the bits of `table` — TPU
    gathers from tiny tables lower badly; three levels of where don't."""
    b0 = (table & 1) == 1
    b1 = ((table >> 1) & 1) == 1
    b2 = ((table >> 2) & 1) == 1
    v = [jnp.int32(int(x)) for x in vals]
    lo = jnp.where(b1, jnp.where(b0, v[3], v[2]), jnp.where(b0, v[1], v[0]))
    hi = jnp.where(b1, jnp.where(b0, v[7], v[6]), jnp.where(b0, v[5], v[4]))
    return jnp.where(b2, hi, lo)


def decode_etc1_blocks(words: Array) -> Array:
    """Decode [B, 2] uint32 → [B, 4, 4, 3] uint8 (differential+individual).

    Gather/scatter-free formulation: the 8x2 modifier table is an
    arithmetic bit select and the column-major pixel scatter is a
    reshape+transpose — ~16x faster than the round-1 gather version on a
    v5e chip at identical output (parity-locked by the encode roundtrip
    tests and the BasisLZ golden transcodes)."""
    w1 = words[:, 0].astype(jnp.uint32)
    w2 = words[:, 1].astype(jnp.uint32)
    diff = (w1 >> 1) & 1
    flip = w1 & 1
    t0 = ((w1 >> 5) & 7).astype(jnp.int32)
    t1 = ((w1 >> 2) & 7).astype(jnp.int32)

    # differential base colors
    m0 = jnp.stack([(w1 >> 27) & 31, (w1 >> 19) & 31, (w1 >> 11) & 31], -1).astype(jnp.int32)
    draw = jnp.stack([(w1 >> 24) & 7, (w1 >> 16) & 7, (w1 >> 8) & 7], -1).astype(jnp.int32)
    d = jnp.where(draw >= 4, draw - 8, draw)
    m1 = m0 + d
    base0_d = _extend5(m0)
    base1_d = _extend5(jnp.clip(m1, 0, 31))
    # individual base colors
    i0 = jnp.stack([(w1 >> 28) & 15, (w1 >> 20) & 15, (w1 >> 12) & 15], -1).astype(jnp.int32)
    i1 = jnp.stack([(w1 >> 24) & 15, (w1 >> 16) & 15, (w1 >> 8) & 15], -1).astype(jnp.int32)
    base0 = jnp.where(diff[:, None] == 1, base0_d, _extend4(i0))
    base1 = jnp.where(diff[:, None] == 1, base1_d, _extend4(i1))

    j = jnp.arange(16, dtype=jnp.uint32)
    lsb = (w2[:, None] >> j) & 1
    msb = (w2[:, None] >> (j + 16)) & 1
    codes = ((msb << 1) | lsb).astype(jnp.int32)  # [B,16], j = x*4+y
    x = (j // 4).astype(jnp.int32)
    y = (j % 4).astype(jnp.int32)
    in_sub1 = jnp.where(flip[:, None] == 1, y[None, :] >= 2, x[None, :] >= 2)
    table = jnp.where(in_sub1, t1[:, None], t0[:, None])
    small = _select8(table, MODIFIER_TABLE[:, 0])
    large = _select8(table, MODIFIER_TABLE[:, 1])
    mag = jnp.where((codes & 1) == 1, large, small)
    mod = jnp.where(codes >= 2, -mag, mag)  # code msb = sign
    base = jnp.where(in_sub1[..., None], base1[:, None, :], base0[:, None, :])
    rgb = jnp.clip(base + mod[..., None], 0, 255).astype(jnp.uint8)
    # j = x*4+y → [B, x, y, 3] → [B, y, x, 3] (pure transpose, no scatter)
    return jnp.transpose(rgb.reshape(-1, 4, 4, 3), (0, 2, 1, 3))


def image_to_blocks(img: Array) -> Array:
    """[..., H, W, 3] → [..., H//4 * W//4, 4, 4, 3] in raster block order."""
    *lead, h, w, c = img.shape
    img = img.reshape(*lead, h // 4, 4, w // 4, 4, c)
    img = jnp.swapaxes(img, -4, -3)  # [..., h/4, w/4, 4, 4, c]
    return img.reshape(*lead, (h // 4) * (w // 4), 4, 4, c)


def blocks_to_image(blocks: Array, h: int, w: int) -> Array:
    *lead, n, _, _, c = blocks.shape
    img = blocks.reshape(*lead, h // 4, w // 4, 4, 4, c)
    img = jnp.swapaxes(img, -4, -3)
    return img.reshape(*lead, h, w, c)


def pack_etc1_payload(words: np.ndarray) -> bytes:
    """[B, 2] uint32 → big-endian byte stream (ETC1/ETC2 file order)."""
    return np.asarray(words, dtype=">u4").tobytes()


def unpack_etc1_payload(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=">u4").astype(np.uint32).reshape(-1, 2)
