"""Pallas TPU kernel for ETC1 block encoding — the texture hot loop.

Layout: **blocks ride the lane axis**. The host-side wrapper arranges
each 4x4 block's pixels into 96 sublane rows — (flip, subblock, channel,
pixel) — over a [96, B] uint8 array, so every vector op in the kernel
runs at full 128-lane width (the round-1 kernel kept blocks on sublanes
and pixels on lanes, using 8-24 of 128 lanes; this layout is ~7x faster
at bit-identical output).

Search math: for a candidate modifier m, the per-pixel error
``sum_ch (clip(base_ch+m) - p_ch)^2`` decomposes as
``K - 2*dot + sum_ch p_ch^2`` with ``K = sum_ch cb_ch^2`` (scalar per
block) and ``dot = sum_ch cb_ch * p_ch``; the ``sum p^2`` term is
constant across candidates, so code/table/flip selection compares
``K - 2*dot`` only — 6 row-ops per candidate instead of a full 24-lane
recompute. All quantities are integers below 2^24, exact in f32, so
every compare (and argmin tie-break) is identical to the reference op
chain `encode_etc1_blocks` — parity-tested in
tests/test_pallas_parity.py, interpret and compiled.

Differential mode with flip search, bit-identical to
`encode_etc1_blocks` (codecs/basis/etc.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvol_tpu.codecs.basis.etc import _MODS, MODIFIER_TABLE

TILE_L = 1024  # blocks (lanes) per kernel instance


def _mean_quant5(sub):
    """[24, T] f32 -> three [1, T] i32 5-bit means.

    Float op order matches `encode_etc1_blocks` exactly — mean (sum/8,
    exact in f32), then *31.0, then /255.0, then round — so half-ulp
    boundary cases round identically."""
    out = []
    for c in range(3):
        s = jnp.sum(sub[c * 8 : (c + 1) * 8, :], axis=0, keepdims=True)
        mean = s * 0.125
        out.append(
            jnp.clip(jnp.round(mean * 31.0 / 255.0), 0.0, 31.0).astype(
                jnp.int32
            )
        )
    return out


def _encode_subblock(sub, base_ch):
    """Full 8-table x 4-code search for one subblock.

    sub [24, T] f32 (channel-major pixel rows); base_ch three [1, T] i32
    extended colors. Returns (table [1,T] i32, codes [8,T] i32,
    err [1,T] f32 — the TRUE total squared error, for the flip compare).
    """
    P = [sub[0:8, :], sub[8:16, :], sub[16:24, :]]
    psq = P[0] * P[0] + P[1] * P[1] + P[2] * P[2]  # [8,T] const across cands
    basef = [b.astype(jnp.float32) for b in base_ch]
    best_tab = best_codes = best_red = None
    for tab in range(8):
        tab_best_red = tab_codes = None
        for code, m in enumerate(_MODS[tab]):
            mf = float(m)
            cb = [jnp.clip(b + mf, 0.0, 255.0) for b in basef]  # [1,T]
            K = cb[0] * cb[0] + cb[1] * cb[1] + cb[2] * cb[2]
            dot = cb[0] * P[0] + cb[1] * P[1] + cb[2] * P[2]  # [8,T]
            red = K - 2.0 * dot  # reduced err; true err = red + psq
            if tab_best_red is None:
                tab_best_red = red
                tab_codes = jnp.zeros(red.shape, jnp.int32)
            else:
                better = red < tab_best_red  # strict: first minimum wins
                tab_best_red = jnp.where(better, red, tab_best_red)
                tab_codes = jnp.where(better, jnp.int32(code), tab_codes)
        tab_err = jnp.sum(tab_best_red, axis=0, keepdims=True)  # [1,T]
        if best_red is None:
            best_tab = jnp.zeros(tab_err.shape, jnp.int32)
            best_codes, best_red = tab_codes, tab_err
        else:
            better = tab_err < best_red
            best_red = jnp.where(better, tab_err, best_red)
            best_tab = jnp.where(better, jnp.int32(tab), best_tab)
            best_codes = jnp.where(
                jnp.broadcast_to(better, tab_codes.shape), tab_codes, best_codes
            )
    true_err = best_red + jnp.sum(psq, axis=0, keepdims=True)
    return best_tab, best_codes, true_err


def _kernel(x_ref, out_ref):
    # Mosaic has no direct u8->f32 cast; hop through int32
    xf = x_ref[:].astype(jnp.int32).astype(jnp.float32)  # [96, T]
    t = xf.shape[1]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, t), 0)

    results = []
    for flip in (0, 1):
        sub0 = xf[flip * 48 : flip * 48 + 24, :]
        sub1 = xf[flip * 48 + 24 : flip * 48 + 48, :]
        m0 = _mean_quant5(sub0)  # three [1,T] in 0..31
        m1 = _mean_quant5(sub1)
        d = [jnp.clip(b - a, -4, 3) for a, b in zip(m0, m1)]
        b0 = [(a << 3) | (a >> 2) for a in m0]
        m1c = [a + dd for a, dd in zip(m0, d)]
        b1 = [(a << 3) | (a >> 2) for a in m1c]
        t0, c0, e0 = _encode_subblock(sub0, b0)
        t1, c1, e1 = _encode_subblock(sub1, b1)
        err = e0 + e1  # [1,T]
        du = [dd & 0x7 for dd in d]
        word1 = (
            (m0[0] << 27) | (du[0] << 24)
            | (m0[1] << 19) | (du[1] << 16)
            | (m0[2] << 11) | (du[2] << 8)
            | (t0 << 5) | (t1 << 2) | (1 << 1) | flip
        )  # [1,T]
        # pixel-index planes: per-row static shifts (j = x*4+y per spec)
        if flip == 0:
            j0, j1 = iota8, iota8 + 8  # pix order x*4+y within each half
        else:
            j0 = (iota8 // 2) * 4 + (iota8 % 2)  # pix order x*2+y, rows 0-1
            j1 = j0 + 2  # rows 2-3
        lsb = jnp.sum((c0 & 1) << j0, axis=0, keepdims=True) + jnp.sum(
            (c1 & 1) << j1, axis=0, keepdims=True
        )
        msb = jnp.sum(((c0 >> 1) & 1) << j0, axis=0, keepdims=True) + jnp.sum(
            ((c1 >> 1) & 1) << j1, axis=0, keepdims=True
        )
        word2 = lsb + (msb << 16)
        results.append((word1, word2, err))

    w1_0, w2_0, e_0 = results[0]
    w1_1, w2_1, e_1 = results[1]
    use1 = e_1 < e_0
    word1 = jnp.where(use1, w1_1, w1_0)
    word2 = jnp.where(use1, w2_1, w2_0)
    out_ref[:] = jnp.concatenate([word1, word2], axis=0)  # [2, T]


def _prepare_layout(blocks: jax.Array) -> jax.Array:
    """[B, 4, 4, 3] uint8 -> [96, B] uint8 lane-major layout.

    Row r = (flip, subblock, channel, pixel): four 24-row groups, one per
    (flip, subblock); within a group, channel-major with pixel order
    x*4+y (flip 0) / x*2+y (flip 1) so the kernel's shift vectors are
    simple iota math."""
    px = blocks  # [B, y, x, ch] uint8
    groups = []
    for flip in (0, 1):
        for sb in (0, 1):
            if flip == 0:
                sel = px[:, :, 2 * sb : 2 * sb + 2, :]  # [B, y4, x2, ch]
            else:
                sel = px[:, 2 * sb : 2 * sb + 2, :, :]  # [B, y2, x4, ch]
            arr = jnp.transpose(sel, (3, 2, 1, 0))  # [ch, x, y, B]
            groups.append(arr.reshape(24, px.shape[0]))
    return jnp.concatenate(groups, axis=0)


@functools.partial(jax.jit, static_argnums=(1,))
def encode_etc1_blocks_pallas(
    blocks: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, 4, 4, 3] uint8 → [B, 2] uint32; B padded to the tile size.

    `interpret=True` runs through the Pallas interpreter (CPU parity)."""
    b = blocks.shape[0]
    x96 = _prepare_layout(blocks.astype(jnp.uint8))
    padded = -(-b // TILE_L) * TILE_L
    if padded != b:
        x96 = jnp.pad(x96, ((0, 0), (0, padded - b)))
    words = pl.pallas_call(
        _kernel,
        grid=(padded // TILE_L,),
        in_specs=[
            pl.BlockSpec((96, TILE_L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, padded), jnp.int32),
        interpret=interpret,
    )(x96)
    return jax.lax.bitcast_convert_type(
        jnp.transpose(words[:, :b], (1, 0)), jnp.uint32
    )


# ---------------------------------------------------------------------------
# Decode kernel: blocks on lanes again — [2, B] words in, [48, B] pixel
# rows out (channel-major, image-raster pixel order y*4+x within each
# channel group), padded to 64 sublanes for the int8 tile shape.
# ---------------------------------------------------------------------------

_DEC_ROWS = 64  # 48 pixel rows (3 ch x 16 px) padded to the u8 sublane tile


def _sel8_vec(table, vals):
    """Arithmetic 8-way select of scalar table `vals` by [R, T] indices
    (same trick as etc.py _select8 — gathers from tiny tables lower
    badly on TPU; three where levels don't)."""
    b0 = (table & 1) == 1
    b1 = ((table >> 1) & 1) == 1
    b2 = ((table >> 2) & 1) == 1
    v = [jnp.int32(int(x)) for x in vals]
    lo = jnp.where(b1, jnp.where(b0, v[3], v[2]), jnp.where(b0, v[1], v[0]))
    hi = jnp.where(b1, jnp.where(b0, v[7], v[6]), jnp.where(b0, v[5], v[4]))
    return jnp.where(b2, hi, lo)


def _dec_kernel(w_ref, out_ref):
    w1 = w_ref[0:1, :]  # [1, T] int32 (bit-identical to the uint32 words)
    w2 = w_ref[1:2, :]
    t = w1.shape[1]
    diff = (w1 >> 1) & 1
    flip = w1 & 1
    t0 = (w1 >> 5) & 7
    t1 = (w1 >> 2) & 7

    # differential + individual base colors (decode_etc1_blocks math)
    base0 = []
    base1 = []
    for sh5, sh3, sh4a, sh4b in ((27, 24, 28, 24), (19, 16, 20, 16),
                                 (11, 8, 12, 8)):
        m0 = (w1 >> sh5) & 31
        draw = (w1 >> sh3) & 7
        d = jnp.where(draw >= 4, draw - 8, draw)
        m1 = jnp.clip(m0 + d, 0, 31)
        b0d = (m0 << 3) | (m0 >> 2)
        b1d = (m1 << 3) | (m1 >> 2)
        i0 = (w1 >> sh4a) & 15
        i1 = (w1 >> sh4b) & 15
        b0i = (i0 << 4) | i0
        b1i = (i1 << 4) | i1
        base0.append(jnp.where(diff == 1, b0d, b0i))  # [1, T]
        base1.append(jnp.where(diff == 1, b1d, b1i))

    # per-pixel planes: row r is image-raster order r = y*4 + x; the wire
    # bit index for pixel (x, y) is x*4 + y
    r = jax.lax.broadcasted_iota(jnp.int32, (16, t), 0)
    x = r % 4
    y = r // 4
    jbit = x * 4 + y
    lsb = (w2 >> jbit) & 1  # [16, T] (w1/w2 broadcast over rows)
    msb = (w2 >> (jbit + 16)) & 1
    code = (msb << 1) | lsb
    # int32 arithmetic blend instead of where-on-bool-operands: Mosaic
    # rejects the i8->i1 truncation that select-of-compares lowers to
    ys = (y >= 2).astype(jnp.int32)
    xs = (x >= 2).astype(jnp.int32)
    in1 = flip * ys + (1 - flip) * xs  # [16, T] 0/1
    table = t0 + (t1 - t0) * in1  # [16, T]
    small = _sel8_vec(table, MODIFIER_TABLE[:, 0])
    large = _sel8_vec(table, MODIFIER_TABLE[:, 1])
    mag = small + (large - small) * (code & 1)
    mod = (1 - (code & 2)) * mag  # code msb = sign: (1 - 2*msb) * mag

    rows = []
    for ch in range(3):
        base = base0[ch] + (base1[ch] - base0[ch]) * in1  # [16, T]
        rows.append(jnp.clip(base + mod, 0, 255))
    px = jnp.concatenate(rows, axis=0)  # [48, T] int32
    pad = jnp.zeros((_DEC_ROWS - 48, t), jnp.int32)
    out_ref[:] = jnp.concatenate([px, pad], axis=0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1,))
def decode_etc1_blocks_pallas(
    words: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, 2] uint32 → [B, 4, 4, 3] uint8, bit-identical to
    `decode_etc1_blocks` (parity-locked in tests/test_pallas_parity.py)."""
    b = words.shape[0]
    w = jnp.transpose(
        jax.lax.bitcast_convert_type(words, jnp.int32), (1, 0)
    )  # [2, B]
    padded = -(-b // TILE_L) * TILE_L
    if padded != b:
        w = jnp.pad(w, ((0, 0), (0, padded - b)))
    out = pl.pallas_call(
        _dec_kernel,
        grid=(padded // TILE_L,),
        in_specs=[
            pl.BlockSpec((2, TILE_L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_DEC_ROWS, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((_DEC_ROWS, padded), jnp.uint8),
        interpret=interpret,
    )(w)
    px = out[:48, :b]  # [48, B] ch-major, pixel raster y*4+x
    return jnp.transpose(px.reshape(3, 16, b), (2, 1, 0)).reshape(b, 4, 4, 3)
