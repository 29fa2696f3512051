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

from uvol_tpu.codecs.basis.etc import _MODS

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
