"""Pallas TPU kernel for ETC1 block encoding — the texture hot loop.

Grid over tiles of 4x4 blocks; each kernel instance encodes a [TILE, 48]
slab of flattened blocks entirely in VMEM: subblock means, the 8-table ×
4-code modifier search (VPU), and the 64-bit word packing. Differential
mode with flip search, same output as `encode_etc1_blocks` (tested
equivalent), with explicit tiling/memory placement for production
throughput. The modifier table rides along as a kernel input (constant
capture is not allowed in Pallas) and all code-plane scatters are pure
reshape/transpose so no index constants are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uvol_tpu.codecs.basis.etc import _MODS

TILE = 256  # blocks per kernel instance


def _subblock_encode(sub: jnp.ndarray, base: jnp.ndarray, mods: jnp.ndarray):
    """sub [T, 8, 3] int32, base [T, 3] extended color → (table, codes, err)."""
    # cand [T, 8tab, 4code, 3]; err laid out so reductions hit the LAST axis
    cand = jnp.clip(base[:, None, None, :] + mods[None, :, :, None], 0, 255)
    diff = cand[:, :, :, None, :] - sub[:, None, None, :, :]
    # [T, tab, pix, code]; float32 for argmin (Mosaic); < 2^24 so exact
    err = jnp.swapaxes(
        jnp.sum(diff * diff, axis=-1), -1, -2
    ).astype(jnp.float32)
    best_code = jnp.argmin(err, axis=-1)  # [T, tab, pix]
    best_err = jnp.min(err, axis=-1)
    table_err = jnp.sum(best_err, axis=-1)  # [T, tab]
    table_idx = jnp.argmin(table_err, axis=-1)  # [T]
    # one-hot select instead of >2D gather (Mosaic restriction)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, table_err.shape, 1)
        == table_idx[:, None]
    )
    codes = jnp.sum(
        best_code.astype(jnp.int32) * sel[:, :, None].astype(jnp.int32), axis=1
    )
    errv = jnp.sum(table_err * sel.astype(jnp.float32), axis=1)
    return table_idx.astype(jnp.int32), codes.astype(jnp.int32), errv


def _codes_to_column_major(c0, c1, flip: int, t: int):
    """Subblock code vectors [T, 8] → column-major (j = x*4+y) [T, 16]."""
    if flip:
        grid = jnp.concatenate(
            [c0.reshape(t, 2, 4), c1.reshape(t, 2, 4)], axis=1
        )  # [T, y, x]
    else:
        grid = jnp.concatenate(
            [c0.reshape(t, 4, 2), c1.reshape(t, 4, 2)], axis=2
        )  # [T, y, x]
    return jnp.swapaxes(grid, 1, 2).reshape(t, 16)  # (x, y) raveled = x*4+y


def _encode_tile(blocks: jnp.ndarray, mods: jnp.ndarray):
    """blocks [T, 48] int32 (y, x, rgb) → words [T, 2] uint32."""
    t = blocks.shape[0]
    px = blocks.reshape(t, 4, 4, 3)

    def try_flip(flip: int):
        if flip:
            sub0 = px[:, 0:2, :, :].reshape(t, 8, 3)
            sub1 = px[:, 2:4, :, :].reshape(t, 8, 3)
        else:
            sub0 = px[:, :, 0:2, :].reshape(t, 8, 3)
            sub1 = px[:, :, 2:4, :].reshape(t, 8, 3)
        m0 = jnp.clip(
            jnp.round(jnp.mean(sub0.astype(jnp.float32), axis=1) * (31.0 / 255.0)),
            0, 31,
        ).astype(jnp.int32)
        m1 = jnp.clip(
            jnp.round(jnp.mean(sub1.astype(jnp.float32), axis=1) * (31.0 / 255.0)),
            0, 31,
        ).astype(jnp.int32)
        d = jnp.clip(m1 - m0, -4, 3)
        b0 = (m0 << 3) | (m0 >> 2)
        m1c = m0 + d
        b1 = (m1c << 3) | (m1c >> 2)
        t0, c0, e0 = _subblock_encode(sub0, b0, mods)
        t1, c1, e1 = _subblock_encode(sub1, b1, mods)
        return m0, d, t0, t1, c0, c1, e0 + e1

    r0 = try_flip(0)
    r1 = try_flip(1)
    use1 = r1[6] < r0[6]
    u2 = use1[:, None]
    m0 = jnp.where(u2, r1[0], r0[0])
    d = jnp.where(u2, r1[1], r0[1])
    t0 = jnp.where(use1, r1[2], r0[2]).astype(jnp.int32)
    t1 = jnp.where(use1, r1[3], r0[3]).astype(jnp.int32)
    flip = use1.astype(jnp.int32)

    # all packing math in int32 (Mosaic: no unsigned reductions); the final
    # words are bit patterns, bitcast to uint32 outside the kernel
    du = d & 0x7
    word1 = (
        (m0[:, 0] << 27) | (du[:, 0] << 24)
        | (m0[:, 1] << 19) | (du[:, 1] << 16)
        | (m0[:, 2] << 11) | (du[:, 2] << 8)
        | (t0 << 5) | (t1 << 2) | (1 << 1) | flip
    )

    codes = jnp.where(
        u2,
        _codes_to_column_major(r1[4], r1[5], 1, t),
        _codes_to_column_major(r0[4], r0[5], 0, t),
    ).astype(jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, 16), 1)
    lsb = codes & 1
    msb = (codes >> 1) & 1
    word2 = jnp.sum(lsb << j, axis=1) + jnp.sum(msb << (j + 16), axis=1)
    return jnp.stack([word1, word2], axis=1)


def _kernel(blocks_ref, mods_ref, words_ref):
    words_ref[:] = _encode_tile(blocks_ref[:].astype(jnp.int32), mods_ref[:])


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def encode_etc1_blocks_pallas(
    blocks: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B, 4, 4, 3] uint8 → [B, 2] uint32; B padded to the tile size.

    `interpret=True` runs through the Pallas interpreter (CPU parity)."""
    b = blocks.shape[0]
    flat = blocks.reshape(b, 48).astype(jnp.int32)
    padded = -(-b // TILE) * TILE
    if padded != b:
        flat = jnp.pad(flat, ((0, padded - b), (0, 0)))
    mods = jnp.asarray(_MODS, jnp.int32)
    words = pl.pallas_call(
        _kernel,
        grid=(padded // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 48), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, 2), jnp.int32),
        interpret=interpret,
    )(flat, mods)
    return jax.lax.bitcast_convert_type(words[:b], jnp.uint32)
