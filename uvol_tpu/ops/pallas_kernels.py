"""Pallas TPU kernel for fused geometry quantize+delta+zigzag.

STATUS (round 2): retained as a reference formulation with its
interpreter parity test, but NOT on the production path anymore — the
[TILE_N, 128] layout pads C=2..3 components to 128 lanes (~40x dead HBM
traffic), and the transposed [F, C, N] XLA chain in
`models/sequence.py:_syms` measured faster on a v5e chip at identical
symbols. A lane-major rewrite (vertices on lanes, like
`codecs/basis/etc_pallas.py`) would close the gap, but the op is launch-
overhead-bound at production batch sizes, so XLA is the right tool here.

`fused_quantize_delta_zigzag`: one VMEM pass over a padded [F, N, C]
attribute batch producing entropy-ready symbols — quantization, successive
difference along the vertex axis, and zigzag mapping fused into a single
kernel. The cross-tile delta seam is carried by a precomputed
previous-row input per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512
C_PAD = 128  # lane width; real components live in the first C columns


def _kernel(x_ref, prev_ref, scale_ref, out_ref):
    """x [TILE_N, C_PAD] f32, prev [num_tiles, C_PAD] (whole array in VMEM;
    row i = last row of tile i-1 — Mosaic disallows 1-row blocks over a
    >1-row array), scale [1, C_PAD] = 1/step, out [TILE_N, C_PAD] int32."""
    inv = scale_ref[0, :]
    q = jnp.floor(x_ref[:] * inv[None, :] + 0.5).astype(jnp.int32)
    prev_row = prev_ref[pl.program_id(0), :]
    qprev = jnp.floor(prev_row * inv + 0.5).astype(jnp.int32)
    shifted = jnp.concatenate([qprev[None, :], q[:-1, :]], axis=0)
    delta = q - shifted
    # zigzag in int32: (d >> 31) ^ (d << 1)
    out_ref[:] = (delta >> 31) ^ (delta << 1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def fused_quantize_delta_zigzag(
    x: jax.Array, inv_step: jax.Array, num_components: int,
    interpret: bool = False,
) -> jax.Array:
    """x [F, N, C] float32 (min-subtracted), inv_step [F] → zigzag symbols
    [F, N, C] int32 (row 0 carries the absolute quantized value).

    `interpret=True` runs the kernel through the Pallas interpreter
    (CPU-testable parity path)."""
    f, n, c = x.shape
    n_pad = -(-n // TILE_N) * TILE_N
    num_tiles = n_pad // TILE_N
    xp = jnp.zeros((f, n_pad, C_PAD), jnp.float32)
    xp = xp.at[:, :n, :c].set(x)
    # previous-row per tile (tile 0 gets zeros → absolute first symbol)
    prev = jnp.zeros((f, num_tiles, C_PAD), jnp.float32)
    prev = prev.at[:, 1:, :].set(xp[:, TILE_N - 1 : n_pad - 1 : TILE_N, :])
    scale = jnp.zeros((f, 1, C_PAD), jnp.float32)
    scale = scale.at[:, 0, :c].set(inv_step[:, None])

    def per_frame(xf, pf, sf):
        return pl.pallas_call(
            _kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_N, C_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_tiles, C_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_N, C_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, C_PAD), jnp.int32),
            interpret=interpret,
        )(xf, pf, sf)

    out = jax.vmap(per_frame)(xp, prev, scale)
    return out[:, :n, :c]
