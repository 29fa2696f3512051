"""Pallas TPU kernels for the ETC1S palette build hot stages.

The two dominant stages of `etc1s_encode._palette_core_fn` are both
"tiny-K contraction -> min over 4 intensity codes -> pixel sum ->
argmin" patterns. Expressed in XLA they materialize huge intermediates
in HBM (the endpoint stage writes+reads ~1 GB per [N,16,Echunk,4]
scan step; the intensity stage runs 8 batched [16,3]x[3,4] matmuls of
67 MB each), so both run at HBM speed, not compute speed. These
kernels fuse each stage into one VMEM-resident pass:

- `assign_endpoints_pallas`: per block, the exact clip-aware error
  against every endpoint, minimized over the endpoint's 4 intensity
  codes, summed over the 16 pixels, argmin over endpoints. One
  [16*TB, 4] x [4, E] MXU matmul per code; everything else VPU.
- `inten_errors_pallas`: per block, the error of its own base color
  under each of the 8 intensity tables (min over 4 codes, pixel sum).
  Blocks ride the lane axis (the etc_pallas.py layout); pure VPU.

EXACT INTEGER SEMANTICS. All quantities are integers (uint8 pixels,
integer effective modifiers `clip(base+m)-base`, integer q terms), and
every f32 product/4-term dot here stays below 2^24, hence exact. The
per-pixel minima are cast to int32 and summed in int32, so the final
errors are exact integers whose value is independent of summation
order. The XLA reference paths in etc1s_encode.py use the same
accumulation, so kernel and reference agree bit-for-bit (argmin ties
included — both resolve to the lowest index), which is what the parity
tests lock (tests/test_pallas_parity.py).

Reference scope: basisu's ETC1S clusterizer (SURVEY §2: external
`basisu` binary driven by scripts/Encoder.py); the algorithm here is
the repo's own MXU formulation, these kernels only change where it
runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# blocks per grid step for the endpoint-assign kernel: 16*TB pixel rows.
# 128 keeps the kernel's VMEM residency (the [R,3] pixel arrays pad
# their lane dim to 128; plus two [R, Epad] candidate tiles) under the
# 16 MB scoped-vmem limit — 256 OOMs at E=256.
TILE_B = 128
# lanes (blocks) per grid step for the intensity-table kernel
TILE_L = 1024

_PAD_Q = 4.0e6  # per-pixel cand for padded endpoints; 16*_PAD_Q stays
# far above any real block error (<= ~42M) and far below int32 max


def _min4_dot(pf, const_ref, epad):
    """min over the 4 intensity codes of (q[e,j] - 2*p.me[e,j]).

    pf: [R, 3] f32 pixel rows. const_ref rows 4j..4j+3 hold
    [-2*me_r; -2*me_g; -2*me_b; q] for code j. The K=3 contraction is
    expanded as broadcast outer products on the VPU — as a dot_general
    the MXU pads K to 128 and wastes 97% of its cycles (measured ~45 ms
    vs ~68 ms XLA; this form is compute-proportional). Exact: sums of
    integer products < 2^24."""
    r = pf.shape[0]
    p = [pf[:, c : c + 1] for c in range(3)]  # [R, 1] each
    best = None
    for j in range(4):
        mj = const_ref[4 * j : 4 * j + 4, :]  # [4, Epad]
        cand = (
            jnp.broadcast_to(mj[3:4, :], (r, epad))
            + p[0] * mj[0:1, :]
            + p[1] * mj[1:2, :]
            + p[2] * mj[2:3, :]
        )  # [R, Epad] = q + (-2 me).p
        best = cand if best is None else jnp.minimum(best, cand)
    return best


def _assign_kernel(px_ref, const_ref, out_ref):
    # px_ref [TILE_B*16, 3] uint8 (row = block*16 + pixel); const_ref
    # [20, Epad] f32: rows 0..15 the per-code dot matrices, rows 16..19
    # the cross terms [-2*base_r; -2*base_g; -2*base_b; base_sq]
    pf = px_ref[:].astype(jnp.int32).astype(jnp.float32)  # [R, 3]
    r = pf.shape[0]
    tb = r // 16
    epad = const_ref.shape[1]
    best = _min4_dot(pf, const_ref, epad)  # [R, Epad] f32 exact ints
    mod_i = jnp.sum(
        best.astype(jnp.int32).reshape(tb, 16, epad), axis=1
    )  # [TB, Epad] int32 exact
    psum = jnp.sum(pf.reshape(tb, 16, 3), axis=1)  # [TB, 3] f32 exact
    br = const_ref[16:20, :]  # [-2 base; base_sq] rows
    cross = (
        jnp.broadcast_to(br[3:4, :], (tb, epad))
        + psum[:, 0:1] * br[0:1, :]
        + psum[:, 1:2] * br[1:2, :]
        + psum[:, 2:3] * br[2:3, :]
    )  # [TB, Epad] f32 exact ints
    err = mod_i + cross.astype(jnp.int32)
    mn = jnp.min(err, axis=1, keepdims=True)
    eidx = jax.lax.broadcasted_iota(jnp.int32, err.shape, 1)
    idx = jnp.min(
        jnp.where(err == mn, eidx, jnp.int32(1 << 30)), axis=1
    )  # first minimum wins, matching jnp.argmin
    out_ref[:] = idx[:, None]


def endpoint_const_rows(basef, me_e, q_ej, num_endpoints: int):
    """[20, Epad] constant input for `_assign_kernel` (trace-time).

    basef [E,3] f32 integer base colors; me_e [E,4,3] clip-aware
    effective modifiers; q_ej [E,4] the per-code constants. Padded
    endpoint columns get q=_PAD_Q so they never win the argmin."""
    e = basef.shape[0]
    epad = max(128, -(-e // 128) * 128)
    rows = []
    for j in range(4):
        rows.append(-2.0 * me_e[:, j, :].T)  # [3, E]
        rows.append(q_ej[:, j][None, :])  # [1, E]
    rows.append(-2.0 * basef.T)  # [3, E]
    base_sq = 16.0 * jnp.sum(basef * basef, axis=1)
    rows.append(base_sq[None, :])  # [1, E]
    const = jnp.concatenate(rows, axis=0)  # [20, E]
    if epad != e:
        pad = jnp.zeros((20, epad - e), jnp.float32)
        # q rows are 3, 7, 11, 15 — push padded endpoints out of range
        pad = pad.at[(3, 7, 11, 15), :].set(_PAD_Q)
        const = jnp.concatenate([const, pad], axis=1)
    return const


@functools.partial(jax.jit, static_argnums=(2,))
def assign_endpoints_pallas(pixels_u8, const20, interpret: bool = False):
    """pixels_u8 [N*16, 3] uint8 (block-major rows), const20 [20, Epad]
    from `endpoint_const_rows` -> assign [N] int32.

    The per-step block count scales down with the codebook width so the
    two [TB*16, Epad] candidate tiles stay inside scoped VMEM at the
    adaptive palette sizes (E up to 2048): TB*Epad is held at the
    measured-safe 128*256 budget."""
    epad = const20.shape[1]
    tile_b = max(8, (TILE_B * 256 // epad) // 8 * 8)
    r = pixels_u8.shape[0]
    n = r // 16
    npad = -(-n // tile_b) * tile_b
    if npad != n:
        pixels_u8 = jnp.pad(pixels_u8, ((0, (npad - n) * 16), (0, 0)))
    out = pl.pallas_call(
        _assign_kernel,
        grid=(npad // tile_b,),
        in_specs=[
            pl.BlockSpec(
                (tile_b * 16, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (20, const20.shape[1]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        interpret=interpret,
    )(pixels_u8, const20)
    return out[:n, 0]


# ---------------------------------------------------------------------------
# Intensity-table errors: blocks on lanes.
# ---------------------------------------------------------------------------


def _make_inten_kernel(tables):
    # `tables` is the static 8x4 integer modifier array
    def _inten_kernel(x_ref, base_ref, out_ref):
        # x_ref [48, TL] uint8, rows channel*16 + pixel; base_ref [3, TL]
        x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
        base = base_ref[:]  # f32 integer values
        d = [x[16 * c : 16 * (c + 1), :] - base[c : c + 1, :] for c in range(3)]
        outs = []
        for t in range(8):
            best = None
            for code in range(4):
                m = float(tables[t][code])
                me = [
                    jnp.clip(base[c : c + 1, :] + m, 0.0, 255.0)
                    - base[c : c + 1, :]
                    for c in range(3)
                ]  # [1, TL] each, integer-valued
                me2 = me[0] * me[0] + me[1] * me[1] + me[2] * me[2]
                cand = me2 - 2.0 * (
                    d[0] * me[0] + d[1] * me[1] + d[2] * me[2]
                )  # [16, TL]
                best = cand if best is None else jnp.minimum(best, cand)
            outs.append(
                jnp.sum(best.astype(jnp.int32), axis=0, keepdims=True)
            )
        out_ref[:] = jnp.concatenate(outs, axis=0)  # [8, TL] int32

    return _inten_kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def inten_errors_pallas(x48_u8, base3, tables, interpret: bool = False):
    """x48_u8 [48, N] uint8 (rows channel*16+pixel, blocks on lanes),
    base3 [3, N] f32 per-block base colors -> err_bt [N, 8] int32:
    exact block error under each intensity table (min over codes,
    summed over pixels)."""
    n = x48_u8.shape[1]
    npad = -(-n // TILE_L) * TILE_L
    if npad != n:
        x48_u8 = jnp.pad(x48_u8, ((0, 0), (0, npad - n)))
        base3 = jnp.pad(base3, ((0, 0), (0, npad - n)))
    out = pl.pallas_call(
        _make_inten_kernel(tables),
        grid=(npad // TILE_L,),
        in_specs=[
            pl.BlockSpec((48, TILE_L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_L), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.int32),
        interpret=interpret,
    )(x48_u8, base3)
    return out[:, :n].T


# ---------------------------------------------------------------------------
# Fused k-means iteration: nearest centroid + per-cluster sums/counts.
# ---------------------------------------------------------------------------

KM_TILE = 512  # feats rows per grid step


def _make_kmeans_kernel(d: int, k: int, n_valid: int):
    def _kernel(f_ref, c_ref, sums_ref, assign_ref):
        # f_ref [KM_TILE, D] f32; c_ref [D+1, Kpad] rows: -2*cb_d and c2;
        # sums_ref [Kpad, D+1] accumulated over grid steps; assign_ref
        # [KM_TILE, 1]
        @pl.when(pl.program_id(0) == 0)
        def _init():
            sums_ref[:] = jnp.zeros_like(sums_ref)

        f = f_ref[:]  # [T, D]
        t = f.shape[0]
        kpad = c_ref.shape[1]
        dist = jnp.broadcast_to(c_ref[d : d + 1, :], (t, kpad))
        for j in range(d):
            dist = dist + f[:, j : j + 1] * c_ref[j : j + 1, :]
        mn = jnp.min(dist, axis=1, keepdims=True)
        kidx = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        idx = jnp.min(
            jnp.where(dist == mn, kidx, jnp.int32(1 << 30)), axis=1
        )  # [T] first minimum, matching jnp.argmin
        assign_ref[:] = idx[:, None]
        # one-hot built on the fly (no [N, K] HBM materialization); the
        # [Kpad, T] x [T, D+1] product is a real-K MXU contraction
        # mask padding rows out of the accumulation (their assignments
        # are garbage and get sliced off; their one-hot must contribute 0)
        row0 = pl.program_id(0) * t
        valid = (
            row0 + jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        ) < jnp.int32(n_valid)  # [1, T]
        oh = jnp.where(
            valid,
            (
                jax.lax.broadcasted_iota(jnp.int32, (kpad, t), 0)
                == idx[None, :]
            ).astype(jnp.float32),
            0.0,
        )
        f1 = jnp.concatenate([f, jnp.ones((t, 1), jnp.float32)], axis=1)
        sums_ref[:] += jax.lax.dot_general(
            oh, f1, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    return _kernel


@functools.partial(jax.jit, static_argnums=(2,))
def kmeans_iter_pallas(feats, cb, interpret: bool = False):
    """One fused Lloyd iteration: feats [N, D], cb [K, D] ->
    (sums [K, D], counts [K], assign [N]) where sums/counts aggregate
    the nearest-centroid partition. Distances use the expanded form
    c2 - 2*f.c (the f2 term is argmin-invariant); all f32."""
    n, d = feats.shape
    k = cb.shape[0]
    kpad = max(128, -(-k // 128) * 128)
    npad = -(-n // KM_TILE) * KM_TILE
    if npad != n:
        feats = jnp.pad(feats, ((0, npad - n), (0, 0)))
    cbf = cb.astype(jnp.float32)
    crows = jnp.concatenate(
        [-2.0 * cbf.T, jnp.sum(cbf * cbf, axis=1)[None, :]], axis=0
    )  # [D+1, K]
    if kpad != k:
        pad = jnp.full((d + 1, kpad - k), 0.0, jnp.float32)
        # padded centroids sit at +inf distance
        pad = pad.at[d, :].set(jnp.float32(3.4e38))
        crows = jnp.concatenate([crows, pad], axis=1)
    sums, assign = pl.pallas_call(
        _make_kmeans_kernel(d, k, n),
        grid=(npad // KM_TILE,),
        in_specs=[
            pl.BlockSpec((KM_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d + 1, kpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((kpad, d + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KM_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kpad, d + 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(feats, crows)
    return sums[:k, :d], sums[:k, d], assign[:n, 0]
