"""Device mesh + sharding helpers (frame-parallel volumetric pipelines).

The reference's parallelism is worker pools over frames/segments
(SURVEY.md §2.4: DRACOLoader pool ≤4 workers, Basis WorkerPool). The
TPU-native equivalent is pure data parallelism over the frame axis of a
`jax.sharding.Mesh`: frames ride ICI within a slice, DCN across slices,
with collectives only for reductions (stats/codebooks).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAME_AXIS = "frames"
BLOCK_AXIS = "blocks"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (FRAME_AXIS,),
) -> Mesh:
    """1-D frame mesh by default; pass axis_shapes for frames×blocks grids."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    grid = np.asarray(devices).reshape(axis_shapes)
    return Mesh(grid, axis_names=tuple(axis_names))


def frame_sharding(mesh: Mesh, ndim: int, frame_dim: int = 0) -> NamedSharding:
    """Shard `frame_dim` over the frame axis, replicate the rest."""
    spec = [None] * ndim
    spec[frame_dim] = FRAME_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frames(mesh: Mesh, array: jax.Array, frame_dim: int = 0) -> jax.Array:
    """Place a frame-batched array so each device owns a frame slice."""
    return jax.device_put(array, frame_sharding(mesh, array.ndim, frame_dim))


def pad_frames_to_mesh(array: np.ndarray, mesh: Mesh, frame_dim: int = 0):
    """Pad the frame axis to a multiple of the mesh's frame-axis size.

    Returns (padded, original_count) — ragged sequences are the norm
    (SURVEY.md §7 hard part (d)).
    """
    n = array.shape[frame_dim]
    per = mesh.shape[FRAME_AXIS]
    target = -(-n // per) * per
    if target == n:
        return array, n
    pad = [(0, 0)] * array.ndim
    pad[frame_dim] = (0, target - n)
    return np.pad(array, pad), n
