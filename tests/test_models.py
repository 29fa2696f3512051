import numpy as np
import pytest

from uvol_tpu.models.trajectory import (
    TrajectoryGroup,
    fit_trajectories,
    group_fixed_topology,
    reconstruction_error,
)


def test_trajectory_fit_exact_for_polynomials():
    # data generated from a degree-3 polynomial must fit ~exactly at degree 4
    f, n = 20, 50
    t = np.linspace(0, 1, f)[:, None, None]
    r = np.random.default_rng(0)
    c = r.normal(size=(4, n, 3)).astype(np.float32)
    pos = sum(c[k] * t**k for k in range(4)).astype(np.float32)
    g = fit_trajectories(pos, degree=4)
    assert reconstruction_error(pos, g) < 1e-3
    # 12x compression vs raw frames (reference stores 15 floats per vertex
    # instead of frames*3)
    raw = f * n * 3
    stored = (g.degree + 1) * n * 3
    assert stored < raw / 3


def test_trajectory_small_group_degree_clamp():
    pos = np.zeros((3, 10, 3), np.float32)
    g = fit_trajectories(pos, degree=4)
    assert g.degree == 2  # clamped to frames-1


def test_group_fixed_topology():
    counts = np.array([5, 5, 5, 7, 7, 5])
    assert group_fixed_topology(counts) == [(0, 3), (3, 5), (5, 6)]


def test_pointcloud_sequence_roundtrip():
    from uvol_tpu.models.pointcloud import PointCloudSequenceCodec

    r = np.random.default_rng(1)
    pos = r.uniform(0, 1, (2, 400, 3)).astype(np.float32)
    codec = PointCloudSequenceCodec()
    blobs = codec.encode(pos)
    assert len(blobs) == 2
    decoded = codec.decode(blobs)
    for i in range(2):
        # order changed (Morton sort); compare as sets via sorting
        a = np.sort(decoded[i], axis=0)
        b = np.sort(pos[i], axis=0)
        assert np.abs(a - b).max() < 2e-3
