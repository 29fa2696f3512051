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


def test_decimate_mesh_quadric_collapse():
    """pyprogmesh-equivalent edge collapse: target count reached, geometry
    preserved within tolerance, collapse_map resolves to live vertices."""
    from uvol_tpu.models.decimate import decimate_mesh

    # densely tessellated sphere
    nu, nv = 24, 18
    verts, faces = [], []
    for i in range(nu):
        for j in range(nv):
            th, ph = np.pi * (j + 0.5) / nv, 2 * np.pi * i / nu
            verts.append(
                [np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)]
            )
    idx = lambda i, j: (i % nu) * nv + max(0, min(j, nv - 1))
    for i in range(nu):
        for j in range(nv - 1):
            a, b, c, d = idx(i, j), idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    pos = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)

    d = decimate_mesh(pos, f, target_vertices=len(pos) // 4)
    assert len(d.positions) <= len(pos) // 4 + 2
    assert len(d.faces) < len(f)
    assert (d.faces >= 0).all() and (d.faces < len(d.positions)).all()
    # no degenerate faces
    assert (
        (d.faces[:, 0] != d.faces[:, 1])
        & (d.faces[:, 1] != d.faces[:, 2])
        & (d.faces[:, 2] != d.faces[:, 0])
    ).all()
    # decimated surface still lies near the unit sphere
    r = np.linalg.norm(d.positions, axis=1)
    assert abs(r - 1.0).max() < 0.05
    # collapse_map resolves every original vertex to a kept one
    kept = set(d.kept_original_ids.tolist())
    assert all(int(v) in kept for v in d.collapse_map)
    # progressive property: collapse order + map enable LOD reconstruction
    assert len(d.collapse_order) == len(pos) - len(d.positions)
