"""Golden tests: decode real Draco files from the reference corpus.

These exercise the full bitstream path (rANS, valence Edgebreaker, seam
decode, traversals, prediction schemes, transforms) against files produced
by the real draco_encoder — the strongest parity evidence available
offline (no reference decoder binary exists in this environment).
"""

import numpy as np
import pytest

from uvol_tpu.codecs.buffer import DecoderBuffer
from uvol_tpu.codecs.draco.edgebreaker import decode_edgebreaker_connectivity


@pytest.fixture(scope="module")
def frame0(liam_output):
    return (liam_output / "geometry_draco" / "00000.drc").read_bytes()


def test_connectivity_exact(frame0):
    """Connectivity decode is exact: every rANS section consumed to the
    byte, valence contexts exhausted, vertex/face counts match header."""
    buf = DecoderBuffer(frame0)
    buf.pos = 11  # after header
    conn = decode_edgebreaker_connectivity(buf)
    assert conn.num_vertices == 26145
    ct = conn.corner_table
    faces = ct.faces()
    assert faces.shape == (52290, 3)
    assert not (faces < 0).any()
    # manifold sanity: Euler characteristic V - E + F = 0 (genus 1, matches
    # the 2 topology-split events in the stream)
    e = np.unique(
        np.sort(
            np.stack([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
            .reshape(-1, 2),
            axis=1,
        ),
        axis=0,
    )
    assert conn.num_vertices - len(e) + len(faces) == 0
    # valence histogram must match the per-context symbol counts decoded
    # from the stream (independent cross-check)
    valences = np.bincount(faces.reshape(-1))
    valences = valences[valences > 0]
    assert int((valences == 5).sum()) == 6980
    assert int((valences == 4).sum()) == 1655


def test_full_decode_geometry(frame0):
    from uvol_tpu.codecs.draco.decoder import decode_drc

    mesh = decode_drc(frame0)
    assert mesh.num_points == 32128
    assert len(mesh.faces) == 52290
    pos = mesh.point_attribute(0)
    uv = mesh.point_attribute(3)
    nrm = mesh.point_attribute(1)
    gen = mesh.point_attribute(4)
    assert pos.shape == (32128, 3) and uv.shape == (32128, 2)
    # human-scan shaped bbox (tall in y — the round-1 broken decode had
    # outliers that stretched z instead), smooth surface
    bbox = pos.max(0) - pos.min(0)
    assert bbox[1] > 2.2 * bbox[0] and bbox[1] > 2.2 * bbox[2]
    f = mesh.faces
    e = np.linalg.norm(pos[f[:, 0]] - pos[f[:, 1]], axis=1)
    assert np.median(e) < 12.0  # quantization units ~= few mm
    assert np.all((uv >= -0.01) & (uv <= 1.1))
    assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-3)
    assert np.all(gen == 0)
    # smoothness: a correct prediction decode leaves no Laplacian outliers
    # (the round-1 adaptive heuristic left ~3k vertices with residual >50)
    rms, mx = _laplacian_residual(pos, f)
    assert mx < 50.0, (rms, mx)


def _laplacian_residual(pos, f):
    """(rms, max) distance of each vertex from the mean of its neighbors."""
    n = len(pos)
    acc = np.zeros((n, 3))
    cnt = np.zeros(n)
    for i in range(3):
        a, b = f[:, i], f[:, (i + 1) % 3]
        np.add.at(acc, a, pos[b])
        np.add.at(cnt, a, 1)
        np.add.at(acc, b, pos[a])
        np.add.at(cnt, b, 1)
    r = np.linalg.norm(pos - acc / np.maximum(cnt, 1)[:, None], axis=1)
    return float(np.sqrt((r**2).mean())), float(r.max())


def test_decode_multiple_frames(liam_output):
    from uvol_tpu.codecs.draco.decoder import decode_drc

    for idx in ("00001", "00100"):
        data = (liam_output / "geometry_draco" / f"{idx}.drc").read_bytes()
        mesh = decode_drc(data)
        assert mesh.num_points > 20000
        pos = mesh.point_attribute(0)
        f = mesh.faces
        e = np.linalg.norm(pos[f[:, 0]] - pos[f[:, 1]], axis=1)
        assert np.median(e) < 12.0
        rms, mx = _laplacian_residual(pos, f)
        assert mx < 150.0, (idx, rms, mx)  # sharp features reach ~75; broken decodes 1700+
