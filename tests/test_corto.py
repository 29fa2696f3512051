"""Corto codec tests: format fidelity + roundtrips (UVOL 1.0 geometry)."""

import numpy as np
import pytest

from uvol_tpu.codecs.corto import decode_crt, encode_crt
from uvol_tpu.codecs.corto.bitstream import BitReader, BitWriter
from uvol_tpu.codecs.corto.stream import CortoInStream, CortoOutStream
from uvol_tpu.codecs.corto import tunstall


def _grid_mesh(W=16):
    xx, yy = np.mgrid[0:W, 0:W]
    pos = np.stack(
        [xx.ravel() * 0.1, yy.ravel() * 0.1,
         (xx.ravel() * 7 + yy.ravel() * 13) * 0.001], -1
    ).astype(np.float32)
    faces = []
    for y in range(W - 1):
        for x in range(W - 1):
            i = y * W + x
            faces.append([i, i + 1, i + W])
            faces.append([i + 1, i + W + 1, i + W])
    return pos, np.asarray(faces, np.int64)


def test_bitstream_roundtrip():
    bw = BitWriter()
    vals = [(5, 3), (0x1FFFF, 17), (1, 1), (0xFFFFFFFF, 32), (0, 5), (123, 10)]
    for v, n in vals:
        bw.write(v, n)
    data = bw.getvalue()
    assert len(data) % 4 == 0
    br = BitReader(np.frombuffer(data, "<u4"))
    for v, n in vals:
        assert br.read(n) == v & ((1 << n) - 1)


def test_tunstall_roundtrip():
    r = np.random.default_rng(0)
    for dist in (
        np.minimum(r.geometric(0.3, 5000) - 1, 20),  # skewed
        r.integers(0, 4, 2000),  # small alphabet
        np.zeros(1000, int),  # single symbol
        np.minimum(r.geometric(0.02, 3000) - 1, 200),  # low entropy path
    ):
        data = dist.astype(np.uint8)
        probs = tunstall.get_probabilities(data)
        comp = tunstall.compress(data, probs)
        out = tunstall.decompress(comp, probs, len(data))
        np.testing.assert_array_equal(out, data)


def test_stream_value_coders():
    r = np.random.default_rng(1)
    out = CortoOutStream()
    arr = (r.standard_normal((500, 3)) * 40).astype(np.int64)
    vals = (r.standard_normal((500, 2)) * 15).astype(np.int64)
    diffs = (r.standard_normal(700) * 9).astype(np.int64)
    idx = r.integers(0, 1000, 300)
    out.encode_array(arr, 3)
    out.encode_values(vals, 2)
    out.encode_diffs(diffs)
    out.encode_indices(idx)
    s = CortoInStream(out.getvalue())
    np.testing.assert_array_equal(s.decode_array(3, 500), arr)
    np.testing.assert_array_equal(s.decode_values(2, 500), vals)
    np.testing.assert_array_equal(s.decode_diffs(700), diffs)
    np.testing.assert_array_equal(s.decode_indices(300), idx)
    assert s.pos == len(out.getvalue())


def test_crt_roundtrip_connectivity_exact():
    pos, faces = _grid_mesh()
    blob = encode_crt(pos, faces)
    mesh = decode_crt(blob)
    assert mesh.nvert == len(pos) and mesh.nface == len(faces)
    dec = mesh.attributes["position"]
    # vertex mapping by nearest (all distinct)
    from scipy.spatial import cKDTree

    d, idx = cKDTree(pos).query(dec)
    step = float(np.linalg.norm(pos.max(0) - pos.min(0))) / (1 << 12)
    assert d.max() <= step * 2
    assert len(set(idx)) == len(idx)
    mapped = idx[mesh.faces]
    src = {tuple(np.roll(f, -np.argmin(f))) for f in faces}
    got = {tuple(np.roll(f, -np.argmin(f))) for f in mapped}
    assert src == got  # exact connectivity incl. orientation


def test_crt_attributes_roundtrip():
    pos, faces = _grid_mesh(10)
    n = len(pos)
    r = np.random.default_rng(2)
    uv = r.uniform(0, 1, (n, 2)).astype(np.float32)
    nrm = r.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = r.integers(0, 256, (n, 4))
    blob = encode_crt(pos, faces, uvs=uv, normals=nrm, colors=col)
    mesh = decode_crt(blob)
    assert set(mesh.attributes) == {"position", "uv", "normal", "color"}
    from scipy.spatial import cKDTree

    _, idx = cKDTree(pos).query(mesh.attributes["position"])
    np.testing.assert_allclose(
        mesh.attributes["uv"], uv[idx], atol=1.1 / 1024
    )
    dots = np.sum(mesh.attributes["normal"] * nrm[idx], axis=1)
    assert dots.min() > 0.99  # 10-bit octahedral
    # color: quantized to (6,7,6,5) bits
    dc = np.abs(
        mesh.attributes["color"].astype(int)[:, :3] - col[idx][:, :3]
    )
    assert dc.max() <= 8


def test_crt_compression_ratio():
    pos, faces = _grid_mesh(24)
    blob = encode_crt(pos, faces)
    bpv = len(blob) * 8 / len(pos)
    assert bpv < 40  # raw would be 96 bits/vert + 96 bits/face


def test_crt_point_cloud():
    r = np.random.default_rng(3)
    pos = np.sort(r.uniform(0, 1, (500, 3)).astype(np.float32), axis=0)
    blob = encode_crt(pos, np.zeros((0, 3), np.int64))
    mesh = decode_crt(blob)
    assert mesh.nface == 0
    assert mesh.attributes["position"].shape == (500, 3)


def test_crt_multigroup_roundtrip():
    """Multi-group encode (per-group front machines, shared vertex
    numbering) matches the decoder's per-group CLER restart semantics."""
    pos, faces = _grid_mesh(12)
    n = len(faces)
    groups = [n // 3, 2 * n // 3, n]
    blob = encode_crt(pos, faces, groups=groups)
    mesh = decode_crt(blob)
    assert mesh.nface == n
    assert [g["end"] for g in mesh.groups] == groups
    # every encoded face must exist in the source (orientation-preserving,
    # cyclic rotations allowed), and counts must match exactly
    def canon(f):
        f = list(map(int, f))
        k = f.index(min(f))
        return tuple(f[k:] + f[:k])
    dec = mesh.attributes["position"]
    from scipy.spatial import cKDTree
    _, idx = cKDTree(pos).query(dec)
    src = sorted(canon(f) for f in faces)
    got = sorted(canon([idx[a], idx[b], idx[c]]) for a, b, c in mesh.faces)
    assert src == got


def test_crt_python_native_parity():
    """Native and pure-Python corto paths emit identical bytes."""
    import importlib
    import os

    pos, faces = _grid_mesh(8)
    r = np.random.default_rng(5)
    uv = r.uniform(0, 1, (len(pos), 2)).astype(np.float32)
    blob_native = encode_crt(pos, faces, uvs=uv)

    from uvol_tpu import native as native_mod

    saved = native_mod._corto_lib, native_mod._corto_failed
    native_mod._corto_lib, native_mod._corto_failed = None, True
    try:
        blob_py = encode_crt(pos, faces, uvs=uv)
        mesh_py = decode_crt(blob_native)
    finally:
        native_mod._corto_lib, native_mod._corto_failed = saved
    assert blob_py == blob_native
    mesh_nat = decode_crt(blob_native)
    np.testing.assert_array_equal(mesh_py.faces, mesh_nat.faces)
    for k in mesh_py.attributes:
        np.testing.assert_array_equal(
            mesh_py.attributes[k], mesh_nat.attributes[k]
        )


def test_decode_crt_fuzz_no_crash():
    """Corrupted/truncated .crt streams must raise, never crash: the native
    value-stream unpackers validate log bytes and bit-stream bounds, the
    CLER machine validates group tables / split refs / vertex budgets, and
    delta integration validates prediction indices (all found by an
    ASan-backed fuzz pass)."""
    import numpy as np

    from uvol_tpu.codecs.corto.decoder import decode_crt
    from uvol_tpu.codecs.corto.encoder import encode_crt

    pos = np.array(
        [[i, j, (i * j) % 5] for i in range(8) for j in range(8)], np.float32
    )
    idx = lambda i, j: i * 8 + j  # noqa: E731
    faces = np.array(
        [[idx(i, j), idx(i + 1, j), idx(i + 1, j + 1)]
         for i in range(7) for j in range(7)],
        np.int32,
    )
    uv = (pos[:, :2] / 8).astype(np.float32)
    crt = bytearray(encode_crt(pos, faces, uvs=uv))
    r = np.random.default_rng(0)
    for _ in range(150):
        i = int(r.integers(0, len(crt)))
        old = crt[i]
        crt[i] = int(r.integers(0, 256))
        try:
            decode_crt(bytes(crt))
        except Exception:
            pass  # errors fine, crashes are not
        crt[i] = old
    for n in range(0, len(crt), 23):
        try:
            decode_crt(bytes(crt[:n]))
        except Exception:
            pass
    assert len(decode_crt(bytes(crt)).faces) == 49  # pristine still decodes


def test_entropy_zlib_lz4_roundtrip():
    """Full .crt roundtrip with the reference's ENTROPY_TESTS modes
    (cstream.h:39 enum, cstream.cpp:124-168 wire framing): ZLIB via
    stdlib zlib, LZ4 via the block codec in codecs/corto/lz4.py."""
    from uvol_tpu.codecs.corto.stream import (
        ENTROPY_LZ4,
        ENTROPY_NONE,
        ENTROPY_ZLIB,
    )

    pos, faces = _grid_mesh()
    ref = decode_crt(encode_crt(pos, faces))  # tunstall baseline
    for entropy in (ENTROPY_NONE, ENTROPY_ZLIB, ENTROPY_LZ4):
        blob = encode_crt(pos, faces, entropy=entropy)
        mesh = decode_crt(blob)
        np.testing.assert_array_equal(mesh.faces, ref.faces)
        np.testing.assert_allclose(
            mesh.attributes["position"], ref.attributes["position"]
        )


def test_entropy_huffman_rejected_like_reference():
    """HUFFMAN (=2) has no implementation in the reference either — its
    dispatch throws "Unknown entropy" (cstream.cpp:55-57)."""
    from uvol_tpu.codecs.corto.stream import ENTROPY_HUFFMAN

    pos, faces = _grid_mesh(4)
    with pytest.raises(ValueError, match="entropy"):
        encode_crt(pos, faces, entropy=ENTROPY_HUFFMAN)


def test_lz4_block_codec():
    """LZ4 block codec: compressible + incompressible + edge sizes, and
    overlapping-match replication (offset < length)."""
    from uvol_tpu.codecs.corto import lz4

    r = np.random.default_rng(3)
    cases = [
        b"",
        b"a",
        b"abcd" * 100,
        bytes(r.integers(0, 256, 1000, dtype=np.uint8)),
        bytes(r.integers(0, 4, 5000, dtype=np.uint8)),
        b"x" * 64,  # overlap: offset 1 match
    ]
    for raw in cases:
        enc = lz4.compress(raw)
        assert lz4.decompress(enc, len(raw)) == raw
    # hand-built stream: 4 literals, a 12-byte match at offset 1 (which
    # replicates the last byte), then the mandatory literals-only final
    # sequence of 5 bytes
    out = lz4.decompress(
        bytes([0x48]) + b"abcd" + bytes([1, 0]) + bytes([0x50]) + b"efghi",
        4 + 12 + 5,
    )
    assert out == b"abcd" + b"d" * 12 + b"efghi"


def _staged(blob):
    """Decode via the staged pipeline (oracle for the C orchestrator)."""
    import os

    os.environ["UVT_CRT_STAGED"] = "1"
    try:
        return decode_crt(blob)
    finally:
        os.environ.pop("UVT_CRT_STAGED", None)


def _assert_mesh_equal(m1, m2):
    np.testing.assert_array_equal(m1.faces, m2.faces)
    assert set(m1.attributes) == set(m2.attributes)
    for k in m1.attributes:
        a1, a2 = m1.attributes[k], m2.attributes[k]
        assert a1.dtype == a2.dtype, (k, a1.dtype, a2.dtype)
        np.testing.assert_array_equal(a1, a2, err_msg=k)


@pytest.mark.parametrize("entropy", [0, 1, 3, 4])
def test_crt_frame_orchestrator_parity(entropy):
    """Whole-frame C decode (corto_frame.cpp) is bit-exact vs the staged
    pipeline across entropy modes and all attribute codecs."""
    pos, faces = _grid_mesh(12)
    r = np.random.default_rng(7)
    uv = r.uniform(0, 1, (len(pos), 2)).astype(np.float32)
    nrm = r.normal(size=(len(pos), 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = r.integers(0, 256, (len(pos), 4)).astype(np.uint8)
    blob = encode_crt(
        pos, faces, uvs=uv, normals=nrm.astype(np.float32), colors=col,
        exif={"meta": "x"}, entropy=entropy,
    )
    _assert_mesh_equal(_staged(blob), decode_crt(blob))


def test_crt_frame_orchestrator_point_cloud():
    r = np.random.default_rng(11)
    pos = r.uniform(0, 1, (200, 3)).astype(np.float32)
    col = r.integers(0, 256, (200, 4)).astype(np.uint8)
    blob = encode_crt(pos, np.zeros((0, 3), np.int64), colors=col)
    _assert_mesh_equal(_staged(blob), decode_crt(blob))


def test_crt_frame_orchestrator_multigroup():
    pos, faces = _grid_mesh(10)
    half = len(faces) // 2
    blob = encode_crt(pos, faces, groups=[half, len(faces)])
    _assert_mesh_equal(_staged(blob), decode_crt(blob))


@pytest.mark.parametrize("mode", ["estimated", "border"])
def test_crt_normal_prediction_modes(mode):
    """ESTIMATED/BORDER normal coding (reference normal_attribute.cpp):
    encoder replays decoder connectivity so corrections land exactly;
    staged and whole-frame C decodes agree bit-for-bit."""
    pos, faces = _grid_mesh(14)
    r = np.random.default_rng(3)
    nrm = r.normal(size=(len(pos), 3)) * 0.15
    nrm[:, 2] += 1.0
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm.astype(np.float32)

    blob = encode_crt(pos, faces, normals=nrm, normal_prediction=mode)
    blob_diff = encode_crt(pos, faces, normals=nrm)
    m = _staged(blob)
    _assert_mesh_equal(m, decode_crt(blob))

    md = decode_crt(blob_diff)
    dots = np.sum(m.attributes["normal"] * md.attributes["normal"], 1)
    if mode == "estimated":
        # corrections reproduce the DIFF-mode (quantized-exact) normals
        assert dots.min() > 0.9999
    else:
        # border: smaller stream; corrections exist only for boundary
        # vertices — those reproduce the quantized normals exactly, while
        # interior vertices carry the geometry estimate (sign follows the
        # face winding, so compare |dot| there)
        assert len(blob) < len(blob_diff)
        f = m.faces.astype(np.int64)
        boundary = np.zeros(len(dots), np.int64)
        np.bitwise_xor.at(boundary, f[:, 0], f[:, 1] ^ f[:, 2])
        np.bitwise_xor.at(boundary, f[:, 1], f[:, 2] ^ f[:, 0])
        np.bitwise_xor.at(boundary, f[:, 2], f[:, 0] ^ f[:, 1])
        is_b = boundary != 0
        assert is_b.any() and (~is_b).any()
        assert dots[is_b].min() > 0.9999
        assert np.abs(dots[~is_b]).min() > 0.8


def test_crt_normal_prediction_rejects_point_cloud():
    pos = np.zeros((10, 3), np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (10, 1))
    with pytest.raises(ValueError, match="point clouds"):
        encode_crt(pos, np.zeros((0, 3), np.int64), normals=nrm,
                   normal_prediction="estimated")


def test_crt_custom_attributes_roundtrip():
    """Custom per-vertex attributes (reference Encoder::addAttribute,
    encoder.h:54-79): float attrs quantize by step / bits-from-range,
    integer attrs store exact; both decode through the native
    orchestrator AND the staged oracle by generic-codec dispatch."""
    import os

    from uvol_tpu.codecs.corto.encoder import CrtCustomAttr

    pos, faces = _grid_mesh(12)
    n = len(pos)
    r = np.random.default_rng(3)
    heat = r.normal(size=(n, 1)).astype(np.float32)
    flags = r.integers(-5, 200, (n, 2)).astype(np.int64)
    blob = encode_crt(
        pos, faces,
        custom_attributes={
            "heat": CrtCustomAttr(heat, step=1e-3),
            "flags": CrtCustomAttr(flags),
            "auto": CrtCustomAttr(heat * 40.0, bits=14),
        },
    )
    for staged in (None, "1"):
        if staged:
            os.environ["UVT_CRT_STAGED"] = staged
        try:
            m = decode_crt(blob)
        finally:
            os.environ.pop("UVT_CRT_STAGED", None)
        idx = _vertex_map(m.attributes["position"], pos)
        assert np.abs(m.attributes["heat"] - heat[idx]).max() <= 1e-3
        np.testing.assert_array_equal(m.attributes["flags"], flags[idx])
        rng = float(heat.max() - heat.min()) * 40.0
        assert np.abs(
            m.attributes["auto"] - heat[idx] * 40.0
        ).max() <= rng / (1 << 14)
    with pytest.raises(ValueError):
        encode_crt(
            pos, faces, custom_attributes={"uv": CrtCustomAttr(heat)}
        )


def test_crt_trajectory_attributes():
    """The trajectory-fork path (reference main.cpp:189-202): polynomial
    motion coefficients ride the `.crt` as xPos/yPos/zPos custom attrs;
    a decoder reconstructs any frame by evaluating the polynomial."""
    from uvol_tpu.codecs.corto.encoder import CrtCustomAttr
    from uvol_tpu.models.trajectory import fit_trajectories

    pos, faces = _grid_mesh(10)
    f = 12
    t = np.linspace(0.0, 1.0, f, dtype=np.float32)
    seq = (
        pos[None, :, :]
        + np.stack([0.3 * t**2, 0.1 * t, 0.2 * t**3], -1)[:, None, :]
    ).astype(np.float32)
    group = fit_trajectories(seq, degree=3)
    coeffs = np.asarray(group.coefficients)  # [4, N, 3]
    custom = {
        name: CrtCustomAttr(
            np.ascontiguousarray(coeffs[:, :, axis].T), bits=16
        )
        for axis, name in enumerate(("xPos", "yPos", "zPos"))
    }
    blob = encode_crt(seq[0], faces, custom_attributes=custom)
    m = decode_crt(blob)
    idx = _vertex_map(m.attributes["position"], seq[0])
    got = np.stack(
        [m.attributes[nm] for nm in ("xPos", "yPos", "zPos")], -1
    )  # [N, 4, 3] in decoded vertex order
    # evaluate the decoded polynomial at the last frame
    powers = np.array([1.0, 1.0, 1.0, 1.0], np.float32)  # t=1
    recon = np.einsum("nkc,k->nc", got, powers)
    assert np.abs(recon - seq[-1][idx]).max() < 2e-3


def _vertex_map(decoded_pos, orig_pos):
    """decoded index -> original index (the traversal renumbers
    vertices; grid vertices are distinct so nearest is exact)."""
    from scipy.spatial import cKDTree

    _, idx = cKDTree(orig_pos).query(decoded_pos)
    return idx


