"""Native (C++) Draco decode path parity vs the Python reference.

draco_native.cpp is the production hot path (~50x the Python decode);
every stage must be bit-identical to the Python implementations, which
are the golden-validated oracle.
"""

import numpy as np
import pytest

from uvol_tpu import native


@pytest.fixture()
def python_only(monkeypatch):
    """Force the Python fallbacks."""
    monkeypatch.setattr(native, "_draco_failed", True)
    monkeypatch.setattr(native, "_draco_lib", None)


def test_native_lib_builds():
    assert native.get_draco_lib() is not None


def test_rabs_bits_parity():
    from uvol_tpu.codecs.buffer import DecoderBuffer, EncoderBuffer
    from uvol_tpu.codecs.rans import RansBitDecoder, RansBitEncoder

    r = np.random.default_rng(0)
    bits = (r.uniform(size=500) < 0.3).astype(int).tolist()
    enc = RansBitEncoder()
    for b in bits:
        enc.encode_bit(b)
    out = EncoderBuffer()
    enc.flush(out)
    dec = RansBitDecoder(DecoderBuffer(out.getvalue()))
    got = native.rabs_decode_bits_native(dec.prob_zero, dec._buf, len(bits))
    assert got is not None
    assert got.tolist() == bits


def test_full_decode_parity_liam(liam_output):
    """Whole-file decode: native must equal Python exactly on real frames."""
    import uvol_tpu.codecs.draco.decoder as D

    for idx in ("00000", "00100"):
        data = (liam_output / "geometry_draco" / f"{idx}.drc").read_bytes()
        assert native.get_draco_lib() is not None
        m_native = D.decode_drc(data)
        # Python fallback
        saved = (native._draco_failed, native._draco_lib)
        native._draco_failed, native._draco_lib = True, None
        try:
            m_python = D.decode_drc(data)
        finally:
            native._draco_failed, native._draco_lib = saved
        assert m_native.num_points == m_python.num_points
        np.testing.assert_array_equal(m_native.faces, m_python.faces)
        for t in (0, 3, 1, 4):
            np.testing.assert_array_equal(
                m_native.point_attribute(t), m_python.point_attribute(t)
            )


def test_decode_throughput_real_time(liam_output):
    """The native path must decode a liam frame comfortably under the 33 ms
    real-time budget x4 threads (reference bar: 30 fps with <=4 workers)."""
    import time

    import uvol_tpu.codecs.draco.decoder as D

    data = (liam_output / "geometry_draco" / "00000.drc").read_bytes()
    D.decode_drc(data)  # warm (native build)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        D.decode_drc(data)
    ms = (time.perf_counter() - t0) / reps * 1000
    # single-thread bound: 4 pool workers at this speed clear 30 fps
    assert ms < 133, f"{ms:.1f} ms/frame"


def test_whole_frame_orchestrator_parity(liam_output, monkeypatch):
    """draco_frame.cpp one-call decode must be bit-identical to the staged
    pipeline (values, dtypes, corner maps, point numbering) on real frames,
    including a seam-heavy one."""
    import uvol_tpu.codecs.draco.decoder as D

    for name in ("00000.drc", "00123.drc", "00249.drc"):
        data = (liam_output / "geometry_draco" / name).read_bytes()
        m_fast = D._decode_drc_native(data)
        assert m_fast is not None, "fast path rejected a liam frame"
        m_staged = D._decode_drc(data)
        assert m_fast.num_points == m_staged.num_points
        np.testing.assert_array_equal(m_fast.faces, m_staged.faces)
        np.testing.assert_array_equal(
            m_fast._point_of_corner, m_staged._point_of_corner
        )
        assert len(m_fast.attributes) == len(m_staged.attributes)
        for a, b in zip(m_fast.attributes, m_staged.attributes):
            assert (a.attribute_type, a.data_type, a.num_components,
                    a.normalized, a.unique_id) == (
                b.attribute_type, b.data_type, b.num_components,
                b.normalized, b.unique_id)
            assert a.values.dtype == b.values.dtype
            np.testing.assert_array_equal(a.values, b.values)
            np.testing.assert_array_equal(a.corner_to_value, b.corner_to_value)


def test_whole_frame_orchestrator_rejects_cleanly():
    """Unsupported/garbage streams must return None (fallback), not crash."""
    assert native.drc_decode_native(b"") is None
    assert native.drc_decode_native(b"NOTDRACO" * 4) is None
    # truncated real header
    assert native.drc_decode_native(b"DRACO\x02\x02\x01\x01") is None


def test_whole_frame_orchestrator_fuzz_no_crash(liam_output):
    """Truncated / corrupted streams must fall back or error, never crash
    (the C parser validates every output-buffer-sizing field; verified
    under AddressSanitizer with 500+ corruptions)."""
    import uvol_tpu.codecs.draco.decoder as D

    blob = bytearray((liam_output / "geometry_draco" / "00000.drc").read_bytes())
    for n in list(range(0, 120, 11)) + [len(blob) // 2]:
        D._decode_drc_native(bytes(blob[:n]))  # None or mesh, no crash
    r = np.random.default_rng(0)
    for _ in range(60):
        i = int(r.integers(0, len(blob)))
        old = blob[i]
        blob[i] = int(r.integers(0, 256))
        try:
            D._decode_drc_native(bytes(blob))
        except Exception:
            pass  # malformed-stream errors are fine; crashes are not
        blob[i] = old
    assert D._decode_drc_native(bytes(blob)) is not None


def test_whole_frame_decode_thread_safety(liam_output):
    """The one-call decoder releases the GIL; 4 workers decoding the same
    frames must produce bit-identical results to serial decode."""
    import uvol_tpu.codecs.draco.decoder as D
    from uvol_tpu.runtime.prefetch import PrefetchPool

    blobs = [
        (liam_output / "geometry_draco" / f"{i:05d}.drc").read_bytes()
        for i in range(6)
    ]
    serial = [D.decode_drc(b) for b in blobs]
    pool = PrefetchPool(D.decode_drc, workers=4)
    for i, b in enumerate(blobs * 2):
        pool.request(i, b)
    pool.wait_idle(120)
    done = pool.poll()
    pool.close()
    assert len(done) == 12
    for i in range(12):
        mesh, err = done[i]
        assert err is None
        ref = serial[i % 6]
        np.testing.assert_array_equal(mesh.faces, ref.faces)
        for a, b in zip(mesh.attributes, ref.attributes):
            np.testing.assert_array_equal(a.values, b.values)


def test_native_encode_orchestrator_byte_parity(liam_output, monkeypatch):
    """draco_frame_enc.cpp whole-frame encode vs the staged Python
    pipeline: byte-identical on real corpus frames and on a synthetic
    boundary/seam mesh, both valence and standard traversals."""
    from uvol_tpu.codecs.draco import constants as K
    from uvol_tpu.codecs.draco.decoder import decode_drc
    from uvol_tpu.codecs.draco.encoder import AttributeToEncode, encode_drc
    from uvol_tpu import native

    if native.get_draco_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    def both(faces, atts, **kw):
        fast = encode_drc(faces, atts, **kw)
        monkeypatch.setenv("UVT_DISABLE_NATIVE_FRAME", "1")
        ref = encode_drc(faces, atts, **kw)
        monkeypatch.delenv("UVT_DISABLE_NATIVE_FRAME")
        return fast, ref

    # real corpus frames (holes + splits + seams at scale)
    for idx in ("00000", "00137"):
        data = (liam_output / "geometry_draco" / f"{idx}.drc").read_bytes()
        m = decode_drc(data)
        pos_a = m.attribute_by_type(K.ATT_POSITION)
        uv_a = m.attribute_by_type(K.ATT_TEX_COORD)
        nrm_a = m.attribute_by_type(K.ATT_NORMAL)
        gen_a = m.attribute_by_type(K.ATT_GENERIC)
        atts = [
            AttributeToEncode(
                K.ATT_POSITION, pos_a.values, pos_a.corner_to_value, 11
            ),
            AttributeToEncode(
                K.ATT_TEX_COORD, uv_a.values, uv_a.corner_to_value, 10
            ),
            AttributeToEncode(
                K.ATT_NORMAL, nrm_a.values, nrm_a.corner_to_value, 8
            ),
            AttributeToEncode(
                K.ATT_GENERIC, gen_a.values, gen_a.corner_to_value,
                integer=True,
            ),
        ]
        fast, ref = both(pos_a.corner_to_value.reshape(-1, 3), atts)
        assert fast == ref

    # small open grid (boundary hole path) + standard traversal
    nx, ny = 7, 6
    idx2 = lambda i, j: i * ny + j
    pos = np.array(
        [[i, j, (i * 3 + j) % 5 * 0.25] for i in range(nx) for j in range(ny)],
        np.float32,
    )
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = idx2(i, j), idx2(i + 1, j), idx2(i + 1, j + 1), idx2(i, j + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    faces = np.array(faces, np.int32)
    r = np.random.default_rng(5)
    uv = (np.round(r.uniform(0, 1, (len(pos), 2)) * 32) / 32).astype(np.float32)
    atts = [
        AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), 12),
        AttributeToEncode(K.ATT_TEX_COORD, uv, faces.reshape(-1), 10),
    ]
    for enc in ("valence", "standard"):
        fast, ref = both(
            faces,
            [
                AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), 12),
                AttributeToEncode(K.ATT_TEX_COORD, uv, faces.reshape(-1), 10),
            ],
            traversal_encoding=enc,
        )
        assert fast == ref, enc


def test_geometric_predictor_qbits_paths_vs_python_oracle():
    """The UV/normal encode predictors have an int64 fast path
    (qp/qt <= 13-bit content) and an i128 reference path. Pin BOTH
    against the pure-Python encoder (UVT_DISABLE_NATIVE_DRACO=1
    subprocess): byte-identical bitstreams at qp=11/qt=10 (fast path)
    and qp=16/qt=15 (i128 path, amax/umax >= 16384)."""
    import os
    import subprocess
    import sys

    from uvol_tpu import native
    from uvol_tpu.codecs.draco import constants as K
    from uvol_tpu.codecs.draco.encoder import AttributeToEncode, encode_drc

    if native.get_draco_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    nx, ny = 6, 5
    idx2 = lambda i, j: i * ny + j
    pos = np.array(
        [[i, j, (i * 2 + j) % 4 * 0.4] for i in range(nx) for j in range(ny)],
        np.float32,
    )
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b, c, d = (idx2(i, j), idx2(i + 1, j),
                          idx2(i + 1, j + 1), idx2(i, j + 1))
            faces.append([a, b, c])
            faces.append([a, c, d])
    faces = np.array(faces, np.int32)
    r = np.random.default_rng(11)
    uv = (np.round(r.uniform(0, 1, (len(pos), 2)) * 64) / 64).astype(np.float32)
    nrm = r.normal(size=(len(pos), 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(np.float32)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for qp, qt, qn in ((11, 10, 8), (16, 15, 12)):
        atts = [
            AttributeToEncode(K.ATT_POSITION, pos, faces.reshape(-1), qp),
            AttributeToEncode(K.ATT_TEX_COORD, uv, faces.reshape(-1), qt),
            AttributeToEncode(K.ATT_NORMAL, nrm, faces.reshape(-1), qn),
        ]
        fast = encode_drc(faces, atts)

        # pure-Python oracle in a subprocess (the native lib handle is
        # cached per-process, so the env var must be set before import)
        code = (
            "import sys, numpy as np; sys.path.insert(0, sys.argv[1])\n"
            "from uvol_tpu.codecs.draco import constants as K\n"
            "from uvol_tpu.codecs.draco.encoder import AttributeToEncode, "
            "encode_drc\n"
            "pos = np.load(sys.argv[2] + '/pos.npy'); "
            "uv = np.load(sys.argv[2] + '/uv.npy'); "
            "nrm = np.load(sys.argv[2] + '/nrm.npy'); "
            "faces = np.load(sys.argv[2] + '/faces.npy')\n"
            "qp, qt, qn = map(int, sys.argv[3].split(','))\n"
            "atts = [AttributeToEncode(K.ATT_POSITION, pos, "
            "faces.reshape(-1), qp), AttributeToEncode(K.ATT_TEX_COORD, uv, "
            "faces.reshape(-1), qt), AttributeToEncode(K.ATT_NORMAL, nrm, "
            "faces.reshape(-1), qn)]\n"
            "sys.stdout.buffer.write(encode_drc(faces, atts))\n"
        )
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            np.save(td + "/pos.npy", pos)
            np.save(td + "/uv.npy", uv)
            np.save(td + "/nrm.npy", nrm)
            np.save(td + "/faces.npy", faces)
            env = dict(os.environ)
            env["UVT_DISABLE_NATIVE_DRACO"] = "1"
            env["UVT_DISABLE_NATIVE_FRAME"] = "1"
            proc = subprocess.run(
                [sys.executable, "-c", code, repo, td, f"{qp},{qt},{qn}"],
                env=env, capture_output=True, timeout=300,
            )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        assert fast == proc.stdout, (qp, qt, qn)
