"""Device-side `.drc` decode stages vs the all-host path (VERDICT item 4).

Real liam frames: the host portable decode must produce the same integer
stages, and the device dequantize / octahedral-normal reconstruction
must match the C float path within f32 tolerance.
"""

import pathlib

import numpy as np
import pytest

LIAM = pathlib.Path(
    "/root/reference/example/public/liam/output/geometry_draco"
)

pytestmark = pytest.mark.skipif(
    not LIAM.exists(), reason="liam corpus not present"
)


def test_portable_decode_matches_integer_stages():
    from uvol_tpu import native

    data = (LIAM / "00000.drc").read_bytes()
    full = native.drc_decode_native(data)
    port = native.drc_decode_native(data, portable=True)
    assert full is not None and port is not None
    assert port[0] == full[0] and port[1] == full[1]
    np.testing.assert_array_equal(port[2], full[2])
    for pa, fa in zip(port[3], full[3]):
        assert pa[0] == fa[0]  # att_type
        np.testing.assert_array_equal(pa[6], fa[6])  # corner maps
        kind = pa[7][0]
        if kind == 0:  # integer attr: identical values
            np.testing.assert_array_equal(pa[5], fa[5])
        elif kind == 1:  # quantized: host dequantize of ints == C floats
            _k, bits, _mq, rng, mins = pa[7]
            delta = rng / ((1 << bits) - 1)
            recon = mins[None, : pa[5].shape[1]] + pa[5].astype(
                np.float64
            ) * delta
            np.testing.assert_allclose(
                recon.astype(np.float32), fa[5], rtol=0, atol=1e-6
            )


def test_decode_drc_batch_device_matches_host():
    from uvol_tpu.codecs.draco import constants as K
    from uvol_tpu.codecs.draco.decoder import decode_drc
    from uvol_tpu.models.drc_device import decode_drc_batch

    blobs = [(LIAM / f"{i:05d}.drc").read_bytes() for i in range(4)]
    batch = decode_drc_batch(blobs, as_numpy=True)
    for i, blob in enumerate(blobs):
        mesh = decode_drc(blob)
        np.testing.assert_array_equal(
            batch.faces[i], mesh.faces.astype(np.int32)
        )
        for att_type in (K.ATT_POSITION, K.ATT_TEX_COORD, K.ATT_NORMAL):
            a = mesh.attribute_by_type(att_type)
            if a is None:
                continue
            n = int(batch.counts[att_type][i])
            assert n == len(a.values)
            got = np.asarray(batch.values[att_type])[i, :n]
            # f32 device math vs the C f64 path: tight but not bit-equal
            np.testing.assert_allclose(
                got, a.values, rtol=2e-5, atol=2e-5
            )
        g = mesh.attribute_by_type(K.ATT_GENERIC)
        if g is not None:
            np.testing.assert_array_equal(
                batch.values[K.ATT_GENERIC][i], g.values
            )


def test_decode_drc_stream_matches_batch(liam_output):
    """Pipelined windows must match decode_drc_batch exactly per slice."""
    import numpy as np

    from uvol_tpu.codecs.draco import constants as KD
    from uvol_tpu.models.drc_device import decode_drc_batch, decode_drc_stream

    blobs = [
        (liam_output / "geometry_draco" / f"{i:05d}.drc").read_bytes()
        for i in range(6)
    ]
    seen = 0
    for start, batch in decode_drc_stream(blobs, window=4, as_numpy=True):
        ref = decode_drc_batch(blobs[start : start + 4], as_numpy=True)
        assert batch.num_points == ref.num_points
        for t, vals in ref.values.items():
            if isinstance(vals, list):
                for a, b in zip(vals, batch.values[t]):
                    np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_array_equal(np.asarray(batch.values[t]), vals)
        for a, b in zip(batch.faces, ref.faces):
            np.testing.assert_array_equal(a, b)
        seen += len(batch.faces)
    assert seen == 6


def test_pack_bits_native_matches_numpy():
    """uvt_pack_bits parity with the numpy _pack_host path: every mode,
    group-aligned and tail lengths, values at the mode's bit edges."""
    from uvol_tpu import native
    from uvol_tpu.models.drc_device import _pack_host, _packed_nbytes

    rng = np.random.default_rng(7)
    for mode, hi in ((8, 1 << 8), (10, 1 << 10), (12, 1 << 12),
                     (16, 1 << 15), (32, 1 << 20)):
        for n in (0, 1, 2, 3, 4, 5, 7, 12, 1000, 1001, 1002, 1003):
            vals = rng.integers(0, hi, n).astype(np.int64)
            if n:
                vals[0] = hi - 1
            ref = _pack_host(vals, mode)  # int64 input: numpy path
            got = native.pack_bits_native(
                vals.astype(np.int32), mode, _packed_nbytes(n, mode)
            )
            if got is None:
                pytest.skip("native draco library unavailable")
            assert got.dtype == np.uint8 and ref.dtype == np.uint8
            np.testing.assert_array_equal(got, ref, err_msg=f"{mode=} {n=}")
    # signed 16/32 (negative deltas ride the sign-extended modes)
    for mode in (16, 32):
        vals = np.asarray([-1, -32768, 32767, 0, -5], np.int64)[
            : 5 if mode == 16 else 5
        ]
        if mode == 32:
            vals = np.asarray([-1, -(2**31), 2**31 - 1, 0, -5], np.int64)
        ref = _pack_host(vals, mode)
        got = native.pack_bits_native(
            vals.astype(np.int32), mode, _packed_nbytes(len(vals), mode)
        )
        if got is not None:
            np.testing.assert_array_equal(got, ref)


def test_16bit_quantization_high_values_survive_upload():
    """Regression (advisor r4, high): a valid stream with
    quantization_bits=16 and quantized values >= 2**15 used to ride the
    int16 wire mode and sign-extend on device (40000 -> -25536),
    silently corrupting dequantized geometry. Non-negative values must
    only pick mode 16 when they fit 15 bits."""
    from uvol_tpu.codecs.draco import constants as K
    from uvol_tpu.codecs.draco.decoder import decode_drc
    from uvol_tpu.codecs.draco.encoder import AttributeToEncode, encode_drc
    from uvol_tpu.models.drc_device import _pick_mode, decode_drc_batch

    assert _pick_mode(16, False) == 32
    assert _pick_mode(15, False) == 16

    # positions spanning [0, 1] at 16 bits quantize up to 65535
    rng = np.random.default_rng(3)
    nx, ny = 12, 12
    pos = np.array(
        [[i / (nx - 1), j / (ny - 1), 0.0] for i in range(nx) for j in range(ny)],
        np.float32,
    )
    pos[:, 2] = rng.random(len(pos), np.float32)
    idx = lambda i, j: i * ny + j
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a, b = idx(i, j), idx(i + 1, j)
            c, d = idx(i + 1, j + 1), idx(i, j + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    faces = np.array(faces, np.int32)
    att = AttributeToEncode(
        K.ATT_POSITION, pos, np.asarray(faces, np.int64).reshape(-1),
        quantization_bits=16,
    )
    blob = encode_drc(faces, [att])
    mesh = decode_drc(blob)
    q = mesh.attribute_by_type(K.ATT_POSITION)
    batch = decode_drc_batch([blob], as_numpy=True)
    n = int(batch.counts[K.ATT_POSITION][0])
    got = np.asarray(batch.values[K.ATT_POSITION])[0, :n]
    np.testing.assert_allclose(got, q.values, rtol=2e-5, atol=2e-5)
