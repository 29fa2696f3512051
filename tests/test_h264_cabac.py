"""CABAC entropy coding (codecs/h264_cabac.py): conformance both ways.

  - engine: arithmetic encoder/decoder are exact inverses over random
    bin/bypass/terminate sequences;
  - CAVLC parse→emit is a bit-exact identity on our own streams (the
    transcoder's record layer loses nothing);
  - encoder side: CAVLC→CABAC transcoded streams reconstruct
    BIT-EXACTLY identically in libavcodec and in our decoder, with
    identical reconstruction to the CAVLC original (entropy-only
    change), including I_PCM macroblocks (the V1 counter strip) and
    motion P slices;
  - decoder side: Main-profile CABAC streams produced by libx264
    reconstruct bit-exactly as libavcodec reconstructs them — this is
    what pins every context-index rule and the extracted init tables
    (a wrong ctxIdx desynchronizes the arithmetic decoder).

Reference capability: the x264 output class of the V1 texture encoder
(/root/reference/example/texture_encoder.py:53-66), which defaults to
Main-profile CABAC.
"""

import numpy as np
import pytest

from uvol_tpu.codecs import h264 as H
from uvol_tpu.codecs.h264_cabac import (
    CabacReader,
    CabacWriter,
    init_contexts,
    records_to_slice,
    slice_to_records,
    transcode_annexb,
)

try:
    from uvol_tpu.native.h264ref import (
        decode_annexb_ref,
        encode_x264_custom_ref,
        get_h264ref_lib,
    )

    _HAS_REF = get_h264ref_lib() is not None
except Exception:  # pragma: no cover
    _HAS_REF = False

needs_ref = pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim absent")


def _frames(n=3, h=64, w=80, seed=1, smooth=False):
    rng = np.random.default_rng(seed)
    if smooth:
        y = np.full((n, h, w), 128, np.float32)
        y[1 % n, 20:28, 36:44] = rng.integers(0, 256, (8, 8))
        y[2 % n, 40:48, 16:32] = rng.integers(0, 256, (8, 16))
        return np.stack([np.stack([f] * 3, -1) for f in y]).astype(np.uint8)
    base = (np.arange(h)[:, None] * 2 + np.arange(w)[None, :] * 3) % 256
    f = np.stack(
        [(base + 13 * i + rng.integers(0, 40, (h, w))) % 256
         for i in range(n)]
    ).astype(np.float32)
    for i in range(1, n):
        f[i] = 0.8 * f[i - 1] + 0.2 * f[i]
    return np.stack([np.stack([x] * 3, -1) for x in f]).astype(np.uint8)


def test_engine_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        ops = []
        for _ in range(int(rng.integers(1, 1500))):
            k = int(rng.integers(0, 3))
            if k == 0:
                ops.append(("d", int(rng.integers(0, 1024)),
                            int(rng.integers(0, 2))))
            elif k == 1:
                ops.append(("b", None, int(rng.integers(0, 2))))
            else:
                ops.append(("t", None, 0))
        ops.append(("t", None, 1))
        st, mps = init_contexts(26, True)
        bw = H.BitWriter()
        wr = CabacWriter(bw, st, mps)
        for op, ctx, v in ops:
            (wr.decision(ctx, v) if op == "d"
             else wr.bypass(v) if op == "b" else wr.terminate(v))
        bw.align()
        st2, mps2 = init_contexts(26, True)
        rd = CabacReader(bw.getvalue(), 0, st2, mps2)
        for op, ctx, v in ops:
            got = (rd.decision(ctx) if op == "d"
                   else rd.bypass() if op == "b" else rd.terminate())
            assert got == v


@pytest.mark.parametrize(
    "kwargs",
    [dict(qp=24), dict(qp=28, gop=3, pcm_rows=16), dict(qp=None)],
)
def test_cavlc_parse_emit_identity(kwargs):
    stream = H.encode_annexb(_frames(), **kwargs)
    sps = pps = None
    n = 0
    for unit in H.split_nals(stream):
        ntype = unit[0] & 0x1F
        rbsp = H._unescape(unit[1:])
        if ntype == 7:
            sps = H.parse_sps(rbsp)
        elif ntype == 8:
            pps = H.parse_pps(rbsp)
        elif ntype in (1, 5):
            hdr, recs = slice_to_records(
                rbsp, sps, pps, idr=(ntype == 5),
                nal_ref_idc=(unit[0] >> 5) & 3,
            )
            assert records_to_slice(hdr, recs, sps, pps.pic_init_qp,
                                    cabac=False) == rbsp
            n += 1
    assert n == 3


@pytest.mark.parametrize(
    "kwargs,smooth",
    [
        (dict(qp=24), False),
        (dict(qp=28, gop=3, pcm_rows=16), False),  # motion P + PCM strip
        (dict(qp=None), False),                    # all-I_PCM
        (dict(qp=30, gop=3), True),                # skip/absent-heavy
        (dict(qp=38, gop=3), False),
    ],
)
def test_transcode_to_cabac(kwargs, smooth):
    cavlc = H.encode_annexb(_frames(smooth=smooth), **kwargs)
    cabac = transcode_annexb(cavlc, to_cabac=True)
    a = H.decode_annexb_planes(cavlc)
    b = H.decode_annexb_planes(cabac)
    for x, y in zip(a[:3], b[:3]):
        assert np.array_equal(x, y)
    # round-trip back to CAVLC is slice-bit-identical
    slices = lambda s: [u for u in H.split_nals(s) if u[0] & 0x1F in (1, 5)]
    assert slices(transcode_annexb(cabac, to_cabac=False)) == slices(cavlc)
    if _HAS_REF:
        ref = decode_annexb_ref(cabac)
        for x, y in zip(ref, a[:3]):
            assert np.array_equal(x, y)
    if kwargs.get("qp") is not None:
        # entropy win: CABAC strictly smaller on compressed streams
        assert len(cabac) < len(cavlc)


_X264 = ("cabac=1:no-deblock=1:ref=1:threads=1:no-scenecut=1:weightp=0:"
         "no-8x8dct=1:trellis=0:me=dia")


def _x264_planes(frames, qp, gop, extra):
    y = np.stack([H.rgb_to_yuv420(f)[0] for f in frames])
    cb = np.stack([H.rgb_to_yuv420(f)[1] for f in frames])
    cr = np.stack([H.rgb_to_yuv420(f)[2] for f in frames])
    params = f"qp={qp}:keyint={gop}:min-keyint={gop}:" + _X264 + extra
    return encode_x264_custom_ref(y, cb, cr, gop=gop, params=params,
                                  profile="main")


@needs_ref
@pytest.mark.parametrize(
    "qp,gop,extra,smooth",
    [
        (26, 1, ":partitions=none:subme=0", False),   # all-intra
        (32, 5, ":partitions=none:subme=0", False),   # P, full-pel
        (26, 5, ":partitions=none:subme=2", False),   # P, quarter-pel
        (38, 3, ":partitions=none:subme=2", True),    # skip/absent-heavy
        (32, 1, ":partitions=none:subme=0", True),    # I16-heavy intra
    ],
)
def test_decode_x264_cabac(qp, gop, extra, smooth):
    blob = _x264_planes(_frames(5, smooth=smooth), qp, gop, extra)
    if blob is None:
        pytest.skip("libx264 unavailable")
    ref = decode_annexb_ref(blob)
    ours = H.decode_annexb_planes(blob)
    for a, b in zip(ref, ours[:3]):
        assert np.array_equal(a, b)


@needs_ref
def test_x264_weighted_pred_refused():
    frames = _frames(3)
    y = np.stack([H.rgb_to_yuv420(f)[0] for f in frames])
    cb = np.stack([H.rgb_to_yuv420(f)[1] for f in frames])
    cr = np.stack([H.rgb_to_yuv420(f)[2] for f in frames])
    params = ("qp=26:cabac=1:no-deblock=1:ref=1:threads=1:keyint=3:"
              "min-keyint=3:no-scenecut=1:weightp=2:partitions=none:"
              "subme=2:no-8x8dct=1:trellis=0:me=dia")
    blob = encode_x264_custom_ref(y, cb, cr, gop=3, params=params,
                                  profile="main")
    if blob is None:
        pytest.skip("libx264 unavailable")
    try:
        ours = H.decode_annexb_planes(blob)
    except NotImplementedError as e:
        assert "weighted" in str(e)
        return
    # x264's smart weightp may still emit only default weights on this
    # content — then the decode must be conformant
    ref = decode_annexb_ref(blob)
    for a, b in zip(ref, ours[:3]):
        assert np.array_equal(a, b)


def test_encode_annexb_entropy_option():
    frames = _frames(2)
    cavlc = H.encode_annexb(frames, qp=28, gop=2)
    cabac = H.encode_annexb(frames, qp=28, gop=2, entropy="cabac")
    a = H.decode_annexb(cavlc)
    b = H.decode_annexb(cabac)
    assert np.array_equal(a, b)
    assert len(cabac) < len(cavlc)
    # Main profile declared on the CABAC stream
    sps_unit = [u for u in H.split_nals(cabac) if u[0] & 0x1F == 7][0]
    assert H._unescape(sps_unit[1:])[0] == 77
    with pytest.raises(ValueError):
        H.encode_annexb(frames, qp=28, entropy="huffman")
