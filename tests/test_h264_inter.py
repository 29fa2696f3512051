"""Motion-compensated P slices (round 4): conformance both directions.

  - encoder side: streams with real inter macroblocks (P_L0_16x16 +
    mvd + P_Skip with the derived skip vector) reconstruct BIT-EXACTLY
    identically in libavcodec and in our decoder;
  - decoder side: inter streams produced by libx264 (gop P chains,
    16x16 partitions, full-pel AND quarter-pel MVs) reconstruct
    bit-exactly as libavcodec reconstructs them — exercising the 6-tap
    half-pel / bilinear chroma interpolation paths on foreign data.
"""

import numpy as np
import pytest

from uvol_tpu.codecs import h264 as H

try:
    from uvol_tpu.native.h264ref import (
        decode_annexb_ref,
        encode_x264_gop_ref,
        get_h264ref_lib,
    )

    _HAS_REF = get_h264ref_lib() is not None
except Exception:  # pragma: no cover
    _HAS_REF = False


def _moving_frames(n=4, h=80, w=112, seed=0):
    r = np.random.default_rng(seed)
    base = (np.indices((h + 32, w + 32)).sum(0) * 5 % 256).astype(np.uint8)
    smooth = np.clip(
        np.cumsum(np.cumsum(r.normal(0, 3, (h + 32, w + 32)), 0), 1) / 4
        + 128,
        0,
        255,
    ).astype(np.uint8)
    tex = np.stack(
        [base // 2 + smooth // 2, np.roll(smooth, 13, 1),
         np.roll(base, 29, 0)],
        -1,
    )
    return np.ascontiguousarray(
        np.stack(
            [
                np.roll(np.roll(tex, 3 * k, axis=1), -2 * k, axis=0)
                for k in range(n)
            ]
        )[:, :h, :w]
    )


def test_motion_roundtrip_self():
    frames = _moving_frames()
    s = H.encode_annexb(frames, qp=18, gop=len(frames), motion=True)
    dec = H.decode_annexb(s)
    mse = ((dec.astype(np.float64) - frames) ** 2).mean()
    # the sawtooth texture aliases hard under 4:2:0 chroma subsampling:
    # measure against that baseline, not against an absolute bar
    base = np.stack(
        [H.yuv420_to_rgb(*H.rgb_to_yuv420(f)) for f in frames]
    )
    mse0 = ((base.astype(np.float64) - frames) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    psnr0 = 10 * np.log10(255**2 / mse0)
    assert psnr > psnr0 - 3.0, (psnr, psnr0)
    # motion must beat the zero-motion profile on translating content
    import uvol_tpu.codecs.h264 as HH

    orig = HH.encode_p_planes

    def zero_motion(*a, **kw):
        kw["motion"] = False
        return orig(*a, **kw)

    HH.encode_p_planes = zero_motion
    try:
        s0 = H.encode_annexb(frames, qp=18, gop=len(frames), motion=True)
    finally:
        HH.encode_p_planes = orig
    assert len(s) < 0.8 * len(s0), (len(s), len(s0))


def test_pcm_strip_survives_motion():
    # the I_PCM guarantee is exactness of the CODED (YUV) samples —
    # compare planes, not the chroma-subsampled RGB roundtrip
    frames = _moving_frames(n=3, h=96, w=96)
    s = H.encode_annexb(frames, qp=30, gop=3, pcm_rows=8, motion=True)
    oy, ocb, ocr, _ = H.decode_annexb_planes(s)
    for i, f in enumerate(frames):
        yy, ycb, ycr = H.rgb_to_yuv420(f)
        np.testing.assert_array_equal(oy[i][-16:], yy[-16:])
        np.testing.assert_array_equal(ocb[i][-8:], ycb[-8:])
        np.testing.assert_array_equal(ocr[i][-8:], ycr[-8:])


@pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim unavailable")
@pytest.mark.parametrize("qp", [22, 30])
def test_motion_encoder_conformance_vs_libavcodec(qp):
    frames = _moving_frames()
    s = H.encode_annexb(frames, qp=qp, gop=len(frames), motion=True)
    ref = decode_annexb_ref(s)
    assert ref is not None
    oy, ocb, ocr, _ = H.decode_annexb_planes(s)
    for ours, theirs in zip((oy, ocb, ocr), ref):
        np.testing.assert_array_equal(ours, theirs)


@pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim unavailable")
@pytest.mark.parametrize("subme", [0, 2])
def test_motion_decoder_conformance_on_x264_streams(subme):
    frames = _moving_frames(n=5)
    y = np.stack([H.rgb_to_yuv420(f)[0] for f in frames])
    cb = np.stack([H.rgb_to_yuv420(f)[1] for f in frames])
    cr = np.stack([H.rgb_to_yuv420(f)[2] for f in frames])
    s = encode_x264_gop_ref(y, cb, cr, qp=26, gop=5, subme=subme)
    if s is None:
        pytest.skip("libx264 not built into this libavcodec")
    ref = decode_annexb_ref(s)
    oy, ocb, ocr, _ = H.decode_annexb_planes(s)
    for ours, theirs in zip((oy, ocb, ocr), ref):
        np.testing.assert_array_equal(ours, theirs)


def test_inter_refuses_p8x8():
    # craft a P slice advertising a P_8x8 macroblock: decoder must
    # refuse with a clear error, not misparse
    frames = _moving_frames(n=2)
    s = H.encode_annexb(frames, qp=26, gop=2, motion=True)
    units = H.split_nals(s)
    # decode normally first (sanity)
    H.decode_annexb(s)
    # P_8x8 refusal is covered by the unit below via a synthetic reader
    from uvol_tpu.codecs.h264_intra import SliceCoder

    sc = SliceCoder(32, 32, 26)
    w = H.BitWriter()
    w.ue(3)  # P_8x8
    w.rbsp_trailing()
    r = H.BitReader(w.getvalue())
    prev = (
        np.zeros((32, 32), np.uint8),
        np.zeros((16, 16), np.uint8),
        np.zeros((16, 16), np.uint8),
    )
    with pytest.raises(NotImplementedError):
        sc.decode_mb_p(r, 0, 0, prev=prev)


def test_mc_luma_matches_fullpel_copy():
    from uvol_tpu.codecs.h264_intra import _mc_luma

    r = np.random.default_rng(3)
    ref = r.integers(0, 256, (64, 64)).astype(np.uint8)
    # full-pel MV = plain shifted copy with edge clamp
    out = _mc_luma(ref, 16, 16, 16, 16, 4 * 5, 4 * -3)
    np.testing.assert_array_equal(out, ref[13:29, 21:37])
    # half-pel positions stay in range and are deterministic
    out2 = _mc_luma(ref, 16, 16, 16, 16, 2, 2)
    assert out2.shape == (16, 16)


@pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim unavailable")
def test_two_partition_decode_conformance_vs_libavcodec():
    """P_L0_L0_16x8 / P_L0_L0_8x16 conformance (r4 advisor, low): x264
    with partitions=none never emits two-partition MBs, so the
    directional MV prediction rules of 8.4.1.3 (16x8: top->B/bottom->A;
    8x16: left->A/right->C) had no oracle coverage. Hand-pack a P slice
    mixing 16x16 / 16x8 / 8x16 macroblocks with varied mvds and verify
    our reconstruction is bit-exact vs libavcodec's."""
    h, w = 64, 96
    qp = 24
    frames = _moving_frames(n=1, h=h, w=w, seed=5)
    y0, cb0, cr0 = H.rgb_to_yuv420(frames[0])
    idr = H.encode_idr_planes(y0, cb0, cr0, qp=qp)

    bw = H.BitWriter()
    bw.ue(0)            # first_mb_in_slice
    bw.ue(5)            # slice_type: P (all slices)
    bw.ue(0)            # pic_parameter_set_id
    bw.u(1, 4)          # frame_num
    bw.u(0, 1)          # num_ref_idx_active_override
    bw.u(0, 1)          # ref_pic_list_modification_flag_l0
    bw.u(0, 1)          # adaptive_ref_pic_marking
    bw.se(qp - 26)
    bw.ue(1)            # deblocking off
    # mvd schedule: varied, small (prediction keeps absolute MVs tame),
    # quarter-pel (exercises the 6-tap/bilinear paths per partition)
    k = 0
    for mby in range(h // 16):
        for mbx in range(w // 16):
            bw.ue(0)    # mb_skip_run
            kind = k % 3
            k += 1
            if kind == 0:
                bw.ue(0)                    # P_L0_16x16
                bw.se((k * 5) % 7 - 3)      # mvd_x
                bw.se((k * 3) % 7 - 3)      # mvd_y
            else:
                bw.ue(kind)                 # 1 = 16x8, 2 = 8x16
                for part in range(2):
                    bw.se((k * 5 + part * 2) % 7 - 3)
                    bw.se((k * 3 + part * 4) % 7 - 3)
            bw.ue(0)    # coded_block_pattern: 0 (inter code 0)
    bw.rbsp_trailing()
    stream = (
        H.nal(7, H.make_sps(w, h)) + H.nal(8, H.make_pps())
        + idr + H.nal(1, bw.getvalue())
    )
    ref = decode_annexb_ref(stream)
    assert ref is not None and ref[0].shape[0] == 2
    oy, ocb, ocr, _ = H.decode_annexb_planes(stream)
    for ours, theirs in zip((oy, ocb, ocr), ref):
        np.testing.assert_array_equal(ours, theirs)


def _decode_forced_python(stream):
    """Decode with the native slice codec disabled (Python oracle)."""
    from uvol_tpu.native import h264c

    saved = h264c._lib
    h264c._lib = None
    saved_env = None
    import os

    saved_env = os.environ.get("UVT_DISABLE_NATIVE_H264")
    os.environ["UVT_DISABLE_NATIVE_H264"] = "1"
    try:
        return H.decode_annexb_planes(stream)
    finally:
        h264c._lib = saved
        if saved_env is None:
            os.environ.pop("UVT_DISABLE_NATIVE_H264", None)
        else:
            os.environ["UVT_DISABLE_NATIVE_H264"] = saved_env


def test_native_motion_decode_parity_vs_python():
    """Round 5: the native decoder now covers motion P slices (inter MB
    types 0-2, qpel MC, derived skip MV). Lock it bit-identical to the
    Python SliceCoder oracle on our own motion streams AND on foreign
    quarter-pel x264 streams (when the shim exists)."""
    from uvol_tpu.native.h264c import get_h264_lib

    if get_h264_lib() is None:
        pytest.skip("native h264 codec unavailable")
    frames = _moving_frames(n=4)
    streams = [H.encode_annexb(frames, qp=24, gop=4, motion=True)]
    if _HAS_REF:
        y = np.stack([H.rgb_to_yuv420(f)[0] for f in frames])
        cb = np.stack([H.rgb_to_yuv420(f)[1] for f in frames])
        cr = np.stack([H.rgb_to_yuv420(f)[2] for f in frames])
        s = encode_x264_gop_ref(y, cb, cr, qp=26, gop=4, subme=2)
        if s is not None:
            streams.append(s)
    for s in streams:
        native = H.decode_annexb_planes(s)
        python = _decode_forced_python(s)
        for a, b in zip(native[:3], python[:3]):
            np.testing.assert_array_equal(a, b)


def test_native_motion_encode_byte_parity_vs_python():
    """Round 5: the native motion P encoder (uvt_h264_encode_slice_motion)
    must emit BYTE-IDENTICAL streams to the Python reference coder
    (search order, RD tie rules, banker's rounding in the MV-prediction
    seed all mirrored)."""
    from uvol_tpu.native import h264c

    if h264c.get_h264_lib() is None:
        pytest.skip("native h264 codec unavailable")
    frames = _moving_frames(n=4, h=80, w=112, seed=9)
    for qp, pcm in ((22, 0), (29, 8)):
        native = H.encode_annexb(frames, qp=qp, gop=4, pcm_rows=pcm,
                                 motion=True)
        saved = h264c.encode_p_slice_motion_native
        h264c.encode_p_slice_motion_native = lambda *a, **k: None
        try:
            python = H.encode_annexb(frames, qp=qp, gop=4, pcm_rows=pcm,
                                     motion=True)
        finally:
            h264c.encode_p_slice_motion_native = saved
        assert native == python
