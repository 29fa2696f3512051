"""H.264 intra-compression conformance tests (VERDICT r2 item 5).

Two-sided oracle against the system libavcodec (native/h264ref.py):
  encoder side — streams our I_4x4 encoder writes must reconstruct
  BIT-EXACTLY identically in libavcodec and in our decoder;
  decoder side — all-intra CAVLC baseline streams produced by libx264
  (I_16x16 + all 9 I4x4 modes + chroma plane + qp deltas) must
  reconstruct bit-exactly as libavcodec reconstructs them.
Both skip gracefully when the shim is unavailable; the pure self checks
(roundtrip, counter strip, rate target) always run.
"""

import numpy as np
import pytest

from uvol_tpu.codecs import h264 as H
from uvol_tpu.codecs.h264 import BitReader, BitWriter
from uvol_tpu.codecs.h264_intra import (
    read_residual_block,
    write_residual_block,
)
from uvol_tpu.native.h264ref import (
    decode_annexb_ref,
    encode_x264_ref,
    get_h264ref_lib,
)

_HAS_REF = get_h264ref_lib() is not None


def _content(seed=0, h=64, w=48, f=2):
    r = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (xx * 3 + yy * 2) % 256
    frames = [np.stack([base, 255 - base, (base * 2) % 256], -1)]
    for _ in range(f - 1):
        frames.append(r.integers(0, 256, (h, w, 3)))
    return np.stack(frames).astype(np.uint8)


def test_cavlc_residual_roundtrip_fuzz():
    r = np.random.default_rng(1)
    for _ in range(800):
        max_coeff = int(r.choice([4, 15, 16]))
        nc = -1 if max_coeff == 4 else int(r.choice([0, 1, 2, 3, 4, 7, 8, 16]))
        mag = int(r.choice([2, 30, 2200, 100000]))
        coeffs = np.where(
            r.uniform(0, 1, max_coeff) < r.uniform(0, 1),
            r.integers(-mag, mag + 1, max_coeff),
            0,
        ).astype(np.int64)
        w = BitWriter()
        tc_w = write_residual_block(w, coeffs, nc)
        w.u(1, 1)
        w.align()
        out, tc_r = read_residual_block(BitReader(w.getvalue()), nc, max_coeff)
        assert np.array_equal(out, coeffs) and tc_w == tc_r


@pytest.mark.parametrize("qp", [20, 28, 36, 44])
def test_intra_selfroundtrip_and_rate(qp):
    frames = _content()
    stream = H.encode_annexb(frames, qp=qp)
    pcm = H.encode_annexb(frames)  # all-I_PCM
    assert len(stream) < len(pcm) / 2
    y, cb, cr, sps = H.decode_annexb_planes(stream)
    ey = np.stack([H.rgb_to_yuv420(fr)[0] for fr in frames])
    mse = ((y.astype(float) - ey) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 40 - qp / 2  # sanity quality curve


@pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim unavailable")
@pytest.mark.parametrize("qp", [20, 28, 36])
def test_encoder_conformance_vs_libavcodec(qp):
    """Our streams decode bit-exactly the same in a real decoder."""
    frames = _content(seed=qp)
    stream = H.encode_annexb(frames, qp=qp)
    y, cb, cr, _ = H.decode_annexb_planes(stream)
    ry, rcb, rcr = decode_annexb_ref(stream)
    assert np.array_equal(y, ry)
    assert np.array_equal(cb, rcb)
    assert np.array_equal(cr, rcr)


@pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim unavailable")
def test_pcm_strip_conformance_and_exactness():
    frames = _content(seed=9)
    frames[:, -8:] = 0
    frames[0, -8:, :24] = 255  # counter-ish strip
    stream = H.encode_annexb(frames, qp=32, pcm_rows=8)
    y, cb, cr, _ = H.decode_annexb_planes(stream)
    ry, rcb, rcr = decode_annexb_ref(stream)
    assert np.array_equal(y, ry) and np.array_equal(cb, rcb)
    ey0 = H.rgb_to_yuv420(frames[0])[0]
    assert np.array_equal(y[0][-8:], ey0[-8:])  # strip lossless
    rgb = H.decode_annexb(stream)
    assert np.array_equal(rgb[0][-8:], frames[0][-8:])


@pytest.mark.skipif(not _HAS_REF, reason="libavcodec shim unavailable")
@pytest.mark.parametrize("qp", [18, 26, 34])
def test_decoder_conformance_on_x264_streams(qp):
    """Foreign conformant streams (libx264, all-intra CAVLC baseline,
    deblocking off) reconstruct bit-exactly as libavcodec reconstructs
    them — covers I_16x16 (incl. plane + luma DC Hadamard), every I4x4
    mode, chroma plane prediction and mb_qp_delta."""
    r = np.random.default_rng(7)
    h, w = 64, 80
    y = np.zeros((2, h, w), np.uint8)
    y[0, :32] = 200
    y[0, 32:] = r.integers(0, 256, (32, w))
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    y[1] = (gx * 7 + gy * 13) % 256
    cb = ((gx[::2, ::2] + 3 * gy[::2, ::2]) % 256).astype(np.uint8)
    cb = np.stack([cb, 255 - cb])
    cr = 255 - cb
    s = encode_x264_ref(y, cb, cr, qp=qp)
    if s is None:
        pytest.skip("libx264 not built into this libavcodec")
    my_y, my_cb, my_cr, _ = H.decode_annexb_planes(s)
    ry, rcb, rcr = decode_annexb_ref(s)
    assert np.array_equal(my_y, ry)
    assert np.array_equal(my_cb, rcb)
    assert np.array_equal(my_cr, rcr)


def test_liam_texture_rate_quality():
    """VERDICT r2 item 5 'Done' bar: <=1.5 bpp at >=35 dB on
    liam-derived textures (256^2 crop of a real decoded segment)."""
    import os

    path = (
        "/root/reference/example/public/liam/output/"
        "texture_ktx2-fps30-1k_baseColor_default/00000.ktx2"
    )
    if not os.path.exists(path):
        pytest.skip("liam corpus absent")
    from uvol_tpu.codecs.basis.transcoder import transcode_ktx2_etc1s
    from uvol_tpu.containers.ktx2 import read_ktx2_file

    rgb = np.asarray(
        transcode_ktx2_etc1s(read_ktx2_file(path), "rgba")
    )[:1, 256:512, 256:512]
    stream = H.encode_annexb(rgb, qp=28)
    bpp = len(stream) * 8 / (256 * 256)
    y, _, _, _ = H.decode_annexb_planes(stream)
    ey = H.rgb_to_yuv420(rgb[0])[0]
    psnr = 10 * np.log10(255**2 / ((y[0].astype(float) - ey) ** 2).mean())
    assert bpp <= 1.5, bpp
    assert psnr >= 35.0, psnr
    if _HAS_REF:
        ry, _, _ = decode_annexb_ref(stream)
        assert np.array_equal(y, ry)


def test_v1_texture_video_compressed_counter():
    """The V1 texture MP4 with the default compressed codec keeps the
    baked counter bit-exact and shrinks vs the all-PCM form."""
    from uvol_tpu.io.video import Mp4VideoTexture, encode_v1_texture_video

    xx, yy = np.meshgrid(np.arange(128), np.arange(128))
    frames = [
        np.stack(
            [(xx * 2 + yy + 17 * i) % 256, (xx + 31 * i) % 256,
             (yy * 3) % 256], -1
        ).astype(np.uint8)
        for i in range(4)
    ]
    blob = encode_v1_texture_video(frames, codec="h264", qp=30)
    blob_pcm = encode_v1_texture_video(frames, codec="h264", qp=None)
    assert len(blob) < len(blob_pcm) / 4  # (real liam textures reach ~12x)
    tex = Mp4VideoTexture(blob)
    for i in range(4):
        tex.current_time = (i + 0.25) / 30.0
        # read-back returns max(stored-1, 0) = the frame index
        assert tex.read_baked_frame_number() == i


def test_intra_decode_fuzz_no_crash():
    frames = _content(seed=13, h=32, w=32)
    blob = bytearray(H.encode_annexb(frames, qp=30))
    r = np.random.default_rng(17)
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(r.integers(1, 4)):
            b[r.integers(10, len(b))] = r.integers(0, 256)
        try:
            H.decode_annexb(bytes(b))
        except (ValueError, NotImplementedError, IndexError, OverflowError):
            pass


def test_native_slice_parity():
    """The C slice codec (native/h264_native.cpp) must be byte-identical
    to the Python SliceCoder on encode and plane-identical on decode."""
    from uvol_tpu.codecs.h264 import BitWriter, Pps, Sps
    from uvol_tpu.codecs.h264_intra import SliceCoder
    from uvol_tpu.native.h264c import (
        decode_slice_native,
        encode_slice_native,
        get_h264_lib,
    )

    if get_h264_lib() is None:
        pytest.skip("native h264 unavailable")
    r = np.random.default_rng(23)
    xx, yy = np.meshgrid(np.arange(96), np.arange(64))
    base = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    for qp in (20, 30, 44):
        ylum = ((base.astype(int) + r.integers(0, 60, base.shape)) % 256
                ).astype(np.uint8)
        cbp = r.integers(0, 256, (32, 48)).astype(np.uint8)
        crp = 255 - cbp
        for pcm_rows in (0, 8):
            bw = BitWriter()
            bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(1)
            bw.u(0, 1); bw.u(0, 1); bw.se(qp - 26); bw.ue(1)
            sc = SliceCoder(96, 64, qp)
            pcm_from = (64 - pcm_rows) // 16 if pcm_rows else -1
            for mby in range(4):
                for mbx in range(6):
                    if pcm_rows and mby >= pcm_from:
                        sc.encode_mb_pcm(bw, mbx, mby, ylum, cbp, crp)
                    else:
                        sc.encode_mb_i4x4(bw, mbx, mby, ylum, cbp, crp)
            bw.rbsp_trailing()
            py_rbsp = bw.getvalue()
            assert encode_slice_native(
                ylum, cbp, crp, qp, pcm_from, 1
            ) == py_rbsp
            ny, ncb, ncr = decode_slice_native(
                py_rbsp, Sps(96, 64, 4, 96, 64), Pps(), True
            )
            assert np.array_equal(ny, sc.y)
            assert np.array_equal(ncb, sc.cb)
            assert np.array_equal(ncr, sc.cr)


def test_native_decodes_x264_streams():
    """Native decode parity also on FOREIGN (libx264) streams incl.
    I_16x16 — compared against the pure-Python decoder path."""
    import os

    from uvol_tpu.native.h264c import get_h264_lib
    from uvol_tpu.native.h264ref import encode_x264_ref

    if get_h264_lib() is None:
        pytest.skip("native h264 unavailable")
    r = np.random.default_rng(29)
    h, w = 48, 64
    y = np.zeros((1, h, w), np.uint8)
    y[0, :16] = 180
    y[0, 16:] = r.integers(0, 256, (32, w))
    cb = np.full((1, h // 2, w // 2), 100, np.uint8)
    cr = 255 - cb
    s = encode_x264_ref(y, cb, cr, qp=24)
    if s is None:
        pytest.skip("libx264 unavailable")
    native = H.decode_annexb_planes(s)
    os.environ["UVT_DISABLE_NATIVE_H264"] = "1"
    try:
        import uvol_tpu.native.h264c as h264c

        saved = h264c._lib
        h264c._lib = None
        python = H.decode_annexb_planes(s)
        h264c._lib = saved
    finally:
        os.environ.pop("UVT_DISABLE_NATIVE_H264", None)
    for a, b in zip(native[:3], python[:3]):
        assert np.array_equal(a, b)


def test_p_frames_conformance_and_counter():
    """Zero-motion P slices (P_Skip + intra refresh): conformant vs
    libavcodec, counter strip bit-exact in every frame, and much smaller
    than all-IDR on near-static content — the inter form the reference's
    V1 texture MP4 actually uses."""
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    base = np.stack(
        [(xx * 3 + yy * 2) % 256, (xx + yy) % 256, (yy * 3) % 256], -1
    ).astype(np.uint8)
    frames = np.stack([base.copy() for _ in range(6)])
    for i in range(6):
        frames[i, 8:16, 4 * i : 4 * i + 8] = 255
        frames[i, -8:] = 0
        frames[i, -8:, : 8 * (i + 1)] = 255
    s = H.encode_annexb(frames, qp=28, pcm_rows=8, gop=6)
    y, cb, cr, _ = H.decode_annexb_planes(s)
    assert y.shape[0] == 6
    for i in range(6):
        ey = H.rgb_to_yuv420(frames[i])[0]
        assert np.array_equal(y[i][-8:], ey[-8:]), i
    if _HAS_REF:
        ry, rcb, rcr = decode_annexb_ref(s)
        assert np.array_equal(y, ry)
        assert np.array_equal(cb, rcb)
        assert np.array_equal(cr, rcr)


def test_p_frames_static_content_rate():
    from uvol_tpu.io.video import Mp4VideoTexture, encode_v1_texture_video

    xx, yy = np.meshgrid(np.arange(128), np.arange(128))
    base = np.stack(
        [(xx * 2 + yy) % 256, xx % 256, (yy * 3) % 256], -1
    ).astype(np.uint8)
    frames = [base.copy() for _ in range(8)]
    for i, fr in enumerate(frames):
        fr[40:48, 40 + 2 * i : 48 + 2 * i] = 200
    blob_idr = encode_v1_texture_video(frames, codec="h264", qp=28)
    blob_gop = encode_v1_texture_video(frames, codec="h264", qp=28, gop=8)
    assert len(blob_gop) < len(blob_idr) / 3
    tex = Mp4VideoTexture(blob_gop)
    for i in range(8):
        tex.current_time = (i + 0.25) / 30.0
        assert tex.read_baked_frame_number() == i
    # backward seek re-decodes from the sync sample
    tex.current_time = 2.25 / 30.0
    assert tex.read_baked_frame_number() == 2


def test_p_slice_without_reference_rejected():
    frames = np.zeros((2, 32, 32, 3), np.uint8)
    s = H.encode_annexb(frames, qp=30, gop=2)
    units = H.split_nals(s)
    # drop the IDR: stream starts with a P slice -> clean error
    blob = b"".join(
        H.nal(u[0] & 0x1F, H._unescape(u[1:]), ref_idc=(u[0] >> 5) & 3)
        for u in units
        if (u[0] & 0x1F) != 5
    )
    with pytest.raises(ValueError, match="reference"):
        H.decode_annexb(blob)
