"""H.264/AVC I_PCM codec: bitstream conformance pieces + V1 wiring.

The reference's V1 texture track is H.264 MP4 (deprecated/README.md:63);
codecs/h264.py provides a real (lossless I_PCM) Annex-B + avc1 wire for
it. These tests lock Exp-Golomb, emulation prevention, SPS/PPS parse,
sample roundtrips, and the V1 baked-counter path over avc1.
"""

import numpy as np
import pytest

from uvol_tpu.codecs import h264


def test_exp_golomb_roundtrip():
    w = h264.BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 256, 1000, 65535]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 17, -31, 4096, -4096]
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = h264.BitReader(w.getvalue())
    for v in vals:
        assert r.ue() == v
    for v in svals:
        assert r.se() == v


def test_emulation_prevention():
    cases = [
        b"\x00\x00\x00",  # would alias a start code
        b"\x00\x00\x01\x02\x03",
        b"\x00" * 10,
        bytes(range(256)),
        b"\x00\x00\x03",  # already contains the escape byte value
    ]
    for raw in cases:
        esc = h264._escape(raw)
        # no 00 00 0x sequence with x <= 3 survives in the escaped form
        for i in range(len(esc) - 2):
            assert not (
                esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2
            ), esc
        assert h264._unescape(esc) == raw


def test_sps_parse_roundtrip():
    sps = h264.parse_sps(h264.make_sps(640, 368))
    assert (sps.width, sps.height) == (640, 368)
    assert sps.log2_max_frame_num == 4
    with pytest.raises(ValueError, match="multiple-of-16"):
        h264.make_sps(100, 100)


def test_annexb_roundtrip_gray_exact():
    """Gray frames have constant chroma → the full path is lossless."""
    r = np.random.default_rng(1)
    gray = np.repeat(r.integers(0, 256, (3, 32, 48, 1)), 3, -1).astype(np.uint8)
    stream = h264.encode_annexb(gray)
    # stream structure: SPS, PPS, 3 IDR NALs
    nals = h264.split_nals(stream)
    assert [u[0] & 0x1F for u in nals] == [7, 8, 5, 5, 5]
    out = h264.decode_annexb(stream)
    np.testing.assert_array_equal(out, gray)


def test_annexb_color_quality():
    """Color content: only 4:2:0 chroma subsampling loss (luma exact)."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1)
    frames = np.stack([img, np.roll(img, 8, 1)]).astype(np.uint8)
    out = h264.decode_annexb(h264.encode_annexb(frames))
    mse = ((out.astype(float) - frames.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30, mse
    # luma is carried losslessly
    y_in = h264.rgb_to_yuv420(frames[0])[0]
    y_out = h264.rgb_to_yuv420(out[0])[0]
    assert np.abs(y_in.astype(int) - y_out.astype(int)).max() <= 1


def test_mp4_avc1_track_roundtrip():
    from uvol_tpu.containers.mp4 import read_mp4_video, write_mp4_video

    r = np.random.default_rng(2)
    frames = np.repeat(r.integers(0, 256, (4, 32, 32, 1)), 3, -1).astype(np.uint8)
    blob = write_mp4_video(
        h264.encode_avc_samples(frames),
        width=32,
        height=32,
        fps=30,
        codec=b"avc1",
        avcc=h264.make_avcc(32, 32),
    )
    track = read_mp4_video(blob)
    assert track.codec == "avc1" and track.avcc
    sps = h264.parse_avcc(track.avcc)
    out = np.stack(
        [h264.decode_avc_sample(s, sps) for s in track.samples]
    )
    np.testing.assert_array_equal(out, frames)


def test_v1_texture_video_h264_counter():
    """The V1 baked frame counter survives the avc1 path bit-exactly
    (counter strip is black/white → luma-only; I_PCM luma is lossless)."""
    from uvol_tpu.io.video import Mp4VideoTexture, encode_v1_texture_video

    r = np.random.default_rng(3)
    frames = [
        r.integers(0, 256, (128, 128, 3)).astype(np.uint8) for _ in range(5)
    ]
    blob = encode_v1_texture_video(frames, fps=30, codec="h264")
    vt = Mp4VideoTexture(blob)
    assert vt.track.codec == "avc1"
    for i in range(5):
        vt.current_time = (i + 0.2) / 30.0
        assert vt.read_baked_frame_number() == i


def test_decoder_rejects_residual_streams():
    """Bit flips in the slice-header region either keep decoding or
    raise controlled errors — never crash (the decoder now handles
    I_4x4/I_16x16 residual macroblocks for real)."""
    gray = np.full((1, 16, 16, 3), 128, np.uint8)
    stream = bytearray(h264.encode_annexb(gray))
    # find the IDR NAL payload and corrupt the mb_type bits
    nals = h264.split_nals(bytes(stream))
    idr = nals[-1]
    rbsp = bytearray(h264._unescape(idr[1:]))
    # brute-force: flipping bits in the early header region must either
    # keep decoding, or raise a controlled error (never crash)
    for byte in range(min(4, len(rbsp))):
        for bit in range(8):
            mod = bytearray(rbsp)
            mod[byte] ^= 1 << bit
            blob = (
                b"".join(h264.nal(u[0] & 0x1F, h264._unescape(u[1:]))
                         for u in nals[:-1])
                + h264.nal(5, bytes(mod))
            )
            try:
                h264.decode_annexb(blob)
            except (ValueError, NotImplementedError, IndexError):
                pass


def test_truncated_intra_mb_raises_cleanly():
    """A crafted slice whose first mb_type is I_4x4 but carries none of
    its payload must fail as a clean truncation error (the round-2 form
    of this test asserted I_4x4 was rejected outright; it is now a
    supported mb_type — h264_intra.py)."""
    gray = np.full((1, 16, 16, 3), 128, np.uint8)
    nals = h264.split_nals(h264.encode_annexb(gray))
    sps = h264.parse_sps(h264._unescape(nals[0][1:]))
    # rebuild the slice header, then emit mb_type 0 (I_4x4) instead of 25
    w = h264.BitWriter()
    w.ue(0); w.ue(7); w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1); w.u(0, 1)
    w.se(0)
    w.ue(1)
    w.ue(0)  # mb_type 0: not I_PCM
    w.rbsp_trailing()
    blob = (
        h264.nal(7, h264._unescape(nals[0][1:]))
        + h264.nal(8, h264._unescape(nals[1][1:]))
        + h264.nal(5, w.getvalue())
    )
    with pytest.raises(ValueError, match="truncated|invalid"):
        h264.decode_annexb(blob)


def test_cropped_sps_decodes_full_mb_grid():
    """Cropping variant (review r2): the MB grid spans the CODED dims;
    output is cropped — a 1088-coded/1080-display stream must not desync."""
    sps_cropped = h264.Sps(
        width=32, height=22, log2_max_frame_num=4,
        coded_width=32, coded_height=32,
    )
    # encode a 32x32 frame, decode through the cropped SPS view
    gray = np.repeat(
        np.random.default_rng(5).integers(0, 256, (32, 32, 1)), 3, -1
    ).astype(np.uint8)
    unit = h264.encode_idr_frame(gray)[4:]
    out = h264._decode_slice(h264._unescape(unit[1:]), sps_cropped)
    assert out.shape == (22, 32, 3)
    np.testing.assert_array_equal(out, h264.decode_annexb(
        h264.encode_annexb(gray[None]))[0][:22])
