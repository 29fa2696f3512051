"""V1 MP4 video-texture path: ISO-BMFF container + MJPEG + baked counter."""

import numpy as np
import pytest

from uvol_tpu.containers.mp4 import read_mp4_video, write_mp4_video
from uvol_tpu.io.video import Mp4VideoTexture, encode_v1_texture_video


def _frames(n=12, size=64):
    r = np.random.default_rng(3)
    base = r.integers(0, 255, (size, size, 3), np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, :, 0] = (f[:, :, 0].astype(int) + i * 9) % 256
        out.append(f)
    return out


def test_mp4_container_roundtrip():
    samples = [bytes([i]) * (100 + 7 * i) for i in range(9)]
    blob = write_mp4_video(samples, width=320, height=240, fps=25)
    t = read_mp4_video(blob)
    assert t.codec == "jpeg"
    assert (t.width, t.height) == (320, 240)
    assert abs(t.fps - 25) < 1e-6
    assert t.samples == samples
    assert t.num_frames == 9
    assert abs(t.duration - 9 / 25) < 1e-3
    # frame_at boundaries
    assert t.frame_at(0.0) == 0
    assert t.frame_at(1 / 25 + 1e-4) == 1
    assert t.frame_at(100.0) == 8


def test_counter_survives_jpeg():
    frames = _frames(n=10, size=128)
    mp4 = encode_v1_texture_video(frames, fps=30)
    video = Mp4VideoTexture(mp4)
    assert video.track.num_frames == 10
    for i in [0, 3, 9]:
        video.current_time = (i + 0.2) / 30
        assert video.read_baked_frame_number() == i
    # pixels survive JPEG outside the counter strip (smooth content)
    yy, xx = np.mgrid[0:128, 0:128]
    smooth = np.stack([xx * 2, yy * 2, (xx + yy)], -1).astype(np.uint8)
    mp4s = encode_v1_texture_video([smooth] * 2, fps=30)
    got = Mp4VideoTexture(mp4s).frame_rgb(0)[:100]
    assert np.abs(got.astype(int) - smooth[:100].astype(int)).mean() < 4


def test_counter_capacity_guard():
    with pytest.raises(ValueError):
        encode_v1_texture_video(_frames(n=3), encoder_byte_length=1)


def test_v1_player_synced_by_video_counter():
    """Full V1 tick loop where the baked counter (not the clock) drives
    mesh sync — the reference's no-requestVideoFrameCallback path
    (src/V1/player.ts:305-334)."""
    from uvol_tpu.containers.drcs import DrcsWriter
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.v1 import V1Player

    n = 24
    mp4 = encode_v1_texture_video(_frames(n=n, size=128), fps=30)
    video = Mp4VideoTexture(mp4)

    w = DrcsWriter(frame_rate=30)
    for i in range(n):
        w.add_frame(str(i).encode().ljust(6, b"_"), vertices=10, faces=5)
    blob = w.getvalue()

    vc = VirtualClock()
    p = V1Player(
        range_fetcher=lambda url, s, e: blob[s:e],
        geometry_decoder=lambda b: int(b.rstrip(b"_")),
        clock=PlaybackClock(now=vc),
        target_frames_to_request=8,
        video=video,
    )
    p.play_track(w.manifest, 8, "/x/track.manifest")
    shown = []
    for _ in range(n * 2 + 10):
        r = p.update(video.current_frame_rgb())
        if r.status == "ok":
            assert r.geometry == r.frame  # mesh matches the video counter
            shown.append(r.frame)
        if r.status == "ended":
            break
        video.advance(1 / 30)
        vc.advance(1 / 30)
    assert r.status == "ended"
    assert len(shown) >= n - 2  # all frames (minus initial buffering skips)


def test_facade_v1_with_mp4_texture():
    """Facade drives a V1 track with a real .mp4 texture: derives the video
    URL from the manifest path (player.ts:192), syncs frames by the baked
    counter, plays to completion."""
    import json

    from uvol_tpu.containers.drcs import DrcsWriter
    from uvol_tpu.player.clock import VirtualClock
    from uvol_tpu.player.facade import Player
    from uvol_tpu.player import clock as clock_mod

    n = 18
    w = DrcsWriter(frame_rate=30)
    for i in range(n):
        w.add_frame(str(i).encode().ljust(6, b"_"), vertices=10, faces=5)
    mp4 = encode_v1_texture_video(_frames(n=n, size=128), fps=30)

    files = {
        "/t/track.manifest": json.dumps(w.manifest.to_json()).encode(),
        "/t/track.drcs": w.getvalue(),
        "/t/track.mp4": mp4,
    }
    vc = VirtualClock()
    p = Player(paths=["/t/track.manifest"], fetcher=lambda u: files[u])
    # headless: virtual-clock the v1 player
    from uvol_tpu.player.clock import PlaybackClock

    p._v1_player_kwargs = {
        "clock": PlaybackClock(now=vc),
        "geometry_decoder": lambda b: int(b.rstrip(b"_")),
    }
    p.set_track_path()
    assert not p.is_v2
    assert p.v1_instance.video is not None  # .mp4 found + parsed
    ended = []
    p._user_on_track_end = lambda: ended.append(1)
    shown = []
    for _ in range(n * 2 + 12):
        r = p.update()
        if r is None or ended:
            break
        if r.status == "ok":
            assert r.geometry == r.frame  # counter-synced
            shown.append(r.frame)
        vc.advance(1 / 30)
    assert ended and len(shown) >= n - 2


def test_mp4_reader_multi_chunk():
    """The reader must walk stsc runs over multiple chunks (externally
    produced MP4s split samples across chunks; our writer uses one)."""
    import struct

    from uvol_tpu.containers import mp4 as M

    samples = [bytes([i]) * (20 + i) for i in range(5)]
    # chunks: [s0, s1], [s2, s3], [s4] -> stsc runs (1,2),(3,1)... ISO rules:
    # run1: first_chunk 1, 2 samples; run2: first_chunk 3, 1 sample
    chunk_data = [b"".join(samples[0:2]), b"".join(samples[2:4]), samples[4]]
    ftyp = M._box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat = M._box(b"mdat", b"".join(chunk_data))
    offs = []
    pos = len(ftyp) + 8
    for c in chunk_data:
        offs.append(pos)
        pos += len(c)
    ts = 90000
    stsd = M._full_box(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + M._box(
            b"jpeg",
            b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
            + struct.pack(">HH", 64, 48) + b"\x00" * 50,
        ),
    )
    stts = M._full_box(b"stts", 0, 0, struct.pack(">III", 1, 5, 3000))
    stsc = M._full_box(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 3, 1, 1),
    )
    stsz = M._full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 5)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = M._full_box(
        b"stco", 0, 0,
        struct.pack(">I", 3) + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = M._box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = M._box(b"minf", M._full_box(b"vmhd", 0, 1, b"\x00" * 8) + stbl)
    hdlr = M._full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdhd = M._full_box(
        b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, ts, 15000) + b"\x00" * 4
    )
    mdia = M._box(b"mdia", mdhd + hdlr + minf)
    trak = M._box(b"trak", M._full_box(b"tkhd", 0, 7, b"\x00" * 80) + mdia)
    moov = M._box(b"moov", trak)
    t = M.read_mp4_video(ftyp + mdat + moov)
    assert t.samples == samples
    assert abs(t.fps - 30.0) < 1e-6


def test_v2_audio_clock_priority():
    """An audio object's currentTime drives V2 playback (the reference
    prefers audio.currentTime over the wall clock, src/V2/player.ts:411)."""
    import json

    from uvol_tpu.interfaces import parse_manifest
    from uvol_tpu.player.clock import PlaybackClock, VirtualClock
    from uvol_tpu.player.v2 import V2Player
    from tests.test_player import _make_v2_player, _manifest_dict

    class Audio:
        current_time = 0.0
        ended = False
        paused = False
        played = []

        def play(self):
            Audio.played.append(1)

    vc = VirtualClock()  # wall clock frozen: only audio advances
    log = []
    p = _make_v2_player(vc, log)
    audio = Audio()
    p.audio = audio
    m = parse_manifest(_manifest_dict())
    p.play_track(m, "/data/liam.uvol.json")
    assert Audio.played  # play_track starts the audio element
    r0 = p.update()
    audio.current_time = 1.0  # jump one second by AUDIO time only
    r1 = p.update()
    assert r1.geometry_frame is not None and r1.geometry_frame >= 29


def test_counter_strip_fast_path_matches_full_frame_readback():
    """Round 5: avc1 counter readback converts only the counter strip
    (player.ts:305-334 reads a byteLength×1 downsample, not the frame).
    The strip is 2×2-chroma-aligned, so it must be value-exact vs the
    full-frame RGB path — including on P samples mid-gop and on repeated
    reads of the same playing frame (recon-chain early-out)."""
    frames = _frames(n=8, size=128)
    mp4 = encode_v1_texture_video(frames, fps=30, codec="h264", qp=26, gop=8)
    fast = Mp4VideoTexture(mp4)
    slow = Mp4VideoTexture(mp4)
    from uvol_tpu.player.v1 import decode_baked_frame_number

    for i in [0, 1, 4, 4, 7, 7]:
        fast.current_time = slow.current_time = (i + 0.2) / 30
        got = fast.read_baked_frame_number()
        want = decode_baked_frame_number(slow.current_frame_rgb())
        assert got == want == i
