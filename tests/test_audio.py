"""Audio duration probing (reference Encoder.py:330-348 cross-check)."""

import struct
import wave

import numpy as np

from uvol_tpu.io.audio import audio_duration, mp3_duration, wav_duration


def test_wav_duration(tmp_path):
    path = tmp_path / "t.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(np.zeros(22050 * 2, np.int16).tobytes())  # 2 seconds
    assert abs(wav_duration(str(path)) - 2.0) < 1e-6
    assert abs(audio_duration(str(path)) - 2.0) < 1e-6


def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0):
    """One MPEG1 Layer III frame: 128 kbps, 44100 Hz by default."""
    b1 = 0xFF
    b2 = 0b11111011  # sync cont. | MPEG1 (11) | Layer III (01) | no CRC
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b4 = 0
    header = bytes([b1, b2, b3, b4])
    bitrate = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][
        bitrate_idx
    ] * 1000
    sr = [44100, 48000, 32000][sr_idx]
    frame_len = 1152 // 8 * bitrate // sr + padding
    return header + b"\x00" * (frame_len - 4)


def test_mp3_duration(tmp_path):
    frames_per_second = 44100 / 1152
    n = int(round(2 * frames_per_second))  # ~2 seconds
    data = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"\x00" * 10  # id3v2
    data += b"".join(_mp3_frame() for _ in range(n))
    path = tmp_path / "t.mp3"
    path.write_bytes(data)
    d = mp3_duration(str(path))
    assert abs(d - 2.0) < 0.1, d
