"""Loader for the libavcodec reference-decoder shim (h264ref.cpp).

Conformance oracle only — the production H.264 decode path is our own
(codecs/h264.py); tests cross-validate that streams our encoder writes
decode identically in a real, independent decoder (the role the
platform's <video> decoder plays for the reference,
/root/reference/src/V1/player.ts:120-132). Returns None gracefully when
libavcodec is absent so the framework never hard-depends on it."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "h264ref.cpp")
_SO = os.path.join(_DIR, "libuvt_h264ref.so")

_lib = None
_failed = False


def get_h264ref_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed or os.environ.get("UVT_DISABLE_H264REF") == "1":
        return None
    from uvol_tpu.native import _compile

    if not _compile(_SRC, _SO, libs=["-lavcodec", "-lavutil"]):
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _failed = True
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.uvt_h264ref_decode.argtypes = [
        u8p, ctypes.c_long, u8p, ctypes.c_long, i32p,
    ]
    lib.uvt_h264ref_decode.restype = ctypes.c_long
    lib.uvt_h264ref_encode_x264.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_long,
    ]
    lib.uvt_h264ref_encode_x264.restype = ctypes.c_long
    lib.uvt_h264ref_encode_x264_gop.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8p, ctypes.c_long,
    ]
    lib.uvt_h264ref_encode_x264_gop.restype = ctypes.c_long
    lib.uvt_h264ref_encode_x264_custom.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, u8p, ctypes.c_long,
    ]
    lib.uvt_h264ref_encode_x264_custom.restype = ctypes.c_long
    _lib = lib
    return lib


def encode_x264_ref(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, qp: int
) -> Optional[bytes]:
    """Encode [F,H,W] YUV420 planes with the system libx264 (all-intra,
    CAVLC, deblocking off — the foreign-stream generator for decoder
    conformance tests). None when libx264 is unavailable."""
    lib = get_h264ref_lib()
    if lib is None:
        return None
    f, h, w = y.shape
    yuv = np.concatenate(
        [
            np.concatenate(
                [y[i].reshape(-1), cb[i].reshape(-1), cr[i].reshape(-1)]
            )
            for i in range(f)
        ]
    ).astype(np.uint8)
    cap = max(len(yuv) * 2, 1 << 20)
    out = np.empty(cap, np.uint8)
    rc = lib.uvt_h264ref_encode_x264(
        np.ascontiguousarray(yuv), w, h, f, qp, out, cap
    )
    if rc == -10:  # libx264 not built into this libavcodec
        return None
    if rc < 0:
        raise ValueError(f"libx264 encode failed (rc={rc})")
    return bytes(out[:rc])


def encode_x264_gop_ref(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, qp: int,
    gop: int, subme: int = 0,
) -> Optional[bytes]:
    """Inter-coded foreign streams from libx264 (gop P chains, 16x16
    partitions only, subme 0 = full-pel / 2 = quarter-pel MVs, CAVLC,
    deblocking off) — the round-4 motion-conformance generator."""
    lib = get_h264ref_lib()
    if lib is None:
        return None
    f, h, w = y.shape
    yuv = np.concatenate(
        [
            np.concatenate(
                [y[i].reshape(-1), cb[i].reshape(-1), cr[i].reshape(-1)]
            )
            for i in range(f)
        ]
    ).astype(np.uint8)
    cap = max(len(yuv) * 2, 1 << 20)
    out = np.empty(cap, np.uint8)
    rc = lib.uvt_h264ref_encode_x264_gop(
        np.ascontiguousarray(yuv), w, h, f, qp, gop, subme, out, cap
    )
    if rc == -10:
        return None
    if rc < 0:
        raise ValueError(f"libx264 gop encode failed (rc={rc})")
    return bytes(out[:rc])


def encode_x264_custom_ref(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, *,
    gop: int, params: str, profile: str = "baseline",
) -> Optional[bytes]:
    """Encode [F,H,W] YUV420 planes with the system libx264 under
    caller-chosen x264-params — the round-5 rate-calibration entry
    (examples/h264_calibrate.py). None when libx264 is unavailable."""
    lib = get_h264ref_lib()
    if lib is None:
        return None
    f, h, w = y.shape
    yuv = np.concatenate(
        [
            np.concatenate(
                [y[i].reshape(-1), cb[i].reshape(-1), cr[i].reshape(-1)]
            )
            for i in range(f)
        ]
    ).astype(np.uint8)
    cap = max(len(yuv) * 2, 1 << 20)
    out = np.empty(cap, np.uint8)
    rc = lib.uvt_h264ref_encode_x264_custom(
        np.ascontiguousarray(yuv), w, h, f, gop,
        params.encode(), profile.encode(), out, cap,
    )
    if rc == -10:
        return None
    if rc < 0:
        raise ValueError(f"libx264 custom encode failed (rc={rc})")
    return bytes(out[:rc])


def decode_annexb_ref(
    stream: bytes,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode an Annex-B H.264 stream with libavcodec.

    Returns (Y [F,H,W], Cb [F,H/2,W/2], Cr [F,H/2,W/2]) uint8, or None
    when the shim is unavailable. Raises ValueError on decode errors."""
    lib = get_h264ref_lib()
    if lib is None:
        return None
    data = np.frombuffer(stream, np.uint8)
    cap = max(len(stream) * 8, 1 << 22)
    for _ in range(4):
        out = np.empty(cap, np.uint8)
        dims = np.zeros(3, np.int32)
        rc = lib.uvt_h264ref_decode(data, len(data), out, cap, dims)
        if rc == -2:  # capacity: grow and retry
            cap *= 4
            continue
        if rc < 0:
            raise ValueError(f"libavcodec h264 decode failed (rc={rc})")
        w, h, f = int(dims[0]), int(dims[1]), int(dims[2])
        if f == 0:
            raise ValueError("libavcodec produced no frames")
        per = w * h + 2 * (w // 2) * (h // 2)
        assert rc == per * f, (rc, per, f)
        frames = out[: per * f].reshape(f, per)
        y = frames[:, : w * h].reshape(f, h, w)
        csz = (w // 2) * (h // 2)
        cb = frames[:, w * h : w * h + csz].reshape(f, h // 2, w // 2)
        cr = frames[:, w * h + csz :].reshape(f, h // 2, w // 2)
        return y.copy(), cb.copy(), cr.copy()
    raise ValueError("libavcodec output larger than retry capacity")
