"""Native (C++) hot loops with ctypes bindings and pure-Python fallback.

The library is built on first import (g++ is part of the baked toolchain);
failures fall back silently to the Python reference implementations so the
framework never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libuvt_entropy.so")
_SRC = os.path.join(_HERE, "entropy.cpp")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
                check=True,
                capture_output=True,
            )
            os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.uvt_rans_decode.argtypes = [
        u32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, u32p, ctypes.c_int,
    ]
    lib.uvt_rans_decode.restype = ctypes.c_int
    lib.uvt_rans_encode.argtypes = [
        u32p, ctypes.c_int, ctypes.c_int, u32p, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.uvt_rans_encode.restype = ctypes.c_int
    lib.uvt_tunstall_expand.argtypes = [
        u8p, i32p, i32p, u8p, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.uvt_tunstall_expand.restype = ctypes.c_int
    _lib = lib
    return lib


def rans_decode_native(
    probs: np.ndarray, precision_bits: int, buf: bytes, n: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n, np.uint32)
    probs = np.ascontiguousarray(probs, np.uint32)
    b = np.frombuffer(buf, np.uint8)
    rc = lib.uvt_rans_decode(
        probs, len(probs), precision_bits, np.ascontiguousarray(b), len(b), out, n
    )
    return out if rc == 0 else None


def rans_encode_native(
    probs: np.ndarray, precision_bits: int, symbols: np.ndarray
) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    symbols = np.ascontiguousarray(symbols, np.uint32)
    out = np.empty(len(symbols) * 4 + 1024, np.uint8)
    rc = lib.uvt_rans_encode(
        np.ascontiguousarray(probs, np.uint32),
        len(probs),
        precision_bits,
        symbols,
        len(symbols),
        out,
        len(out),
    )
    if rc < 0:
        return None
    return out[:rc].tobytes()


def tunstall_expand_native(
    words: bytes, index: np.ndarray, lengths: np.ndarray, comp: bytes, out_size: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(out_size, np.uint8)
    rc = lib.uvt_tunstall_expand(
        np.frombuffer(words, np.uint8),
        np.ascontiguousarray(index, np.int32),
        np.ascontiguousarray(lengths, np.int32),
        np.frombuffer(comp, np.uint8),
        len(comp),
        out,
        out_size,
    )
    return out if rc == 0 else None
