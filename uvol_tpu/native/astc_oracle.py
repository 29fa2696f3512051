"""Independent ASTC-LDR decode oracle via Mesa llvmpipe (headless GL).

The image carries no ASTC tooling, but Mesa's software rasterizer
advertises GL_KHR_texture_compression_astc_ldr — a full, independent
ASTC decoder. This helper uploads raw 4x4 ASTC blocks as a compressed
texture and reads back the decoded RGBA8 pixels, giving the conformance
oracle for codecs/basis/astc.py (the role libavcodec plays for the H.264
codec — see native/h264ref.py). Test-only: the production decode path is
our own.

Returns None gracefully when EGL/llvmpipe is unavailable.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_state: dict = {}


def _ensure_context() -> bool:
    if "ok" in _state:
        return _state["ok"]
    _state["ok"] = False
    try:
        os.environ.setdefault("EGL_PLATFORM", "surfaceless")
        os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
        import ctypes

        from OpenGL import EGL
        from OpenGL.EGL import (
            EGL_DEFAULT_DISPLAY,
            EGL_NO_CONTEXT,
            EGL_NO_SURFACE,
            EGL_OPENGL_API,
            eglBindAPI,
            eglCreateContext,
            eglGetDisplay,
            eglInitialize,
            eglMakeCurrent,
        )

        dpy = eglGetDisplay(EGL_DEFAULT_DISPLAY)
        major, minor = ctypes.c_long(), ctypes.c_long()
        if not eglInitialize(dpy, major, minor):
            return False
        eglBindAPI(EGL_OPENGL_API)
        ctx = eglCreateContext(dpy, None, EGL_NO_CONTEXT, None)
        if not eglMakeCurrent(dpy, EGL_NO_SURFACE, EGL_NO_SURFACE, ctx):
            return False
        from OpenGL import GL

        n = GL.glGetIntegerv(GL.GL_NUM_EXTENSIONS)
        exts = {
            GL.glGetStringi(GL.GL_EXTENSIONS, i).decode() for i in range(n)
        }
        if "GL_KHR_texture_compression_astc_ldr" not in exts:
            return False
        _state["GL"] = GL
        _state["ok"] = True
        return True
    except Exception:
        return False


GL_COMPRESSED_RGBA_ASTC_4x4_KHR = 0x93B0
GL_COMPRESSED_RGB8_ETC2 = 0x9274
GL_COMPRESSED_RGB_S3TC_DXT1 = 0x83F0
GL_COMPRESSED_RGBA_S3TC_DXT5 = 0x83F3
GL_COMPRESSED_RGBA_BPTC_UNORM = 0x8E8C


def decode_blocks_gl(
    blocks: np.ndarray, internal_format: int, bytes_per_block: int = 16
) -> Optional[np.ndarray]:
    """[N, bytes_per_block] uint8 raw 4x4 blocks → [N, 4, 4, 4] RGBA8
    via the GL decoder (blocks laid out as one N*4-wide, 4-tall
    texture). None when no capable GL context is available. The
    independent-decoder oracle for every block format llvmpipe exposes:
    ASTC-LDR, ETC2 (ETC1 words are valid ETC2), S3TC BC1/BC3, BPTC BC7."""
    if not _ensure_context():
        return None
    GL = _state["GL"]
    blocks = np.ascontiguousarray(blocks, np.uint8).reshape(
        -1, bytes_per_block
    )
    n = len(blocks)
    tex = GL.glGenTextures(1)
    GL.glBindTexture(GL.GL_TEXTURE_2D, tex)
    GL.glPixelStorei(GL.GL_UNPACK_ALIGNMENT, 1)
    GL.glCompressedTexImage2D(
        GL.GL_TEXTURE_2D, 0, internal_format, 4 * n, 4, 0, blocks.tobytes()
    )
    err = GL.glGetError()
    if err:
        GL.glDeleteTextures([tex])
        raise RuntimeError(f"gl oracle upload failed (gl error {err:#x})")
    out = GL.glGetTexImage(GL.GL_TEXTURE_2D, 0, GL.GL_RGBA, GL.GL_UNSIGNED_BYTE)
    GL.glDeleteTextures([tex])
    img = np.frombuffer(out, np.uint8).reshape(4, 4 * n, 4)
    # GetTexImage returns rows from the first texel row as uploaded;
    # blocks sit side by side along x
    return np.stack([img[:, 4 * i : 4 * i + 4] for i in range(n)])


def decode_astc_blocks_gl(blocks: np.ndarray) -> Optional[np.ndarray]:
    """[N, 16] uint8 raw ASTC 4x4 blocks → [N, 4, 4, 4] RGBA8."""
    return decode_blocks_gl(blocks, GL_COMPRESSED_RGBA_ASTC_4x4_KHR, 16)
