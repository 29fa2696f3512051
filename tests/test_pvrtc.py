"""PVRTC1 4bpp target tests.

No PVRTC oracle exists in this image (Mesa exposes no IMG formats), so
the pair is pinned by self-consistency, wire-layout unit checks, and
reconstruction PSNR against the full RGBA decode — the validation mode
documented in codecs/basis/pvrtc.py.
"""

import numpy as np
import pytest

from uvol_tpu.codecs.basis import transcoder as T
from uvol_tpu.codecs.basis.etc1s_encode import encode_ktx2_etc1s
from uvol_tpu.codecs.basis.pvrtc import (
    _morton_interleave,
    decode_pvrtc1_4bpp,
    transcode_blocks_to_pvrtc1,
)
from uvol_tpu.containers.ktx2 import read_ktx2


def test_morton_order():
    bx = np.array([0, 1, 0, 1, 2, 3])
    by = np.array([0, 0, 1, 1, 0, 3])
    # y bits even, x bits odd: (x=1,y=0)->2, (x=0,y=1)->1, (x=1,y=1)->3,
    # (x=2,y=0)->8, (x=3,y=3)->15
    assert list(_morton_interleave(bx, by)) == [0, 2, 1, 3, 8, 15]


def test_flat_block_roundtrip_exact_555():
    """A flat color expressible in RGB555 with A==B decodes exactly
    (no interpolation error when the low-frequency images are
    constant)."""
    color = np.array([88, 160, 248], np.uint8)  # multiples of 8: exact 555
    eps = T.EndpointList(
        np.array([[color[0] >> 3, color[1] >> 3, color[2] >> 3]], np.uint8),
        np.array([0], np.uint8),
    )
    sels = np.zeros((1, 4, 4), np.uint8)
    blocks = np.zeros((4, 4, 2), np.int32)
    words = transcode_blocks_to_pvrtc1(blocks, eps, sels, 16, 16)
    dec = decode_pvrtc1_4bpp(words, 16, 16)
    # the intensity-table modifier shifts levels off the base; the flat
    # decode must land within the 554/555 quantization of those levels
    want = T.transcode_ktx2_etc1s  # noqa: F841 (doc anchor)
    assert dec[..., 3].min() == 255
    assert np.abs(dec[..., :3].astype(int) - dec[0, 0, :3].astype(int)).max() == 0


def test_transcode_quality_vs_rgba_decode():
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.zeros((2, 64, 64, 3), np.uint8)
    img[..., 0] = xx * 4
    img[..., 1] = yy * 4
    img[..., 2] = 128 + ((xx + yy) // 2).astype(np.uint8)
    f = read_ktx2(encode_ktx2_etc1s(img))
    ref = T.transcode_ktx2_etc1s(f, "rgba")
    words = T.transcode_ktx2_etc1s(f, "pvrtc1")
    assert words.shape == (2, 256, 2)
    for i in range(2):
        dec = decode_pvrtc1_4bpp(words[i], 64, 64)
        mse = (
            (dec[..., :3].astype(float) - ref[i][..., :3].astype(float)) ** 2
        ).mean()
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > 22.0, psnr  # cross-block interpolation bounds this


def test_player_dispatches_pvrtc1(monkeypatch):
    import uvol_tpu.player.v2 as v2

    img = np.zeros((1, 32, 32, 3), np.uint8)
    img[..., 1] = np.arange(32)[:, None] * 7
    blob = encode_ktx2_etc1s(img)
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("pvrtc",))
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "pvrtc1"
    assert np.asarray(dec.data).shape == (1, 64, 2)
    # non-power-of-two: the selection table falls back to full decode
    img2 = np.zeros((1, 24, 32, 3), np.uint8)
    dec2 = v2.default_texture_decoder(encode_ktx2_etc1s(img2))
    assert dec2.format == "rgba"


def test_alpha_files_refuse_pvrtc1():
    img = np.zeros((1, 16, 16, 4), np.uint8)
    img[..., 3] = 128
    f = read_ktx2(encode_ktx2_etc1s(img))
    with pytest.raises(NotImplementedError):
        T.transcode_ktx2_etc1s(f, "pvrtc1")


def test_nonsquare_grid_roundtrip():
    """Non-square power-of-two grids use the TwiddleUV order (smaller
    dimension interleaved, larger dimension's high bits linear); the
    pair must roundtrip with full index coverage."""
    yy, xx = np.mgrid[0:16, 0:64]
    img = np.zeros((16, 64, 3), np.uint8)
    img[..., 0] = xx * 4
    img[..., 1] = yy * 16
    from uvol_tpu.codecs.basis.blockfit import fit_pvrtc1_from_rgba

    words = fit_pvrtc1_from_rgba(img)
    assert words.shape == (64, 2)
    dec = decode_pvrtc1_4bpp(words, 64, 16)
    mse = ((dec[..., :3].astype(float) - img.astype(float)) ** 2).mean()
    # gradients wrap at the texture border (PVRTC filter wraps), so the
    # bar is lower than the square-texture test; a broken block order
    # lands near 10 dB
    assert 10 * np.log10(255**2 / mse) > 20


def test_twiddle_order_bijective():
    for nbx, nby in ((8, 2), (2, 8), (4, 4), (16, 4)):
        gy, gx = np.mgrid[0:nby, 0:nbx]
        m = _morton_interleave(gx.ravel(), gy.ravel(), nbx, nby)
        assert sorted(m.tolist()) == list(range(nbx * nby)), (nbx, nby)


def test_punch_through_mode_decode():
    """Blocks selecting the alternate modulation mode blend codes 1/2 at
    4/8 and make code 2 transparent (decoder-side only: the transcoder
    never emits mode 1)."""
    # one-block texture: A = black (554), B = white, all four codes used
    a14 = 0  # black
    b15 = 0x7FFF  # white
    colw = (b15 << 16) | (1 << 31) | (a14 << 1) | (1 << 15) | 1  # mode=1
    codes = [0, 1, 2, 3] * 4
    modw = 0
    for t, c in enumerate(codes):
        modw |= c << (2 * t)
    words = np.array([[modw, colw]], np.uint32)
    dec = decode_pvrtc1_4bpp(words, 4, 4)
    flat_codes = np.array(codes).reshape(4, 4)
    # code 2 texels transparent, everything else opaque
    assert (dec[..., 3][flat_codes == 2] == 0).all()
    assert (dec[..., 3][flat_codes != 2] == 255).all()
    # single-block texture: interpolation field is constant, so code 0
    # reconstructs A, code 3 reconstructs B, codes 1/2 the 4/8 midpoint
    rgb = dec[..., :3].astype(int)
    assert (rgb[flat_codes == 0] == 0).all()
    assert (rgb[flat_codes == 3] == 255).all()
    mid = rgb[(flat_codes == 1) | (flat_codes == 2)]
    assert np.abs(mid - 128).max() <= 1


def test_uastc_alpha_refuses_pvrtc1(monkeypatch):
    import uvol_tpu.player.v2 as v2
    from uvol_tpu.codecs.basis import uastc as U

    img = np.zeros((1, 16, 16, 4), np.uint8)
    img[..., 1] = 60
    img[..., 3] = 120
    blob = U.encode_uastc_ktx2(img)
    with pytest.raises(NotImplementedError):
        U.transcode_uastc(read_ktx2(blob), "pvrtc1")
    # the player falls back to the full decode instead of flattening
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("pvrtc",))
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "rgba"
