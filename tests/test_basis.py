"""BasisLZ/ETC1S transcoder golden tests against the real liam corpus."""

import numpy as np
import pytest

from uvol_tpu.containers.ktx2 import read_ktx2_file


@pytest.fixture(scope="module")
def liam_ktx2(liam_output):
    return read_ktx2_file(
        str(liam_output / "texture_ktx2-fps30-1k_baseColor_default" / "00000.ktx2")
    )


def test_decode_global_palettes(liam_ktx2):
    from uvol_tpu.codecs.basis.transcoder import (
        decode_endpoints,
        decode_selectors,
    )

    g = liam_ktx2.basis_lz
    eps = decode_endpoints(g.endpoints_data, g.endpoint_count)
    assert len(eps) == g.endpoint_count == 1506
    assert all(0 <= c <= 31 for e in eps for c in e.color5)
    assert all(0 <= e.inten5 <= 7 for e in eps)
    sels = decode_selectors(g.selectors_data, g.selector_count)
    assert sels.shape == (g.selector_count, 4, 4)
    # all four 2-bit values used (balanced selectors)
    assert set(np.unique(sels)) == {0, 1, 2, 3}


def test_decode_slice_models(liam_ktx2):
    from uvol_tpu.codecs.basis.transcoder import decode_slice_models

    m = decode_slice_models(liam_ktx2.basis_lz.tables_data)
    assert len(m.endpoint_pred.code_sizes) == 257
    assert len(m.selector.code_sizes) == (
        liam_ktx2.basis_lz.selector_count + m.history_size + 1
    )
    assert m.history_size == 64


def test_transcode_full_segment(liam_ktx2):
    from uvol_tpu.codecs.basis.transcoder import transcode_ktx2_etc1s

    frames = transcode_ktx2_etc1s(liam_ktx2)
    assert frames.shape == (5, 1024, 1024, 3)
    for i in range(5):
        # real texture: strong spatial correlation, substantial black atlas bg
        a = frames[i][:, :-1, 0].astype(np.float64).ravel()
        b = frames[i][:, 1:, 0].astype(np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, (i, corr)
    black = (frames[0].max(-1) < 16).mean()
    assert 0.1 < black < 0.5


def test_native_slice_decode_parity_liam(liam_output):
    """Native ETC1S slice decode must equal the Python reference on real
    basisu P-frames — including the row-0/column-0 above/left predictions
    real streams emit (they resolve to the zero-filled wrap; a native
    out-of-bounds read here was caught by this corpus)."""
    import uvol_tpu.native as native
    from uvol_tpu.codecs.basis import transcoder as T
    from uvol_tpu.containers.ktx2 import read_ktx2_file

    path = (
        liam_output / "texture_ktx2-fps30-1k_baseColor_default" / "00000.ktx2"
    )
    f = read_ktx2_file(str(path))
    assert native.get_etc1s_lib() is not None
    rgba_native = np.asarray(T.transcode_ktx2_etc1s(f, target="etc1"))
    saved = (native._etc1s_failed, native._etc1s_lib)
    native._etc1s_failed, native._etc1s_lib = True, None
    try:
        rgba_python = np.asarray(T.transcode_ktx2_etc1s(f, target="etc1"))
    finally:
        native._etc1s_failed, native._etc1s_lib = saved
    np.testing.assert_array_equal(rgba_native, rgba_python)


def test_bc1_transcode_target(liam_output):
    """ETC1S → BC1 fast transcode (the reference table's "dxt" target):
    decoding the BC1 words must stay close to the full RGBA decode on a
    real basisu segment."""
    import numpy as np

    from uvol_tpu.codecs.basis.transcoder import transcode_ktx2_etc1s
    from uvol_tpu.containers.ktx2 import read_ktx2_file

    path = (
        liam_output
        / "texture_ktx2-fps30-1k_baseColor_default"
        / "00000.ktx2"
    )
    f = read_ktx2_file(str(path))
    rgba = transcode_ktx2_etc1s(f, target="rgba")[0].astype(np.float64)
    words = transcode_ktx2_etc1s(f, target="bc1-bc3")[0]  # [nblocks, 2]

    # reference BC1 decode (4-color mode when color0 > color1)
    w0 = words[:, 0].astype(np.uint32)
    c0 = w0 & 0xFFFF
    c1 = w0 >> 16
    def un565(q):
        r = (q >> 11) & 31
        g = (q >> 5) & 63
        b = q & 31
        return np.stack(
            [(r << 3) | (r >> 2), (g << 2) | (g >> 4), (b << 3) | (b >> 2)],
            -1,
        ).astype(np.int64)
    p0, p1 = un565(c0), un565(c1)
    pal = np.stack(
        [p0, p1, (2 * p0 + p1 + 1) // 3, (p0 + 2 * p1 + 1) // 3], 1
    )  # [N,4,3]
    j = np.arange(16)
    codes = (words[:, 1:2].astype(np.uint32) >> (2 * j[None, :])) & 3  # [N,16]
    texels = np.take_along_axis(
        pal, codes[..., None].astype(np.int64), axis=1
    )  # [N,16,3]
    h, w = rgba.shape[:2]
    img = (
        texels.reshape(h // 4, w // 4, 4, 4, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(h, w, 3)
    )
    mse = ((img.astype(np.float64) - rgba) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    # BC1 re-quantizes ETC1S output (565 endpoints, thirds vs symmetric
    # modifiers): expect a faithful but slightly lossy mapping
    assert psnr > 32, psnr


def test_player_dispatches_etc2_eac_for_alpha(monkeypatch):
    import uvol_tpu.player.v2 as v2
    from uvol_tpu.codecs.basis.etc1s_encode import encode_ktx2_etc1s

    img = np.zeros((1, 16, 16, 4), np.uint8)
    img[..., 1] = 80
    img[..., 3] = 128  # non-opaque -> alpha slice
    blob = encode_ktx2_etc1s(img)
    monkeypatch.setattr(
        v2, "DEVICE_TEXTURE_CAPABILITIES", ("etc2", "etc1")
    )
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "etc2-eac"
    assert np.asarray(dec.data).shape == (1, 16, 4)
    # etc1-only devices cannot take EAC alpha: full decode fallback
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("etc1",))
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "rgba"
