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
