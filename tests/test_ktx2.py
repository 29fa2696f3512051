import os

import pytest

from uvol_tpu.containers.ktx2 import (
    SUPERCOMPRESSION_BASISLZ,
    SUPERCOMPRESSION_NONE,
    KHR_DF_MODEL_ETC1S,
    BasisLZGlobalData,
    KTX2Header,
    KTX2Level,
    make_basis_dfd,
    read_ktx2,
    read_ktx2_file,
    read_ktx2_header,
    write_ktx2,
)


def test_parse_liam_ktx2(liam_output):
    path = liam_output / "texture_ktx2-fps30-1k_baseColor_default" / "00000.ktx2"
    f = read_ktx2_file(str(path))
    h = f.header
    assert h.vk_format == 0  # Basis universal → VK_FORMAT_UNDEFINED
    assert (h.pixel_width, h.pixel_height) == (1024, 1024)
    assert h.layer_count == 5  # KTX2_BATCH_SIZE frames as layers
    assert h.face_count == 1 and h.level_count == 1
    assert h.supercompression_scheme == SUPERCOMPRESSION_BASISLZ
    assert f.dfd_color_model() == KHR_DF_MODEL_ETC1S
    assert f.basis_lz is not None
    g = f.basis_lz
    assert g.endpoint_count > 0 and g.selector_count > 0
    assert len(g.image_descs) == 5  # one per layer
    # every slice must lie inside the level payload
    level = f.levels[0]
    for d in g.image_descs:
        assert d.rgb_slice_byte_offset + d.rgb_slice_byte_length <= len(level.data)
        assert d.alpha_slice_byte_length == 0  # baseColor is opaque ETC1S


def test_parse_all_liam_headers(liam_output):
    tex_dir = liam_output / "texture_ktx2-fps30-1k_baseColor_default"
    for name in sorted(os.listdir(tex_dir)):
        h = read_ktx2_header(str(tex_dir / name))
        assert h.layer_count == 5 and h.pixel_width == 1024


def test_write_read_roundtrip_plain():
    header = KTX2Header(
        vk_format=37,  # R8G8B8A8_UNORM
        type_size=1,
        pixel_width=8,
        pixel_height=8,
        pixel_depth=0,
        layer_count=0,
        face_count=1,
        level_count=1,
        supercompression_scheme=SUPERCOMPRESSION_NONE,
    )
    data = bytes(range(256))
    blob = write_ktx2(header, [KTX2Level(data, len(data))],
                      key_value={b"KTXorientation": b"rd\x00"})
    f = read_ktx2(blob)
    assert f.header.pixel_width == 8
    assert f.levels[0].data == data
    assert f.key_value[b"KTXorientation"] == b"rd\x00"


def test_write_read_roundtrip_basislz(liam_output):
    # re-pack the real liam file through our writer and re-parse it
    path = liam_output / "texture_ktx2-fps30-1k_baseColor_default" / "00001.ktx2"
    f = read_ktx2_file(str(path))
    blob = write_ktx2(
        f.header,
        f.levels,
        dfd=f.dfd,
        key_value=f.key_value,
        basis_lz=f.basis_lz,
    )
    f2 = read_ktx2(blob)
    assert f2.header == f.header
    assert f2.levels[0].data == f.levels[0].data
    assert f2.basis_lz is not None and f.basis_lz is not None
    assert f2.basis_lz.pack() == f.basis_lz.pack()


def test_make_basis_dfd_shape():
    dfd = make_basis_dfd()
    assert len(dfd) == 44  # matches basisu's ETC1S DFD size (liam: dfdLen 0x2c)
    assert dfd[12] == KHR_DF_MODEL_ETC1S
