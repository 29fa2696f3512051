"""Zstd supercompression, ETC1 fast-transcode target, format selection.

Parity targets: src/lib/KTX2Loader.js Zstd raw path (:799-823), the
FORMAT_OPTIONS device table (:591-697), and the native transcoder's
ETC1S→ETC1 passthrough.
"""

import numpy as np
import pytest

from uvol_tpu.codecs.basis.transcoder import (
    FORMAT_OPTIONS,
    blocks_to_rgb,
    select_transcode_target,
    transcode_ktx2_etc1s,
)
from uvol_tpu.containers.ktx2 import read_ktx2
from uvol_tpu.native import zstd


def test_zstd_binding_roundtrip():
    if not zstd.is_available():
        pytest.skip("libzstd not present")
    data = b"volumetric" * 1000
    c = zstd.compress(data)
    assert len(c) < len(data) // 5
    assert zstd.decompress(c) == data
    assert zstd.decompress(c, len(data)) == data


def test_texture_segment_zstd_supercompression():
    if not zstd.is_available():
        pytest.skip("libzstd not present")
    from uvol_tpu.models.sequence import TextureSequenceCodec

    r = np.random.default_rng(0)
    gray = r.uniform(0, 1, (3, 32, 32, 1)) * 40 + 100
    frames = np.clip(gray + r.uniform(-1, 1, (3, 32, 32, 3)) * 4, 0, 255).astype(
        np.uint8
    )
    plain = TextureSequenceCodec(sequence_size=3)
    zc = TextureSequenceCodec(sequence_size=3, supercompression="zstd")
    blob_plain = plain.encode_segment(frames)
    blob_z = zc.encode_segment(frames)
    f = read_ktx2(blob_z)
    assert f.header.supercompression_scheme == 2  # ZSTD
    out_plain = plain.decode_segment(read_ktx2(blob_plain))
    out_z = plain.decode_segment(f)
    np.testing.assert_array_equal(out_plain, out_z)


def test_etc1_fast_transcode_matches_rgba(liam_output):
    """ETC1 passthrough words, decoded by our ETC1 block decoder, must
    reproduce the full RGBA transcode exactly."""
    import jax.numpy as jnp

    from uvol_tpu.codecs.basis.etc import blocks_to_image, decode_etc1_blocks

    path = (
        liam_output / "texture_ktx2-fps30-1k_baseColor_default" / "00000.ktx2"
    )
    kf = read_ktx2(path.read_bytes())
    rgba = transcode_ktx2_etc1s(kf)[:2]
    words = transcode_ktx2_etc1s(kf, target="etc1")[:2]
    h = w = 1024
    for i in range(2):
        img = np.asarray(
            blocks_to_image(decode_etc1_blocks(jnp.asarray(words[i])), h, w)
        )
        np.testing.assert_array_equal(img, rgba[i])


def test_format_selection_table():
    # ETC-capable device prefers the ETC1 passthrough for ETC1S sources
    assert select_transcode_target({"etc2", "dxt"}) == "etc1"
    # BPTC beats DXT for ETC1S when no ETC
    assert select_transcode_target({"bptc", "dxt"}) == "bc7"
    # UASTC sources prefer ASTC
    assert (
        select_transcode_target({"astc", "etc2"}, is_uastc=True) == "astc-4x4"
    )
    # PVRTC requires power-of-two
    assert (
        select_transcode_target({"pvrtc"}, width=1000, height=1024) == "rgba"
    )
    assert (
        select_transcode_target({"pvrtc"}, width=1024, height=1024) == "pvrtc1"
    )
    # no capabilities → full RGBA decode
    assert select_transcode_target(set()) == "rgba"
    assert len(FORMAT_OPTIONS) == 6
