"""Independent-decoder (Mesa GL) validation of the compressed-texture
wire formats our codecs emit: ETC1 words (as ETC2), BC1/BC3 transcodes.
Skips when no EGL context is available (ASTC/BC7 have their own suites)."""

import numpy as np
import pytest

import uvol_tpu.codecs.basis.transcoder as T
from uvol_tpu.native.astc_oracle import (
    GL_COMPRESSED_RGB8_ETC2,
    GL_COMPRESSED_RGB_S3TC_DXT1,
    decode_blocks_gl,
)

_HAS_GL = decode_blocks_gl(
    np.zeros((1, 8), np.uint8), GL_COMPRESSED_RGB_S3TC_DXT1, 8
) is not None


@pytest.mark.skipif(not _HAS_GL, reason="no GL oracle")
def test_etc1_words_bit_exact_vs_gl():
    """Our ETC1 encoder's words decode bit-identically in Mesa's ETC2
    decoder, and our own decode agrees — the whole texture fast path is
    pinned against an independent implementation."""
    import jax.numpy as jnp

    from uvol_tpu.codecs.basis.etc import (
        decode_etc1_blocks,
        encode_etc1_blocks,
        image_to_blocks,
        pack_etc1_payload,
    )

    r = np.random.default_rng(3)
    img = r.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    blocks = np.asarray(image_to_blocks(img[None]))[0]
    words = np.asarray(encode_etc1_blocks(jnp.asarray(blocks)))
    ours = np.asarray(decode_etc1_blocks(jnp.asarray(words))).reshape(
        -1, 4, 4, 3
    )
    wire = np.frombuffer(pack_etc1_payload(words), np.uint8).reshape(-1, 8)
    ref = decode_blocks_gl(wire, GL_COMPRESSED_RGB8_ETC2, 8)
    assert np.array_equal(ref[..., :3], ours)


@pytest.mark.skipif(not _HAS_GL, reason="no GL oracle")
def test_bc1_transcode_decodes_in_gl():
    """ETC1S→BC1 words are valid S3TC an independent decoder accepts and
    reconstructs close to the intended colors (S3TC interpolation is
    implementation-defined, so tolerance — not bit equality — is the
    conformance bar here)."""
    import os

    path = (
        "/root/reference/example/public/liam/output/"
        "texture_ktx2-fps30-1k_baseColor_default/00000.ktx2"
    )
    if not os.path.exists(path):
        pytest.skip("liam corpus absent")
    import uvol_tpu.codecs.basis.transcoder as T
    from uvol_tpu.containers.ktx2 import read_ktx2

    f = read_ktx2(open(path, "rb").read())
    g = f.basis_lz
    models = T.decode_slice_models(g.tables_data)
    lvl = f.level_payload(0)
    d0 = g.image_descs[0]
    blocks = T.decode_etc1s_slice(
        lvl[d0.rgb_slice_byte_offset : d0.rgb_slice_byte_offset
            + d0.rgb_slice_byte_length],
        256, 256, models, g.endpoint_count, g.selector_count,
    )
    eps = T.decode_endpoints(g.endpoints_data, g.endpoint_count)
    sels = T.decode_selectors(g.selectors_data, g.selector_count)
    words = T.blocks_to_bc1_words(blocks, eps, sels)[:2048]
    wire = words.astype("<u4").view(np.uint8).reshape(-1, 8)
    ref = decode_blocks_gl(wire, GL_COMPRESSED_RGB_S3TC_DXT1, 8)
    rgb = np.asarray(T.blocks_to_rgb(blocks, eps, sels))
    H, W = rgb.shape[:2]
    ours = (
        rgb.reshape(H // 4, 4, W // 4, 4, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 4, 4, 3)[:2048]
    )
    diff = np.abs(ref[..., :3].astype(int) - ours.astype(int))
    assert diff.mean() < 2.0 and np.percentile(diff, 99) <= 16


@pytest.mark.skipif(not _HAS_GL, reason="no GL oracle")
def test_etc2_eac_alpha_target_vs_gl():
    """The etc2-eac target's 16-byte blocks decode in Mesa's independent
    RGBA8_ETC2_EAC decoder to the same colors as the full RGBA decode
    (color half bit-exact, alpha within one EAC quantization step)."""
    from uvol_tpu.codecs.basis.etc1s_encode import encode_ktx2_etc1s
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:32, 0:32]
    img = np.zeros((2, 32, 32, 4), np.uint8)
    img[..., 0] = xx * 8
    img[..., 1] = yy * 8
    img[..., 2] = 128
    img[..., 3] = np.where((xx // 8 + yy // 8) % 2 == 0, 255, 96)
    f = read_ktx2(encode_ktx2_etc1s(img))
    ref = T.transcode_ktx2_etc1s(f, "rgba")
    words = T.transcode_ktx2_etc1s(f, "etc2-eac")
    assert words.shape == (2, 64, 4)
    for layer in range(2):
        wire = np.frombuffer(
            words[layer].astype(">u4").tobytes(), np.uint8
        ).reshape(-1, 16)
        dec = decode_blocks_gl(wire, 0x9278, 16)
        out = np.zeros((32, 32, 4), np.uint8)
        for b in range(len(wire)):
            by, bx = divmod(b, 8)
            out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = dec[b]
        assert np.array_equal(out[..., :3], ref[layer][..., :3])
        assert (
            np.abs(out[..., 3].astype(int) - ref[layer][..., 3].astype(int))
            .max()
            <= 2
        )


@pytest.mark.skipif(not _HAS_GL, reason="no GL oracle")
def test_etc2_eac_opaque_constant_alpha():
    """Opaque files on the etc2-eac target carry an exact constant-255
    alpha block (base 255, table-13 index 4 whose modifier is 0)."""
    from uvol_tpu.codecs.basis.etc1s_encode import encode_ktx2_etc1s
    from uvol_tpu.containers.ktx2 import read_ktx2

    img = np.zeros((1, 16, 16, 3), np.uint8)
    img[..., 1] = np.arange(16)[:, None] * 15
    f = read_ktx2(encode_ktx2_etc1s(img))
    words = T.transcode_ktx2_etc1s(f, "etc2-eac")
    wire = np.frombuffer(
        words[0].astype(">u4").tobytes(), np.uint8
    ).reshape(-1, 16)
    dec = decode_blocks_gl(wire, 0x9278, 16)
    assert (dec[..., 3] == 255).all()


@pytest.mark.skipif(not _HAS_GL, reason="no GL oracle")
@pytest.mark.parametrize(
    "caps,fmt,gl_fmt,bpb",
    [
        (("etc2", "etc1"), "etc2-eac", 0x9278, 16),
        (("dxt",), "bc1-bc3", 0x83F3, 16),
    ],
)
def test_uastc_refit_targets_vs_gl(monkeypatch, caps, fmt, gl_fmt, bpb):
    """UASTC's decode-and-refit rows of the reference format table emit
    wire an independent decoder reconstructs close to the UASTC decode
    (alpha exact on representable levels)."""
    import uvol_tpu.player.v2 as v2
    from uvol_tpu.codecs.basis import uastc as U
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:32, 0:32]
    img = np.zeros((1, 32, 32, 4), np.uint8)
    img[..., 0] = xx * 8
    img[..., 1] = yy * 8
    img[..., 2] = 100
    img[..., 3] = np.where((xx // 8 + yy // 8) % 2 == 0, 255, 120)
    blob = U.encode_uastc_ktx2(img)
    ref = U.transcode_uastc(read_ktx2(blob), "rgba")[0]
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", caps)
    dec = v2.default_texture_decoder(blob)
    assert dec.format == fmt
    words = np.asarray(dec.data)[0]
    order = ">u4" if fmt == "etc2-eac" else "<u4"
    wire = np.frombuffer(words.astype(order).tobytes(), np.uint8).reshape(
        -1, bpb
    )
    d = decode_blocks_gl(wire, gl_fmt, bpb)
    out = np.zeros((32, 32, 4), np.uint8)
    for b in range(len(wire)):
        by, bx = divmod(b, 8)
        out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = d[b]
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err[..., :3].max() <= 24
    assert err[..., 3].max() <= 4


def test_uastc_pvrtc1_refit(monkeypatch):
    import uvol_tpu.player.v2 as v2
    from uvol_tpu.codecs.basis import uastc as U
    from uvol_tpu.codecs.basis.pvrtc import decode_pvrtc1_4bpp
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:32, 0:32]
    img = np.zeros((1, 32, 32, 4), np.uint8)
    img[..., 0] = xx * 8
    img[..., 1] = yy * 8
    img[..., 3] = 255
    blob = U.encode_uastc_ktx2(img)
    ref = U.transcode_uastc(read_ktx2(blob), "rgba")[0]
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("pvrtc",))
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "pvrtc1"
    out = decode_pvrtc1_4bpp(np.asarray(dec.data)[0], 32, 32)
    mse = ((out[..., :3].astype(float) - ref[..., :3].astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 22.0


def test_uastc_refit_mixed_alpha_layers(monkeypatch):
    """A multi-layer file where only one layer has alpha must emit a
    uniform word layout (file-level alpha decision, not per-layer)."""
    import uvol_tpu.player.v2 as v2
    from uvol_tpu.codecs.basis import uastc as U

    img = np.zeros((2, 16, 16, 4), np.uint8)
    img[..., 1] = 90
    img[..., 3] = 255
    img[1, :8, :8, 3] = 100  # alpha only in layer 1
    blob = U.encode_uastc_ktx2(img)
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("dxt",))
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "bc1-bc3"
    assert np.asarray(dec.data).shape == (2, 16, 4)  # BC3 on BOTH layers
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("etc2", "etc1"))
    dec = v2.default_texture_decoder(blob)
    assert np.asarray(dec.data).shape == (2, 16, 4)
