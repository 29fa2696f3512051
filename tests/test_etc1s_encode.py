"""ETC1S/BasisLZ encoder tests.

The format oracle is our own transcoder, which is golden-validated against
basisu-produced liam segments — so wire-exact roundtrip through it is the
VERDICT r1 item 3 "Done" bar ("own transcode_ktx2_etc1s decodes own output
bit-cleanly").
"""

import numpy as np
import pytest

from uvol_tpu.codecs.basis.etc1s_encode import build_palettes, encode_ktx2_etc1s
from uvol_tpu.codecs.basis.huffman import BitWriter, HuffmanEncoder, write_vlc
from uvol_tpu.codecs.basis.transcoder import (
    BitReader,
    decode_endpoints,
    decode_etc1s_slice,
    decode_selectors,
    decode_slice_models,
    decode_vlc,
    read_huffman_table,
    transcode_ktx2_etc1s,
)
from uvol_tpu.containers.ktx2 import read_ktx2


def test_huffman_roundtrip_fuzz():
    r = np.random.default_rng(0)
    for trial in range(12):
        n_syms = int(r.integers(1, 300))
        freqs = np.maximum(
            0, (r.pareto(1.0, n_syms) * 10).astype(int) - int(r.integers(0, 12))
        )
        if freqs.sum() == 0:
            freqs[0] = 5
        enc = HuffmanEncoder(freqs.tolist())
        syms = [int(s) for s in r.choice(np.nonzero(freqs)[0], size=150)]
        bw = BitWriter()
        enc.write_table(bw)
        for s in syms:
            enc.encode(bw, s)
        br = BitReader(bw.getvalue())
        table = read_huffman_table(br)
        assert [table.decode(br) for _ in syms] == syms
        assert table.code_sizes == enc.code_sizes


def test_vlc_roundtrip():
    for v in [0, 1, 15, 16, 127, 128, 100000]:
        for cb in (4, 7):
            bw = BitWriter()
            write_vlc(bw, v, cb)
            assert decode_vlc(BitReader(bw.getvalue()), cb) == v


def _video_frames(F=4, H=64, W=64):
    frames = np.zeros((F, H, W, 3), np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for f in range(F):
        img = np.stack(
            [(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8)
        img[10 + f * 4 : 20 + f * 4, 10:30] = [200, 50, 50]
        frames[f] = img
    return frames


def test_etc1s_wire_exact_roundtrip():
    """Decoded (endpoint, selector) block indices and palettes must equal
    exactly what the encoder assigned — I-frame and CR P-frames."""
    frames = _video_frames()
    pal = build_palettes(frames, 64, 64)
    blob = encode_ktx2_etc1s(frames, num_endpoints=64, num_selectors=64)
    kf = read_ktx2(blob)
    g = kf.basis_lz
    eps = decode_endpoints(g.endpoints_data, g.endpoint_count)
    sels = decode_selectors(g.selectors_data, g.selector_count)
    assert np.array_equal(
        np.array([list(e.color5) for e in eps], np.uint8), pal.color5
    )
    assert np.array_equal(np.array([e.inten5 for e in eps], np.uint8), pal.inten)
    assert np.array_equal(sels.reshape(len(sels), 16), pal.selectors)
    models = decode_slice_models(g.tables_data)
    nbx = nby = 16
    prev = None
    for i, d in enumerate(g.image_descs):
        sl = kf.levels[0].data[
            d.rgb_slice_byte_offset : d.rgb_slice_byte_offset
            + d.rgb_slice_byte_length
        ]
        blocks = decode_etc1s_slice(
            sl, nbx, nby, models, g.endpoint_count, g.selector_count,
            prev_frame=prev,
        )
        prev = blocks
        assert np.array_equal(
            blocks[..., 0].reshape(-1), pal.block_endpoint[i]
        ), f"frame {i} endpoints"
        assert np.array_equal(
            blocks[..., 1].reshape(-1), pal.block_selector[i]
        ), f"frame {i} selectors"
    assert g.image_descs[0].image_flags == 0  # I-frame
    assert all(d.image_flags == 2 for d in g.image_descs[1:])  # P-frames


def test_etc1s_quality_and_cr_compression():
    frames = _video_frames()
    blob = encode_ktx2_etc1s(frames, num_endpoints=128, num_selectors=128)
    kf = read_ktx2(blob)
    out = transcode_ktx2_etc1s(kf)
    assert out.shape == frames.shape
    mse = ((out.astype(float) - frames.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 24.0, psnr
    # conditional replenishment: static background makes P-slices much
    # smaller than the I-slice
    descs = kf.basis_lz.image_descs
    assert descs[1].rgb_slice_byte_length < descs[0].rgb_slice_byte_length / 2


def test_etc1s_single_frame():
    frames = _video_frames(F=1)
    blob = encode_ktx2_etc1s(frames, num_endpoints=32, num_selectors=32)
    kf = read_ktx2(blob)
    assert kf.image_count == 1
    out = transcode_ktx2_etc1s(kf)
    assert out.shape == frames.shape


@pytest.mark.slow
def test_etc1s_reencode_liam_segment(liam_output):
    """Re-encode real liam frames at basisu's palette sizes (1506/734).

    The input frames are themselves ETC1S output, i.e. exactly
    representable with palettes of this size — so PSNR here directly
    measures palette-construction quality (round-2 final: >40 dB with
    hierarchical-bisection palettes + clip-aware errors; was 35.7 dB)."""
    path = (
        liam_output
        / "texture_ktx2-fps30-1k_baseColor_default"
        / "00000.ktx2"
    )
    ref = transcode_ktx2_etc1s(read_ktx2(path.read_bytes()))[:2]
    blob = encode_ktx2_etc1s(
        ref, num_endpoints=1506, num_selectors=734, kmeans_iters=8
    )
    out = transcode_ktx2_etc1s(read_ktx2(blob))
    mse = ((out.astype(float) - ref.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 40.0, psnr  # locks the palette-quality work
    assert len(blob) < 1.5 * 119_000  # near basisu's own slice bytes


def test_alpha_slices_roundtrip():
    """RGBA video → BasisLZ with per-image alpha slices (basisu
    -force_alpha layout: gray ETC1S slices sharing the global codebooks,
    own CR chain) → rgba transcode recovers color AND alpha."""
    import numpy as np

    from uvol_tpu.codecs.basis.etc1s_encode import encode_ktx2_etc1s
    from uvol_tpu.codecs.basis.transcoder import transcode_ktx2_etc1s
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:32, 0:32]
    frames = np.zeros((3, 32, 32, 4), np.uint8)
    for f in range(3):
        frames[f, ..., 0] = (xx * 8 + f * 16) % 256
        frames[f, ..., 1] = (yy * 8) % 256
        frames[f, ..., 2] = ((xx + yy) * 4) % 256
        frames[f, ..., 3] = (xx * 8) % 256
    blob = encode_ktx2_etc1s(
        frames, num_endpoints=48, num_selectors=48, kmeans_iters=4
    )
    kf = read_ktx2(blob)
    assert all(d.alpha_slice_byte_length > 0 for d in kf.basis_lz.image_descs)
    out = transcode_ktx2_etc1s(kf, target="rgba")
    assert out.shape == (3, 32, 32, 4)
    err = np.abs(out.astype(float) - frames.astype(float))
    assert err[..., :3].mean() < 12, err[..., :3].mean()
    assert err[..., 3].mean() < 12, err[..., 3].mean()
    # etc1 must refuse rather than silently drop alpha
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        transcode_ktx2_etc1s(kf, target="etc1")

    # BC3 = BC4 alpha + BC1 color: decode both halves and compare
    bc3 = transcode_ktx2_etc1s(kf, target="bc1-bc3")[0]  # [N, 4] u32
    assert bc3.shape[1] == 4
    # BC4 alpha decode (a0 > a1 8-step mode, floor interpolation)
    a0 = (bc3[:, 0] & 0xFF).astype(np.int64)
    a1 = ((bc3[:, 0] >> 8) & 0xFF).astype(np.int64)
    field = ((bc3[:, 0].astype(np.uint64) >> 16) & 0xFFFF) | (
        bc3[:, 1].astype(np.uint64) << 16
    )
    pal = np.empty((len(a0), 8), np.int64)
    pal[:, 0] = a0
    pal[:, 1] = a1
    for j in range(2, 8):
        pal[:, j] = ((8 - j) * a0 + (j - 1) * a1) // 7
    j16 = np.arange(16)
    codes = (
        (field[:, None] >> (3 * j16[None, :]).astype(np.uint64)) & np.uint64(7)
    ).astype(np.int64)
    texels = np.take_along_axis(pal, codes, axis=1)  # [N,16]
    h, w = out.shape[1:3]
    alpha_img = (
        texels.reshape(h // 4, w // 4, 4, 4)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )
    aerr = np.abs(alpha_img.astype(float) - out[0, ..., 3].astype(float))
    assert aerr.mean() < 8, aerr.mean()
    # the player's decoder falls back to rgba on alpha files
    from uvol_tpu.player.v2 import default_texture_decoder

    frames_out = default_texture_decoder(blob)
    assert frames_out.shape[-1] == 4


def test_quad_share_endpoints_gated():
    """The tau gate keeps per-block choices on incompatible quads and
    unifies compatible ones; distortion increase is bounded by tau per
    quad by construction."""
    import copy

    from uvol_tpu.codecs.basis.etc1s_encode import (
        build_palettes,
        quad_share_endpoints,
    )
    from uvol_tpu.codecs.basis.transcoder import INTEN_TABLES

    r = np.random.default_rng(17)
    H = W = 32
    img = np.zeros((1, H, W, 3), np.uint8)
    img[0, :, : W // 2] = 30 + r.integers(0, 4, (H, W // 2, 3))
    img[0, :, W // 2 :] = 200 + r.integers(0, 4, (H, W // 2, 3))
    pal = build_palettes(img, 16, 16, 4, rdo=False)
    nby, nbx = H // 4, W // 4
    blocks = np.ascontiguousarray(
        img.reshape(1, nby, 4, nbx, 4, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(1, nby * nbx, 16, 3)
    )

    def total_err(p):
        c5 = p.color5.astype(np.int64)
        base = (c5 << 3) | (c5 >> 2)
        mods = np.array(INTEN_TABLES)[p.inten]
        ep = p.block_endpoint.reshape(-1)
        sel = p.block_selector.reshape(-1)
        codes = p.selectors[sel]
        px = np.clip(
            base[ep][:, None, :]
            + np.take_along_axis(mods[ep], codes, axis=1)[:, :, None],
            0,
            255,
        )
        return ((px - blocks[0].astype(np.int64)) ** 2).sum()

    e_before = total_err(pal)
    p2 = copy.deepcopy(pal)
    quad_share_endpoints(blocks, p2, nby, nbx, tau=512.0)
    e_after = total_err(p2)
    n_quads = (nby // 2) * (nbx // 2)
    assert e_after <= e_before + 512.0 * n_quads
    g = p2.block_endpoint.reshape(nby, nbx)
    q = g.reshape(nby // 2, 2, nbx // 2, 2)
    unified = ((q == q[:, :1, :, :1]).all(axis=(1, 3))).mean()
    assert unified > 0.3  # two flat halves: most quads must unify


def test_quad_share_odd_grid_rejected():
    from uvol_tpu.codecs.basis.etc1s_encode import encode_ktx2_etc1s

    img = np.zeros((1, 20, 20, 3), np.uint8)
    with pytest.raises(ValueError, match="even block grid"):
        encode_ktx2_etc1s(
            img, endpoint_quads=True, num_endpoints=8, num_selectors=8
        )
