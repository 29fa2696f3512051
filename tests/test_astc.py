"""ASTC-LDR codec + UASTC→ASTC transcode tests (VERDICT r2 item 4).

The oracle is Mesa llvmpipe's GL_KHR_texture_compression_astc_ldr
(native/astc_oracle.py) — an independent spec implementation; GL tests
skip gracefully when no EGL context is available. Structural invariants
and transcode parity run everywhere.
"""

import numpy as np
import pytest

from uvol_tpu.codecs.basis import uastc as U
from uvol_tpu.codecs.basis.astc import (
    ASTC_EXACT_MODES,
    _COLOR_RANGES,
    _WEIGHT_RANGES,
    _cem_values,
    _levels,
    decode_astc_blocks,
    ise_bits,
    pack_astc_block,
    pack_void_extent,
    transcode_uastc_to_astc,
    unquantize_color,
    unquantize_weight,
)
from uvol_tpu.native.astc_oracle import decode_astc_blocks_gl

_HAS_GL = decode_astc_blocks_gl(
    np.frombuffer(pack_void_extent([1, 2, 3, 4]), np.uint8)[None]
) is not None


def test_color_unquant_invariants():
    """Every color range's unquant set contains exact 0 and 255 and is
    symmetric under complement (structural spec properties)."""
    for tq in _COLOR_RANGES:
        vals = sorted(unquantize_color(v, tq) for v in range(_levels(tq)))
        assert vals[0] == 0 and vals[-1] == 255, tq
        assert vals == sorted(255 - v for v in vals), tq
        assert len(set(vals)) == _levels(tq), tq


def test_weight_unquant_invariants():
    for tq in set(_WEIGHT_RANGES.values()):
        vals = sorted(unquantize_weight(v, tq) for v in range(_levels(tq)))
        assert vals[0] == 0 and vals[-1] == 64, tq
        assert vals == sorted(64 - v for v in vals), tq
        assert len(set(vals)) == _levels(tq), tq


@pytest.mark.skipif(not _HAS_GL, reason="no EGL/llvmpipe ASTC oracle")
def test_decoder_matches_gl_oracle_sweep():
    """Random blocks across weight ranges, CEMs, partitions, dual plane
    and sub-grids must decode bit-exactly as the independent decoder."""
    r = np.random.default_rng(11)
    batch = []
    for wtq in set(_WEIGHT_RANGES.values()):
        wbits = ise_bits(16, wtq)
        if not (24 <= wbits <= 96):
            continue
        avail = 128 - wbits - 17
        for cem in (0, 4, 6, 8, 12):
            nc = _cem_values(cem)
            ctq = next(
                (t for t in _COLOR_RANGES if ise_bits(nc, t) <= avail), None
            )
            if ctq is None:
                continue
            batch.append(
                pack_astc_block(
                    weight_tq=wtq, color_tq=ctq, cems=[cem],
                    color_values=r.integers(0, _levels(ctq), nc).tolist(),
                    weights=r.integers(0, _levels(wtq), 16).tolist(),
                )
            )
    for parts in (2, 3):
        nc = 6 * parts
        wtq = (0, 0, 1)
        avail = 128 - 16 * 2 - 29  # promoted grid is not used here
        avail = 128 - ise_bits(16, wtq) - 29
        ctq = next(t for t in _COLOR_RANGES if ise_bits(nc, t) <= avail)
        for _ in range(6):
            batch.append(
                pack_astc_block(
                    weight_tq=wtq, color_tq=ctq, cems=[8] * parts,
                    part_index=int(r.integers(0, 1024)),
                    color_values=r.integers(0, _levels(ctq), nc).tolist(),
                    weights=r.integers(0, 2, 16).tolist(),
                )
            )
    for ccs in range(4):
        wtq = (0, 0, 2)
        avail = 128 - ise_bits(32, wtq) - 2 - 17
        ctq = next(t for t in _COLOR_RANGES if ise_bits(8, t) <= avail)
        batch.append(
            pack_astc_block(
                weight_tq=wtq, color_tq=ctq, cems=[12],
                color_values=r.integers(0, _levels(ctq), 8).tolist(),
                weights=r.integers(0, 4, 32).tolist(), dual=True, ccs=ccs,
            )
        )
    for gw, gh in ((2, 2), (3, 3), (2, 4), (4, 2), (3, 4), (2, 3)):
        wtq = (0, 0, 5) if gw * gh < 8 else (0, 0, 4)
        if not (24 <= ise_bits(gw * gh, wtq) <= 96):
            continue
        avail = 128 - ise_bits(gw * gh, wtq) - 17
        ctq = next(t for t in _COLOR_RANGES if ise_bits(6, t) <= avail)
        batch.append(
            pack_astc_block(
                gw=gw, gh=gh, weight_tq=wtq, color_tq=ctq, cems=[8],
                color_values=r.integers(0, _levels(ctq), 6).tolist(),
                weights=r.integers(0, _levels(wtq), gw * gh).tolist(),
            )
        )
    batch.append(np.frombuffer(pack_void_extent([7, 77, 177, 255]), np.uint8))
    blks = np.stack(
        [np.frombuffer(b, np.uint8) if isinstance(b, bytes) else b
         for b in batch]
    )
    mine = decode_astc_blocks(blks)
    ref = decode_astc_blocks_gl(blks)
    assert np.array_equal(mine, ref), np.argwhere(
        (mine != ref).any(axis=(1, 2, 3))
    ).ravel()


def _blocks_for_mode(mode_id, r, n=4):
    m = U.MODES[mode_id]
    nc = U._ncomp(m)
    if m.subsets > 1:
        q0 = r.integers(0, 1 << m.ep_bits, (n, m.subsets, nc))
        q1 = r.integers(0, 1 << m.ep_bits, (n, m.subsets, nc))
        seed = r.integers(0, 1024, n)
    else:
        q0 = r.integers(0, 1 << m.ep_bits, (n, nc))
        q1 = r.integers(0, 1 << m.ep_bits, (n, nc))
        seed = None
    wmain = r.integers(0, m.weight_levels, (n, 16))
    walpha = r.integers(0, m.weight_levels, (n, 16)) if m.dual_plane else None
    return U._pack_mode_blocks(mode_id, q0, q1, wmain, walpha, seed)


@pytest.mark.parametrize("mode_id", sorted(U.MODES))
def test_transcode_mode(mode_id):
    r = np.random.default_rng(100 + mode_id)
    ub = _blocks_for_mode(mode_id, r)
    want = U.decode_uastc_blocks(ub).reshape(-1, 16, 4)
    ab = transcode_uastc_to_astc(ub)
    got = decode_astc_blocks(ab).reshape(-1, 16, 4)
    if mode_id in ASTC_EXACT_MODES:
        assert np.array_equal(got, want)
    else:
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 8
    if _HAS_GL:  # the wire must be real ASTC regardless of exactness
        ref = decode_astc_blocks_gl(ab).reshape(-1, 16, 4)
        assert np.array_equal(got, ref)


def test_transcode_solid():
    r = np.random.default_rng(3)
    bits = np.zeros((3, 128), np.uint8)
    U._put_field(bits, 0, 5, np.full(3, U.MODE_SOLID))
    for c in range(4):
        U._put_field(bits, 5 + 8 * c, 8, r.integers(0, 256, 3))
    ub = U._pack_bits(bits)
    want = U.decode_uastc_blocks(ub)
    ab = transcode_uastc_to_astc(ub)
    got = decode_astc_blocks(ab).reshape(-1, 4, 4, 4)
    assert np.array_equal(got, want)


def test_ktx2_astc_target_end_to_end():
    """encode_uastc_ktx2 → transcode_uastc(target='astc') → real ASTC
    blocks whose decode matches the RGBA decode of the same file (exact
    where the encoder picked exact modes; tight elsewhere)."""
    r = np.random.default_rng(5)
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., :3] = (
        np.linspace(0, 255, 16)[None, :, None]
        + np.linspace(0, 60, 16)[:, None, None]
    ).astype(np.uint8)
    img[..., 3] = 255
    img[4:8, 4:8] = r.integers(0, 256, (4, 4, 4))
    from uvol_tpu.containers.ktx2 import read_ktx2

    blob = U.encode_uastc_ktx2(np.stack([img]))
    f = read_ktx2(blob)
    rgba = U.transcode_uastc(f, target="rgba")
    astc = U.transcode_uastc(f, target="astc")
    assert astc.shape == (1, 16, 16)
    dec = decode_astc_blocks(astc[0])
    got = U.blocks_to_image_rgba(
        dec.reshape(-1, 16, 4), 16, 16
    )
    assert np.abs(got.astype(int) - rgba[0].astype(int)).max() <= 8
    if _HAS_GL:
        ref = decode_astc_blocks_gl(astc[0])
        assert np.array_equal(dec, ref)


def test_player_dispatches_astc_target(monkeypatch):
    """A device advertising astc capability gets real ASTC blocks from
    the player's UASTC texture path (reference FORMAT_OPTIONS row:
    astc-4x4 is UASTC priority 1, KTX2Loader.js:591-697)."""
    import uvol_tpu.player.v2 as v2

    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = np.arange(8)[None, :] * 30
    img[..., 3] = 255
    blob = U.encode_uastc_ktx2(np.stack([img]))
    monkeypatch.setattr(
        v2, "DEVICE_TEXTURE_CAPABILITIES", ("astc", "etc2", "etc1")
    )
    dec = v2.default_texture_decoder(blob)
    assert dec.format == "astc-4x4"
    blocks = np.asarray(dec.data)
    assert blocks.shape == (1, 4, 16)
    rgba = decode_astc_blocks(blocks[0])
    want = U.transcode_uastc(
        __import__("uvol_tpu.containers.ktx2", fromlist=["read_ktx2"]).read_ktx2(blob),
        target="rgba",
    )
    got = U.blocks_to_image_rgba(rgba.reshape(-1, 16, 4), 8, 8)
    assert np.abs(got.astype(int) - want[0].astype(int)).max() <= 8
    # etc-class capabilities now take the decode-and-refit ETC2+EAC
    # words (round-3 blockfit targets); no-capability devices keep the
    # RGBA fallback
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ("etc2", "etc1"))
    dec2 = v2.default_texture_decoder(blob)
    assert dec2.format == "etc2-eac"
    monkeypatch.setattr(v2, "DEVICE_TEXTURE_CAPABILITIES", ())
    dec3 = v2.default_texture_decoder(blob)
    assert dec3.format == "rgba"
