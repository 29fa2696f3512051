"""Spec-structured UASTC wire (codecs/basis/uastc_spec.py).

Locks the three derivation pillars: (1) every mode's endpoint range is
the ASTC-inferred one (the subset property), (2) pack/parse roundtrips
every field bit-exactly, (3) decode == ASTC decode of the VERBATIM
repack for every mode — including against Mesa's independent GL ASTC
decoder when available. Plus container dispatch (spec default, legacy
marker honored) and encoder sanity.
"""

import numpy as np
import pytest

from uvol_tpu.codecs.basis import uastc_spec as S
from uvol_tpu.codecs.basis.astc import _levels, decode_astc_blocks


def _random_fields(mode_id, B, rng):
    lay = S.mode_layouts()[mode_id]
    cfg = lay.cfg
    L = _levels(lay.color_tq)
    cq = rng.integers(0, L, (B, cfg.subsets, 2 * cfg.ncomp))
    wq = rng.integers(0, 1 << cfg.weight_bits, (B, 16))
    wq2 = (
        rng.integers(0, 1 << cfg.weight_bits, (B, 16))
        if cfg.planes == 2
        else None
    )
    seed = rng.integers(0, 1024, B) if cfg.subsets > 1 else None
    ccs = None
    if cfg.planes == 2:
        ccs = rng.integers(0, 3, B) if cfg.cem == 8 else np.full(B, 3)
    return cq, wq, wq2, seed, ccs


def test_mode_ranges_are_astc_inferred():
    """The defining UASTC property: each mode's endpoint range equals
    what ASTC's decoder infers for the equivalent block configuration —
    none of the 18 ranges is a free parameter."""
    from uvol_tpu.codecs.basis.astc import _COLOR_RANGES, ise_bits

    for mode_id, lay in S.mode_layouts().items():
        cfg = lay.cfg
        wbits = ise_bits(cfg.n_weights, cfg.weight_tq)
        start = 17 if cfg.subsets == 1 else 29
        avail = 128 - wbits - (2 if cfg.planes == 2 else 0) - start
        ncolor = cfg.ncomp * 2 * cfg.subsets
        inferred = next(
            tq for tq in _COLOR_RANGES if ise_bits(ncolor, tq) <= avail
        )
        assert inferred == lay.color_tq, mode_id


def test_mode_codes_prefix_free():
    codes = S.mode_codes()
    assert len(codes) == 19
    # LSB-first prefix property: no code is the low bits of another
    for m1, (c1, l1) in codes.items():
        for m2, (c2, l2) in codes.items():
            if m1 == m2:
                continue
            if l1 <= l2:
                assert (c2 & ((1 << l1) - 1)) != c1, (m1, m2)
    # layout sums to exactly 128 bits for every mode
    for mode_id, lay in S.mode_layouts().items():
        cfg = lay.cfg
        assert lay.weight_pos + cfg.n_weights * cfg.weight_bits == 128


@pytest.mark.parametrize("mode_id", sorted(S.MODE_CONFIGS))
def test_pack_parse_roundtrip(mode_id):
    rng = np.random.default_rng(7 + mode_id)
    cq, wq, wq2, seed, ccs = _random_fields(mode_id, 48, rng)
    blocks = S.pack_spec_blocks(mode_id, cq, wq, wq2, seed, ccs)
    f = S.parse_mode_payload(S._bits_of(blocks), mode_id)
    assert (f.cq == cq).all()
    assert (f.wq == wq).all()
    if wq2 is not None:
        assert (f.wq2 == wq2).all()
    if seed is not None:
        assert (f.seed == seed).all()
    if ccs is not None:
        assert (f.ccs == ccs).all()


@pytest.mark.parametrize("mode_id", sorted(S.MODE_CONFIGS))
def test_decode_equals_verbatim_astc_decode(mode_id):
    """decode_spec_blocks == decode_astc_blocks(spec_to_astc(x)) for
    random field values — which exercise the CEM blue-contract + swap
    branch too, so the ASTC semantics are pinned end to end."""
    rng = np.random.default_rng(100 + mode_id)
    cq, wq, wq2, seed, ccs = _random_fields(mode_id, 48, rng)
    blocks = S.pack_spec_blocks(mode_id, cq, wq, wq2, seed, ccs)
    ours = S.decode_spec_blocks(blocks)
    astc = S.spec_to_astc(blocks)
    ref = decode_astc_blocks(astc).reshape(ours.shape)
    assert np.array_equal(ours, ref)


def test_solid_blocks():
    rgba = np.array([[1, 2, 3, 4], [250, 0, 128, 255]], np.uint8)
    blocks = S.pack_solid_blocks(rgba)
    dec = S.decode_spec_blocks(blocks)
    assert (dec == rgba[:, None, None, :]).all()
    astc = S.spec_to_astc(blocks)
    ref = decode_astc_blocks(astc).reshape(dec.shape)
    assert np.array_equal(dec, ref)


def test_encoder_quality_and_exactness():
    rng = np.random.default_rng(11)
    px = np.zeros((24, 4, 4, 4), np.uint8)
    for b in range(24):
        base = rng.integers(0, 200, 4)
        grad = rng.integers(0, 14, 4)
        for y in range(4):
            for x in range(4):
                px[b, y, x] = np.clip(base + grad * (y * 4 + x) // 4, 0, 255)
    px[..., 3] = 255
    blocks = S.encode_spec_blocks(px)
    dec = S.decode_spec_blocks(blocks)
    mse = ((dec.astype(float) - px.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 38
    # alpha content routes to RGBA modes and stays reasonable
    pxa = px.copy()
    pxa[..., 3] = rng.integers(100, 256, (24, 4, 4))
    da = S.decode_spec_blocks(S.encode_spec_blocks(pxa))
    msea = ((da.astype(float) - pxa.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(msea, 1e-9)) > 25


def test_encoder_never_trips_blue_contract():
    """Emitted blocks keep sum(e1_rgb) >= sum(e0_rgb) per subset, so a
    conformant ASTC decoder never takes the blue-contract branch on our
    output (decode already proves equality; this pins the invariant)."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (64, 4, 4, 4)).astype(np.uint8)
    px[..., 3] = 255
    for mode_id in (0, 5, 1, 18, 2, 3, 6):
        cq, wq, wq2, seed, ccs = S._fit_mode_spec(
            px.reshape(64, 16, 4).astype(np.int64), mode_id
        )
        lay = S.mode_layouts()[mode_id]
        from uvol_tpu.codecs.basis.astc import _color_unquant_lut

        v8 = _color_unquant_lut(tuple(lay.color_tq))[cq]
        s0 = v8[..., 0] + v8[..., 2] + v8[..., 4]
        s1 = v8[..., 1] + v8[..., 3] + v8[..., 5]
        assert (s1 >= s0).all(), mode_id


def test_container_spec_default_no_marker():
    from uvol_tpu.codecs.basis.uastc import (
        UASTC_PROFILE_KEY,
        encode_uastc_ktx2,
        transcode_uastc,
    )
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([xx * 12 + 30, yy * 12 + 20, (xx + yy) * 6],
                   -1).astype(np.uint8)[None]
    spec = encode_uastc_ktx2(img)
    fs = read_ktx2(spec)
    assert UASTC_PROFILE_KEY not in fs.key_value
    rgba = transcode_uastc(fs)
    mse = ((rgba[0, ..., :3].astype(float) - img[0].astype(float)) ** 2
           ).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30
    # astc target is the verbatim repack — decodes identically
    astc = transcode_uastc(fs, target="astc")
    from uvol_tpu.codecs.basis.uastc import blocks_to_image_rgba

    img2 = blocks_to_image_rgba(
        decode_astc_blocks(astc[0]).reshape(-1, 4, 4, 4), 16, 16
    )
    assert np.array_equal(img2, rgba[0])
    # bc7 / refit targets produce plausibly-shaped words
    assert transcode_uastc(fs, target="bc7").shape == (1, 16, 16)
    assert transcode_uastc(fs, target="etc1").shape == (1, 16, 2)


def test_container_legacy_marker_still_reads():
    from uvol_tpu.codecs.basis.uastc import (
        UASTC_PROFILE_KEY,
        encode_uastc_ktx2,
        transcode_uastc,
    )
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([xx * 12 + 30, yy * 12 + 20, np.full_like(xx, 60)],
                   -1).astype(np.uint8)[None]
    leg = encode_uastc_ktx2(img, wire="legacy")
    fl = read_ktx2(leg)
    assert UASTC_PROFILE_KEY in fl.key_value
    rgba = transcode_uastc(fl)
    mse = ((rgba[0, ..., :3].astype(float) - img[0].astype(float)) ** 2
           ).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30


def test_spec_to_astc_vs_gl_oracle():
    """The verbatim repack of every mode decodes bit-identically in
    Mesa's independent GL ASTC decoder (skips without a GL context)."""
    from uvol_tpu.native.astc_oracle import decode_astc_blocks_gl

    probe = decode_astc_blocks_gl(np.zeros((1, 16), np.uint8))
    if probe is None:
        pytest.skip("no GL oracle")
    rng = np.random.default_rng(42)
    for mode_id in sorted(S.MODE_CONFIGS):
        cq, wq, wq2, seed, ccs = _random_fields(mode_id, 16, rng)
        blocks = S.pack_spec_blocks(mode_id, cq, wq, wq2, seed, ccs)
        astc = S.spec_to_astc(blocks)
        ref = decode_astc_blocks_gl(astc)
        ours = S.decode_spec_blocks(blocks).reshape(ref.shape)
        assert np.array_equal(ours, ref), mode_id


def test_invalid_mode_code_raises():
    # an all-ones prefix does not decode to any canonical code
    blk = np.full((1, 16), 0xFF, np.uint8)
    codes = {c & ((1 << ln) - 1): m for m, (c, ln) in S.mode_codes().items()}
    prefix = 0x7F
    matches = [
        m for m, (c, ln) in S.mode_codes().items()
        if (prefix & ((1 << ln) - 1)) == c
    ]
    if not matches:
        with pytest.raises(ValueError):
            S.decode_spec_blocks(blk)


def test_foreign_speclike_file_warns(tmp_path):
    """A marker-less UASTC file WITHOUT uvol_tpu's KTXwriter key is
    genuinely foreign (real basisu output): the spec path must emit a
    RuntimeWarning about the reconstructed-layout risk, and decode
    errors must carry the reconstruction hint (r4 advisor, medium)."""
    import warnings

    from uvol_tpu.codecs.basis.uastc import encode_uastc_ktx2, transcode_uastc
    from uvol_tpu.containers.ktx2 import read_ktx2

    yy, xx = np.mgrid[0:8, 0:8]
    img = np.stack([xx * 20, yy * 20, xx * 0 + 90], -1).astype(np.uint8)[None]
    spec = encode_uastc_ktx2(img)
    fs = read_ktx2(spec)
    # our own file: KTXwriter present -> NO warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        transcode_uastc(fs)
    # simulate a foreign file: strip the writer key
    fs.key_value.pop(b"KTXwriter", None)
    with pytest.warns(RuntimeWarning, match="reconstructed spec layout"):
        transcode_uastc(fs)
    # a decode error on a foreign file carries the reconstruction hint
    blob = bytearray(fs.level_payload(0))
    blob[0] = 0xFF  # trash the first block's mode code bits
    fs2 = read_ktx2(spec)
    fs2.key_value.pop(b"KTXwriter", None)
    fs2.level_payload = lambda i, _b=bytes(blob): _b  # type: ignore
    with pytest.warns(RuntimeWarning):
        try:
            transcode_uastc(fs2)
        except Exception as e:
            assert "reconstructed spec layout" in str(e)


def test_fit_mode6_blocks_matches_scalar():
    """Vectorized BC7 mode-6 refit is byte-identical to the per-block
    path (r4 advisor, low: the spec-wire bc7 target's hot loop)."""
    from uvol_tpu.codecs.basis.bc7 import _fit_mode6, fit_mode6_blocks

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (64, 4, 4, 4)).astype(np.uint8)
    px[0] = 128          # flat block: denom == 0 branch
    px[1, ..., 3] = 255  # opaque
    px[2] = 0
    px[3] = 255
    got = fit_mode6_blocks(px)
    for i in range(len(px)):
        ref = np.frombuffer(_fit_mode6(px[i]), np.uint8)
        np.testing.assert_array_equal(got[i], ref, err_msg=f"block {i}")


# ---------------------------------------------------------------------------
# Foreign-shaped wire fuzz (VERDICT r4 item 6)
# ---------------------------------------------------------------------------
#
# The spec layout is the path REAL basisu files take (marker-less wire);
# its 3 reconstruction cells mean foreign blocks can be arbitrarily
# shaped relative to our packer's output. The contract fuzzed here: any
# 128-bit pattern either decodes to well-formed RGBA or raises
# ValueError — never another exception class, never a crash or hang.


def test_fuzz_random_blocks_decode_or_clean_error():
    """Uniformly random blocks hit reserved mode prefixes, out-of-range
    BISE trit/quint values, and every payload field boundary."""
    rng = np.random.default_rng(20250819)
    ok = bad = 0
    blocks = rng.integers(0, 256, (1500, 16)).astype(np.uint8)
    for blk in blocks:
        try:
            out = S.decode_spec_blocks(blk[None])
        except ValueError:
            bad += 1
            continue
        ok += 1
        assert out.shape == (1, 4, 4, 4) and out.dtype == np.uint8
    # both outcomes must actually be exercised for the fuzz to mean much
    assert ok > 0 and bad > 0, (ok, bad)


def test_fuzz_bitflips_on_valid_wire():
    """Single/multi bit flips on genuine encoder output (all mode
    classes present) decode or raise ValueError, block-granular."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack(
        [xx * 16, yy * 16, (xx * yy) % 256, np.full_like(xx, 255)], -1
    ).astype(np.uint8)
    img[0:4, 0:4] = 200  # solid block
    img[yy > 8, 3] = rng.integers(0, 255, 7 * 16)  # alpha modes
    px = (
        img.reshape(4, 4, 4, 4, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(16, 4, 4, 4)
    )
    blocks = S.encode_spec_blocks(px).copy()
    for _ in range(400):
        b = blocks.copy()
        for _ in range(int(rng.integers(1, 5))):
            i = int(rng.integers(0, b.size))
            b.reshape(-1)[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = S.decode_spec_blocks(b)
            assert out.shape == (len(blocks), 4, 4, 4)
        except ValueError:
            pass


def test_fuzz_solid_block_trailing_bits():
    """Void-extent-class (solid) variants: foreign encoders may leave
    arbitrary bits after the RGBA body — decode must honor the color
    and ignore the tail."""
    rng = np.random.default_rng(3)
    code, ln = S.mode_codes()[S.MODE_SOLID]
    for _ in range(50):
        rgba = rng.integers(0, 256, 4)
        bits = np.zeros(128, np.uint8)
        for i in range(ln):
            bits[i] = (code >> i) & 1
        for c in range(4):
            for i in range(8):
                bits[ln + 8 * c + i] = (int(rgba[c]) >> i) & 1
        # random tail after the body
        bits[ln + 32 :] = rng.integers(0, 2, 128 - ln - 32)
        blk = np.packbits(
            bits.reshape(16, 8)[:, ::-1], axis=1
        ).reshape(1, 16)
        out = S.decode_spec_blocks(blk)
        assert (out[0] == rgba[None, None]).all()


def test_fuzz_truncated_ktx2_through_spec_path():
    """Truncation ladder over a spec-wire KTX2 file: the container +
    spec decode path fails with ValueError-class errors, never crashes
    (the whole-file transcode is the player-facing surface)."""
    from uvol_tpu.codecs.basis.uastc import encode_uastc_ktx2, transcode_uastc
    from uvol_tpu.containers.ktx2 import read_ktx2

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (2, 16, 16, 4)).astype(np.uint8)
    blob = encode_uastc_ktx2(img)
    transcode_uastc(read_ktx2(blob))  # sanity: intact file decodes
    for cut in range(1, len(blob), max(1, len(blob) // 97)):
        try:
            transcode_uastc(read_ktx2(blob[:cut]))
        except (ValueError, KeyError, IndexError, EOFError):
            pass
        # any other exception class propagates and fails the test


def test_fuzz_random_blocks_all_targets():
    """Fuzz-surviving foreign-shaped content must transcode to every
    target without crashing (they share the spec decode front)."""
    from uvol_tpu.codecs.basis.uastc import encode_uastc_ktx2, transcode_uastc
    from uvol_tpu.containers.ktx2 import read_ktx2
    from uvol_tpu.containers.ktx2 import write_ktx2  # noqa: F401  (doc)

    rng = np.random.default_rng(5)
    # corrupt a real file's payload in place so the container stays valid
    img = rng.integers(0, 256, (1, 16, 16, 4)).astype(np.uint8)
    blob = encode_uastc_ktx2(img, zstd=False)
    f = read_ktx2(blob)
    payload = bytearray(f.level_payload(0))
    for _ in range(200):
        payload[rng.integers(0, len(payload))] = rng.integers(0, 256)
    blocks = np.frombuffer(bytes(payload), np.uint8).reshape(-1, 16)
    try:
        rgba = S.decode_spec_blocks(blocks)
    except ValueError:
        return  # clean refusal before any target runs
    assert rgba.dtype == np.uint8
    for target in ("astc", "bc7", "etc1", "bc1-bc3"):
        try:
            transcode_uastc(f, target=target)
        except ValueError:
            pass
