import numpy as np
import pytest

from uvol_tpu.codecs.buffer import DecoderBuffer, EncoderBuffer
from uvol_tpu.codecs.rans import (
    RansBitDecoder,
    RansBitEncoder,
    RansSymbolDecoder,
    RansSymbolEncoder,
    decode_probability_table,
    encode_probability_table,
    normalize_probabilities,
    rans_precision_bits,
)
from uvol_tpu.codecs.symbol_coding import (
    RAW,
    TAGGED,
    convert_signed_to_symbols,
    convert_symbols_to_signed,
    decode_symbols,
    encode_symbols,
)


def test_precision_bits_clamp():
    assert rans_precision_bits(1) == 12
    assert rans_precision_bits(5) == 12
    assert rans_precision_bits(10) == 15
    assert rans_precision_bits(18) == 20
    assert rans_precision_bits(30) == 20


def test_normalize_probabilities():
    probs = normalize_probabilities([5, 0, 1, 100], 1 << 12)
    assert sum(probs) == 1 << 12
    assert probs[1] == 0 and probs[2] >= 1


@pytest.mark.parametrize("pbits", [12, 15, 20])
def test_probability_table_roundtrip(pbits):
    r = np.random.default_rng(0)
    counts = r.integers(0, 1000, 300)
    counts[50:120] = 0  # exercise zero-run tokens
    probs = normalize_probabilities(counts.tolist(), 1 << pbits)
    out = EncoderBuffer()
    encode_probability_table(probs, out)
    got = decode_probability_table(DecoderBuffer(out.getvalue()))
    assert got == probs


@pytest.mark.parametrize("n,alphabet", [(1, 2), (100, 5), (5000, 256), (20000, 1024)])
def test_rans_symbol_roundtrip(n, alphabet):
    r = np.random.default_rng(n)
    # skewed distribution, like prediction residuals
    syms = np.minimum(
        r.geometric(0.05, n) - 1, alphabet - 1
    ).astype(np.uint32)
    counts = np.bincount(syms, minlength=alphabet)
    pbits = rans_precision_bits(max(1, int(syms.max()).bit_length()))
    enc = RansSymbolEncoder(counts.tolist(), pbits)
    out = EncoderBuffer()
    enc.encode_all(syms.tolist(), out)
    dec = RansSymbolDecoder(DecoderBuffer(out.getvalue()), pbits)
    got = dec.decode_all(n)
    np.testing.assert_array_equal(got, syms)


def test_rans_bit_roundtrip():
    r = np.random.default_rng(7)
    for p_one in (0.02, 0.5, 0.93):
        bits = (r.uniform(size=4000) < p_one).astype(int).tolist()
        enc = RansBitEncoder()
        for b in bits:
            enc.encode_bit(b)
        out = EncoderBuffer()
        enc.flush(out)
        dec = RansBitDecoder(DecoderBuffer(out.getvalue()))
        got = [dec.decode_bit() for _ in bits]
        assert got == bits


@pytest.mark.parametrize("scheme", [RAW, TAGGED])
def test_symbol_coding_roundtrip(scheme):
    r = np.random.default_rng(scheme)
    residuals = (r.standard_normal(3 * 4096) * 50).astype(np.int32)
    syms = convert_signed_to_symbols(residuals)
    out = EncoderBuffer()
    encode_symbols(syms, 3, out, scheme=scheme)
    buf = DecoderBuffer(out.getvalue())
    got = decode_symbols(len(syms), 3, buf)
    np.testing.assert_array_equal(got, syms)
    np.testing.assert_array_equal(convert_symbols_to_signed(got), residuals)
    assert buf.remaining() == 0  # consumed exactly


def test_symbol_coding_compresses():
    r = np.random.default_rng(3)
    residuals = (r.standard_normal(3 * 10000) * 8).astype(np.int32)
    syms = convert_signed_to_symbols(residuals)
    out = EncoderBuffer()
    encode_symbols(syms, 3, out)
    raw_bytes = syms.size * 4
    assert len(out.getvalue()) < raw_bytes * 0.25  # entropy ≪ raw


def test_zigzag_signed():
    v = np.array([0, -1, 1, -2, 2, -(2**20), 2**20], np.int32)
    s = convert_signed_to_symbols(v)
    np.testing.assert_array_equal(convert_symbols_to_signed(s), v)
