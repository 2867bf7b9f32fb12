"""Bit I/O unit tests (reference tier 1: internal/bitio/*_test.go):
boolean arithmetic coder round-trips, VP8L raw-bit round-trips, carry
propagation, EOS behavior."""

import numpy as np
import pytest

from webp_tpu.bitio.bool import BoolReader, BoolWriter
from webp_tpu.bitio.lossless import LosslessBitReader, LosslessBitWriter


def test_bool_roundtrip_random():
    rng = np.random.default_rng(0)
    probs = rng.integers(1, 255, 5000).tolist()
    bits = rng.integers(0, 2, 5000).tolist()
    bw = BoolWriter()
    for p, b in zip(probs, bits):
        bw.put_bit(p, b)
    data = bw.finish()
    br = BoolReader(data)
    got = [br.get_bit(p) for p in probs]
    assert got == bits


def test_bool_roundtrip_biased():
    """Highly skewed probabilities exercise the carry-run path."""
    bw = BoolWriter()
    seq = [(1, 1)] * 300 + [(254, 0)] * 300 + [(128, 1), (128, 0)] * 50
    for p, b in seq:
        bw.put_bit(p, b)
    data = bw.finish()
    br = BoolReader(data)
    assert [br.get_bit(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_values_and_signed():
    bw = BoolWriter()
    bw.put_bits(0x2A, 7)
    bw.put_signed_bits(-13, 5)
    bw.put_signed_bits(13, 5)
    bw.put_bits(0x1FFFF, 17)
    data = bw.finish()
    br = BoolReader(data)
    assert br.get_value(7) == 0x2A
    assert br.get_signed_value(5) == -13
    assert br.get_signed_value(5) == 13
    assert br.get_value(17) == 0x1FFFF


def test_bool_reader_past_end_zero_fill():
    """Reading past the end must not raise (decoder probes trailing bits)."""
    br = BoolReader(b"\x00")
    for _ in range(100):
        br.get_bit(128)


def test_lossless_roundtrip_random():
    rng = np.random.default_rng(1)
    widths = rng.integers(1, 25, 2000).tolist()
    vals = [int(rng.integers(0, 1 << w)) for w in widths]
    bw = LosslessBitWriter()
    for v, w in zip(vals, widths):
        bw.write_bits(v, w)
    data = bw.finish()
    br = LosslessBitReader(data)
    got = [br.read_bits(w) for w in widths]
    assert got == vals


def test_lossless_bit_position_and_eos():
    bw = LosslessBitWriter()
    bw.write_bits(0b1011, 4)
    bw.write_bits(0xFF, 8)
    data = bw.finish()
    br = LosslessBitReader(data)
    assert br.read_bits(4) == 0b1011
    assert br.read_bits(8) == 0xFF
    # Exhausting the remaining padding bits flags EOS rather than raising.
    for _ in range(64):
        br.read_bits(1)
    assert br.is_end_of_stream()


def test_lossless_writer_buffer_splice():
    """append_bits_buffer splices a sub-writer at a non-byte boundary
    (the transform-config search relies on it)."""
    inner = LosslessBitWriter()
    inner.write_bits(0b101, 3)
    inner.write_bits(0x5A, 8)
    nbits = inner.bit_position()
    buf, nb = inner.finish(), nbits
    outer = LosslessBitWriter()
    outer.write_bits(0b11, 2)
    outer.append_bits_buffer(buf, nb)
    outer.write_bits(1, 1)
    data = outer.finish()
    br = LosslessBitReader(data)
    assert br.read_bits(2) == 0b11
    assert br.read_bits(3) == 0b101
    assert br.read_bits(8) == 0x5A
    assert br.read_bits(1) == 1


# --- Huffman encode units (reference tier: encode_huffman_test.go) ------

def _assert_valid_code(counts, limit=15):
    from webp_tpu.lossless.huffman_enc import build_code_lengths, \
        canonical_codes

    lengths = build_code_lengths(counts, limit)
    assert len(lengths) == len(counts)
    nz = [l for c, l in zip(counts, lengths) if c > 0]
    assert all(l == 0 for c, l in zip(counts, lengths) if c == 0)
    assert all(1 <= l <= limit for l in nz)
    if len(nz) >= 2:
        # Kraft equality: a complete prefix code.
        assert sum(1 << (limit - l) for l in nz) == 1 << limit
        codes = canonical_codes(lengths)
        seen = set()
        for l, c in zip(lengths, codes):
            if l == 0:
                continue
            # Prefix-freeness of the canonical assignment (bit-reversed
            # codes): check uniqueness of (length, code) and no prefix
            # relation among the unreversed codewords.
            rev = int(format(c, f"0{l}b")[::-1], 2)
            word = format(rev, f"0{l}b")
            for s in seen:
                assert not s.startswith(word) and not word.startswith(s)
            seen.add(word)


def test_huffman_lengths_uniform():
    _assert_valid_code([10] * 256)


def test_huffman_lengths_skewed():
    # Fibonacci-ish counts force the length limit to engage.
    counts = [0] * 40
    a, b = 1, 1
    for i in range(40):
        counts[i] = a
        a, b = b, a + b
    _assert_valid_code(counts)


def test_huffman_lengths_few_symbols():
    _assert_valid_code([0, 7, 0, 0, 3] + [0] * 27)
    _assert_valid_code([0, 0, 5] + [0] * 10)   # single symbol
    _assert_valid_code([0] * 16)               # empty


def test_huffman_rle_tree_roundtrip_via_decoder():
    """write_huffman_code's RLE tree serialization must be readable by
    the strict decoder table builder: full VP8L round-trip already covers
    it, here a pathological run-heavy length set round-trips alone."""
    import numpy as np
    import webp_tpu
    from tests.conftest import pil_decode_rgba

    # An image engineered for long code-length runs: 200 distinct colors.
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (200, 3), np.uint8)
    img = pal[rng.integers(0, 200, (40, 50))]
    data = webp_tpu.encode(img, lossless=True)
    assert np.array_equal(pil_decode_rgba(data)[..., :3], img)
