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
