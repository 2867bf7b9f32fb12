"""VP8L bitstream-validity matrix (reference tier:
internal/lossless/decode_test.go invalid-stream cases).

Exhaustive single-byte corruption of a small valid stream — the decoder
must either raise WebPError or return a correctly-shaped array, never
crash or hang — plus hand-crafted invalid headers that target specific
validation paths (duplicate transforms, out-of-range color-cache bits,
truncated transform headers).
"""

import numpy as np
import pytest

import webp_tpu
from webp_tpu.bitio.lossless import LosslessBitWriter
from webp_tpu.container import riff as r
from webp_tpu.container.riff import WebPError


@pytest.fixture(scope="module")
def small_stream():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, (12, 10, 3)).astype(np.uint8) * 80
    data = webp_tpu.encode(img, lossless=True)
    return data, img


def test_exhaustive_single_byte_corruption(small_stream):
    """Flip every byte of the VP8L payload in turn: decode must never
    crash; any array it does return must have the original shape."""
    data, img = small_stream
    h, w = img.shape[:2]
    payload_start = data.find(b"VP8L") + 8
    failures = []
    for i in range(payload_start, len(data)):
        # Bytes 0-4 of the payload hold the 14-bit width/height fields: a
        # flip there yields a legitimately different-shaped image (there
        # is no cross-check in a simple VP8L file), so only the no-crash
        # property applies.
        in_dim_header = i - payload_start < 5
        for flip in (0xFF, 0x01, 0x80):
            bad = bytearray(data)
            bad[i] ^= flip
            try:
                out = webp_tpu.decode(bytes(bad))
                if not in_dim_header and out.shape[:2] != (h, w):
                    failures.append((i, flip, out.shape))
            except WebPError:
                pass
            except Exception as e:  # noqa: BLE001 - the assertion target
                failures.append((i, flip, repr(e)))
    assert not failures, failures[:5]


def _vp8l_file(body_bits):
    """Wraps hand-written VP8L body bits (after the 5-byte header) in a
    container. body_bits: list of (value, nbits)."""
    bw = LosslessBitWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(10 - 1, 14)
    bw.write_bits(12 - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    for v, n in body_bits:
        bw.write_bits(v, n)
    return r.assemble_riff([r.Chunk(r.VP8L, bw.finish())])


def test_duplicate_transform_rejected():
    """SUBTRACT_GREEN twice: each transform may appear at most once
    (reference decode_transform.go duplicate check)."""
    data = _vp8l_file([
        (1, 1), (2, 2),   # transform: SUBTRACT_GREEN
        (1, 1), (2, 2),   # duplicate
        (0, 1),           # no more transforms
    ])
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


def test_color_cache_bits_out_of_range():
    """color_cache_bits is 4 bits wide but only 1..11 are valid."""
    for bad_bits in (12, 14, 15):
        data = _vp8l_file([
            (0, 1),          # no transforms
            (1, 1),          # color cache present
            (bad_bits, 4),   # invalid size
            (0, 1),          # no meta-huffman
        ])
        with pytest.raises(WebPError):
            webp_tpu.decode(data)


def test_truncated_after_transform_bit():
    """Stream ends right after announcing a transform."""
    data = _vp8l_file([(1, 1)])
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


def test_truncated_predictor_transform_header():
    """PREDICTOR transform announced, then nothing (its tile-bits field
    and entropy-coded tile image are missing)."""
    data = _vp8l_file([(1, 1), (0, 2)])
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


def test_empty_vp8l_payload():
    data = r.assemble_riff([r.Chunk(r.VP8L, b"")])
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


def test_header_only_vp8l_payload():
    """Valid 5-byte header, zero body bits."""
    data = _vp8l_file([])
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


def test_oversubscribed_huffman_rejected():
    """A literal Huffman tree whose declared code lengths oversubscribe
    the Kraft budget must be rejected by the canonical-table builder.

    Simple-code path: 'simple' header with 2 symbols works; here we use
    the full code-length path with lengths that oversubscribe. The code
    -length alphabet itself is given 3-bit lengths for the first few
    entries; all-equal small lengths for 19 symbols oversubscribe."""
    body = [
        (0, 1),   # no transforms
        (0, 1),   # no color cache
        (0, 1),   # no meta-huffman (single group)
        # Huffman group: 5 trees. First (green) tree: full code-length
        # path: simple=0, then num_code_lengths = 19 (4 bits: 19-4=15),
        # then 19 3-bit code-length-code lengths of 1 each --
        # oversubscribed (only 2 codes of length 1 fit).
        (0, 1),          # not simple
        (15, 4),         # num_code_lengths = 4 + 15 = 19
    ] + [(1, 3)] * 19
    data = _vp8l_file(body)
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


def test_distance_before_window_start():
    """Back-reference distances that reach before pixel 0 must be
    rejected (or the stream must fail validation earlier); exercised via
    corruption of a known LZ77-heavy stream."""
    img = np.tile(np.arange(0, 250, 10, dtype=np.uint8)[None, :, None],
                  (12, 1, 3))
    data = webp_tpu.encode(img, lossless=True)
    payload_start = data.find(b"VP8L") + 8
    # Corrupt the tail third (token area) aggressively; every outcome
    # must be WebPError or a correctly-shaped image.
    for i in range(payload_start + 2 * (len(data) - payload_start) // 3,
                   len(data)):
        bad = bytearray(data)
        bad[i] = 0xFF
        try:
            out = webp_tpu.decode(bytes(bad))
            assert out.shape[:2] == img.shape[:2]
        except WebPError:
            pass
