"""Malformed-container matrix (reference tier: container/parser_test.go +
edge_cases_test.go corrupt-input sweeps).

Table-driven structural corruption of otherwise-valid files: every case
must raise a WebPError subclass — never crash, hang, or return pixels.
Well-formed-but-unusual structure (odd padding, unknown chunks, metadata
order) must parse.
"""

import io
import struct

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.container import riff as r
from webp_tpu.container.parser import Parser, get_features
from webp_tpu.container.riff import WebPError


def _simple_lossy():
    img = np.full((32, 24, 3), 128, np.uint8)
    return webp_tpu.encode(img, quality=75)


def _simple_lossless():
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 1] = 200
    return webp_tpu.encode(img, lossless=True)


def _animated():
    frames = [Image.new("RGB", (24, 16), c) for c in
              [(255, 0, 0), (0, 255, 0), (0, 0, 255)]]
    buf = io.BytesIO()
    frames[0].save(buf, format="WEBP", save_all=True,
                   append_images=frames[1:], duration=50, lossless=True)
    return buf.getvalue()


def _with_meta():
    img = np.full((20, 20, 3), 99, np.uint8)
    return webp_tpu.encode(img, lossless=True, iccp=b"\x00" * 40,
                           exif=b"II*\x00rest", xmp=b"<x/>")


def _set_riff_size(data, size):
    return data[:4] + struct.pack("<I", size) + data[8:]


def _first_image_tag(data):
    for tag in (r.VP8, r.VP8L, r.ANMF):
        try:
            _find_chunk(data, tag)
            return tag
        except AssertionError:
            continue
    raise AssertionError("no image chunk")


def _find_chunk(data, tag):
    """Offset of the chunk header for `tag` (first occurrence)."""
    off = 12
    while off + 8 <= len(data):
        if data[off:off + 4] == tag:
            return off
        sz = struct.unpack("<I", data[off + 4:off + 8])[0]
        off += 8 + sz + (sz & 1)
    raise AssertionError(f"{tag} not found")


# ---------------------------------------------------------------------
# Corruptions that MUST be rejected.
# ---------------------------------------------------------------------

CORRUPTIONS = [
    ("riff_size_tiny", lambda d: _set_riff_size(d, 3)),
    ("wrong_form_type", lambda d: d[:8] + b"AVI " + d[12:]),
    ("wrong_riff_magic", lambda d: b"RIFX" + d[4:]),
    ("chunk_size_overruns",
     lambda d: d[:16] + struct.pack("<I", 1 << 30) + d[20:]),
    ("truncated_mid_chunk_header", lambda d: d[:14]),
    ("truncated_first_image_payload",
     lambda d: d[:_find_chunk(d, _first_image_tag(d)) + 12]),
    ("empty_payload_after_header", lambda d: d[:12]),
]


@pytest.fixture(scope="module")
def files():
    return {
        "lossy": _simple_lossy(),
        "lossless": _simple_lossless(),
        "anim": _animated(),
        "meta": _with_meta(),
    }


@pytest.mark.parametrize("name,mutate", CORRUPTIONS)
@pytest.mark.parametrize("kind", ["lossy", "lossless", "anim", "meta"])
def test_structural_corruption_rejected(files, kind, name, mutate):
    bad = mutate(files[kind])
    with pytest.raises(WebPError):
        webp_tpu.decode(bad)


def test_vp8_signature_corrupt(files):
    d = bytearray(files["lossy"])
    off = _find_chunk(bytes(d), r.VP8)
    d[off + 8 + 3] ^= 0xFF  # VP8 sync code byte
    with pytest.raises(WebPError):
        webp_tpu.decode(bytes(d))


def test_vp8l_magic_corrupt(files):
    d = bytearray(files["lossless"])
    off = _find_chunk(bytes(d), r.VP8L)
    d[off + 8] = 0x55  # must be 0x2F
    with pytest.raises(WebPError):
        webp_tpu.decode(bytes(d))


def test_riff_size_overrun_clamped(files):
    """A RIFF size larger than the buffer is clamped to the available
    bytes, not rejected (reference parser.go:66-70)."""
    for kind in ("lossy", "lossless", "meta"):
        d = files[kind]
        grown = _set_riff_size(d, len(d) + 1000)
        assert np.array_equal(webp_tpu.decode(grown), webp_tpu.decode(d))


def test_vp8x_bad_flags_rejected(files):
    """Reserved VP8X flag bits set -> reject (reference parser.go)."""
    d = files["meta"]
    off = _find_chunk(d, r.VP8X)
    bad = bytearray(d)
    bad[off + 8] |= 0xC0  # reserved high bits of the flag byte
    with pytest.raises(WebPError):
        Parser(bytes(bad)).features


def test_vp8x_wrong_size_rejected(files):
    d = files["meta"]
    off = _find_chunk(d, r.VP8X)
    bad = d[:off + 4] + struct.pack("<I", 7) + d[off + 8:off + 8 + 7]
    with pytest.raises(WebPError):
        Parser(bad).features


def test_anmf_frame_outside_canvas(files):
    """ANMF offsets place the frame past the canvas -> reject."""
    d = bytearray(files["anim"])
    off = _find_chunk(bytes(d), r.ANMF)
    # frame_x is a 24-bit field in units of 2px at payload offset 0.
    d[off + 8 + 0] = 0xFF
    d[off + 8 + 1] = 0x7F
    from webp_tpu.animation.animation import decode_animation
    with pytest.raises(WebPError):
        decode_animation(bytes(d))


def test_anim_chunk_without_flag(files):
    """ANIM chunks present but VP8X animation flag clear -> the parser
    must not expose frames as an animation."""
    d = files["anim"]
    off = _find_chunk(d, r.VP8X)
    cleared = bytearray(d)
    cleared[off + 8] &= ~0x02
    try:
        feats = get_features(bytes(cleared))
        assert not feats.has_anim
    except WebPError:
        pass  # outright rejection is also acceptable


def test_zero_canvas_rejected():
    """VP8X canvas 0x0 must be rejected (canvas fields are dim-1, so a
    crafted all-zero VP8X encodes canvas 1x1 with no image chunk)."""
    vp8x = r.Chunk(r.VP8X, bytes(10))
    data = r.assemble_riff([vp8x])
    with pytest.raises(WebPError):
        webp_tpu.decode(data)


# ---------------------------------------------------------------------
# Unusual-but-valid structure that MUST parse.
# ---------------------------------------------------------------------

def test_unknown_chunk_skipped(files):
    """Unknown chunks between known ones are skipped (forward compat)."""
    d = files["meta"]
    off = _find_chunk(d, r.EXIF)
    unknown = b"ABCD" + struct.pack("<I", 5) + b"hello" + b"\x00"  # padded
    patched = d[:off] + unknown + d[off:]
    patched = _set_riff_size(patched, len(patched) - 8)
    feats = get_features(patched)
    assert feats.width == 20 and feats.height == 20
    assert np.array_equal(webp_tpu.decode(patched)[..., :3],
                          webp_tpu.decode(d)[..., :3])


def test_odd_payload_padding_respected(files):
    """Chunks with odd payload sizes carry a pad byte that is not part
    of the payload; parsing must stay aligned across them."""
    d = files["meta"]
    feats = get_features(d)
    p = Parser(d)
    tags = [c.tag for c in p.chunks()]
    assert r.XMP in tags  # XMP b"<x/>"... follows odd-sized EXIF payload
    assert feats.has_exif and feats.has_xmp


def test_trailing_junk_after_riff_size_ignored(files):
    """Bytes past the declared RIFF size are ignored (reference parser
    reads only the declared extent)."""
    d = files["lossless"]
    img = webp_tpu.decode(d)
    assert np.array_equal(webp_tpu.decode(d + b"\xde\xad\xbe\xef"), img)


def test_features_do_not_decode_pixels(files):
    """get_features on a file whose image payload is corrupt must still
    report header-level facts (it must not touch entropy-coded data)."""
    d = bytearray(files["lossy"])
    off = _find_chunk(bytes(d), r.VP8)
    sz = struct.unpack("<I", bytes(d[off + 4:off + 8]))[0]
    for i in range(off + 8 + 16, off + 8 + sz):  # trash the partition body
        d[i] ^= 0xA5
    feats = get_features(bytes(d))
    assert feats.width == 24 and feats.height == 32


def test_max_dimension_features():
    """A 16383-wide VP8L header parses; one past it is rejected."""
    from webp_tpu.bitio.lossless import LosslessBitWriter

    def _hdr(w, h):
        bw = LosslessBitWriter()
        bw.write_bits(0x2F, 8)
        bw.write_bits(w - 1, 14)
        bw.write_bits(h - 1, 14)
        bw.write_bits(0, 1)
        bw.write_bits(0, 3)
        bw.write_bits(0, 32)  # some body bits
        return r.assemble_riff([r.Chunk(r.VP8L, bw.finish())])

    feats = get_features(_hdr(16383, 1))
    assert feats.width == 16383
    # 16384 is not representable in the 14-bit field; area guard instead:
    big = _hdr(16383, 16383)
    try:
        f2 = get_features(big)
        assert f2.width == 16383 and f2.height == 16383
    except WebPError:
        pass  # area-limit rejection also acceptable at parse time


def test_duplicate_metadata_chunks(files):
    """Duplicate ICCP/EXIF: parser keeps working (first or last wins,
    but it must not error or misalign)."""
    d = files["meta"]
    off = _find_chunk(d, r.EXIF)
    sz = struct.unpack("<I", d[off + 4:off + 8])[0]
    chunk = d[off:off + 8 + sz + (sz & 1)]
    patched = d[:off] + chunk + d[off:]
    patched = _set_riff_size(patched, len(patched) - 8)
    feats = get_features(patched)
    assert feats.has_exif
