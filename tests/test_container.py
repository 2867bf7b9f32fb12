"""Container parse/assemble tests (tier-1 unit + golden fixtures).

Mirrors the reference test strategy (SURVEY.md §4: container/parser_test.go).
"""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from webp_tpu.container import riff as r
from webp_tpu.container.parser import Parser, get_features, parse_vp8l_dimensions
from tests.conftest import pil_webp


def test_golden_fixture_features(testdata_dir):
    cases = {
        "red_4x4_lossless.webp": (4, 4, r.FormatType.VP8L),
        "red_4x4_lossy.webp": (4, 4, r.FormatType.VP8),
        "blue_16x16_lossy.webp": (16, 16, r.FormatType.VP8),
        "gradient_8x8_lossless.webp": (8, 8, r.FormatType.VP8L),
    }
    for name, (w, h, fmt) in cases.items():
        data = open(f"{testdata_dir}/{name}", "rb").read()
        f = get_features(data)
        assert (f.width, f.height, f.format) == (w, h, fmt), name


def test_vp8l_features(test_png):
    data = pil_webp(test_png, lossless=True)
    f = get_features(data)
    assert f.width == 768 and f.height == 576
    assert f.format in (r.FormatType.VP8L, r.FormatType.VP8X)
    # An image with real transparency must surface has_alpha.
    im = Image.new("RGBA", (10, 10), (255, 0, 0, 128))
    f2 = get_features(pil_webp(im, lossless=True))
    assert f2.has_alpha


def test_animation_features(test_png):
    frames = [test_png.resize((64, 48)), test_png.resize((64, 48)).rotate(90)]
    buf = io.BytesIO()
    frames[0].save(buf, format="WEBP", save_all=True, append_images=frames[1:],
                   duration=100, loop=3)
    f = get_features(buf.getvalue())
    assert f.has_anim
    assert f.loop_count == 3
    p = Parser(buf.getvalue())
    assert len(p.frames()) == 2
    assert p.frames()[0].duration_ms == 100


def test_truncated_inputs_rejected(testdata_dir):
    data = open(f"{testdata_dir}/red_4x4_lossless.webp", "rb").read()
    for cut in (0, 4, 11, 13, len(data) // 2):
        with pytest.raises(r.WebPError):
            Parser(data[:cut])


def test_garbage_rejected():
    with pytest.raises(r.WebPError):
        Parser(b"RIFF\x00\x00\x00\x00JUNK" + b"\x00" * 100)
    with pytest.raises(r.WebPError):
        Parser(b"not a webp file at all, definitely")


def test_chunk_roundtrip():
    chunks = [r.Chunk(r.ICCP, b"\x01\x02\x03"), r.Chunk(r.XMP, b"<x/>")]
    blob = r.assemble_riff(chunks)
    assert blob[:4] == r.RIFF and blob[8:12] == r.WEBP
    # Odd-size payload padded to even.
    assert len(blob) % 2 == 0
    tag, size = r.read_chunk_header(blob, 12)
    assert tag == r.ICCP and size == 3


def test_vp8l_dim_parsing():
    # 14-bit dims round-trip through a synthetic header.
    w, h = 1536, 1024
    bits = (w - 1) | ((h - 1) << 14) | (1 << 28)
    hdr = bytes([0x2F]) + struct.pack("<I", bits)
    assert parse_vp8l_dimensions(hdr) == (w, h, True)


def test_vp8x_alpha_metadata_roundtrip():
    """Driver config 4: lossless method 6 + ALPH alpha + ICC/EXIF metadata
    round-trip in a single extended file, cross-checked with libwebp."""
    import io

    import numpy as np
    from PIL import Image

    import webp_tpu
    from tests.conftest import pil_decode_rgba
    from webp_tpu.container.parser import Parser

    img = np.array(Image.open("/root/reference/testdata/test.png")
                   .convert("RGBA").resize((80, 56)))
    img[..., 3] = np.linspace(40, 255, 56, dtype=np.uint8)[:, None]

    # Lossless m6 + metadata.
    data = webp_tpu.encode(img, lossless=True, method=6,
                           iccp=b"fake-icc-profile", exif=b"EXIF\x00data",
                           xmp=b"<xmp/>")
    p = Parser(data)
    assert p.parsed.iccp == b"fake-icc-profile"
    assert p.parsed.exif == b"EXIF\x00data"
    assert p.parsed.xmp == b"<xmp/>"
    assert np.array_equal(pil_decode_rgba(data), img)   # libwebp bit-exact
    assert np.array_equal(webp_tpu.decode(data), img)

    # Lossy + ALPH alpha plane + metadata.
    data = webp_tpu.encode(img, quality=80, exif=b"E2")
    p = Parser(data)
    assert p.features.has_alpha and p.parsed.exif == b"E2"
    ref = pil_decode_rgba(data)
    assert np.array_equal(webp_tpu.decode(data), ref)
    a_err = np.abs(ref[..., 3].astype(int) - img[..., 3].astype(int))
    assert a_err.max() <= 1  # lossless-coded alpha plane


def test_decode_libwebp_lossy_alpha():
    """ALPH decode conformance on libwebp-produced lossy+alpha files."""
    import io

    import numpy as np
    from PIL import Image

    import webp_tpu
    from tests.conftest import pil_decode_rgba

    rng = np.random.default_rng(2)
    img = np.array(Image.open("/root/reference/testdata/test.png")
                   .convert("RGBA").resize((64, 48)))
    img[..., 3] = rng.integers(0, 256, (48, 64), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, format="WEBP", quality=75)
    data = buf.getvalue()
    assert np.array_equal(webp_tpu.decode(data), pil_decode_rgba(data))
