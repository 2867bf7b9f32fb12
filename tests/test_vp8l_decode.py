"""VP8L lossless decode: bit-exact differential conformance vs libwebp
(via Pillow), playing the role of the reference's cgo testc/ suite
(SURVEY.md §4 tier 3)."""

import io

import numpy as np
import pytest
from PIL import Image

from webp_tpu.container.parser import Parser
from webp_tpu.lossless.decode import decode_vp8l, argb_to_rgba, BitstreamError
from tests.conftest import pil_webp, pil_decode_rgba


def _roundtrip_ok(data: bytes) -> bool:
    fr = Parser(data).frames()[0]
    assert fr.is_lossless
    argb, _ = decode_vp8l(fr.bitstream)
    return np.array_equal(argb_to_rgba(argb), pil_decode_rgba(data))


def test_golden_lossless_fixtures(testdata_dir):
    for name in ("red_4x4_lossless.webp", "gradient_8x8_lossless.webp"):
        data = open(f"{testdata_dir}/{name}", "rb").read()
        assert _roundtrip_ok(data), name


def test_bug_decode_fixture(testdata_dir):
    data = open(f"{testdata_dir}/lossless/bug-decode/input-vp8l.webp", "rb").read()
    assert _roundtrip_ok(data)


@pytest.mark.parametrize("method", [0, 4, 6])
def test_methods(test_png, method):
    im = test_png.resize((96, 72))
    assert _roundtrip_ok(pil_webp(im, lossless=True, method=method))


@pytest.mark.parametrize("colors", [2, 3, 13, 200])
def test_palette_bundling(test_png, colors):
    im = test_png.resize((96, 72)).convert("RGB").convert(
        "P", palette=Image.ADAPTIVE, colors=colors
    ).convert("RGBA")
    assert _roundtrip_ok(pil_webp(im, lossless=True, method=4))


@pytest.mark.parametrize("size", [(1, 1), (1, 17), (17, 1), (3, 5), (64, 64), (65, 33)])
def test_edge_dimensions(test_png, size):
    im = test_png.resize(size)
    assert _roundtrip_ok(pil_webp(im, lossless=True, method=4))


def test_rgb_vs_rgba(test_png):
    assert _roundtrip_ok(pil_webp(test_png.resize((64, 48)).convert("RGB"),
                                  lossless=True, method=5))


def test_medium_image_exact(test_png):
    assert _roundtrip_ok(pil_webp(test_png.resize((192, 144)), lossless=True, method=4))


def test_corrupt_rejected(test_png):
    data = bytearray(pil_webp(test_png.resize((32, 32)), lossless=True))
    fr = Parser(bytes(data)).frames()[0]
    # Truncate the bitstream body.
    with pytest.raises((BitstreamError, ValueError, IndexError)):
        decode_vp8l(fr.bitstream[: max(6, len(fr.bitstream) // 4)])
