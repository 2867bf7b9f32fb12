"""VP8 lossy decode: pixel-exact differential conformance vs libwebp (Pillow).

Covers the full pipeline: header/mode/token parse, WHT+IDCT, all intra
predictors, simple+complex loop filter, fancy upsampling, YUV->RGB, ALPH.
"""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.container.parser import Parser
from webp_tpu.lossy.decode import decode_vp8_rgba, VP8Error
from tests.conftest import pil_webp, pil_decode_rgba


def _exact(data: bytes) -> bool:
    return np.array_equal(webp_tpu.decode_rgba(data), pil_decode_rgba(data))


def test_golden_lossy_fixtures(testdata_dir):
    for name in ("red_4x4_lossy.webp", "blue_16x16_lossy.webp"):
        data = open(f"{testdata_dir}/{name}", "rb").read()
        assert _exact(data), name


@pytest.mark.parametrize("quality", [5, 40, 75, 95])
def test_quality_sweep(test_png, quality):
    im = test_png.convert("RGB").resize((64, 48))
    assert _exact(pil_webp(im, lossless=False, quality=quality))


@pytest.mark.parametrize("method", [0, 4, 6])
def test_method_sweep(test_png, method):
    im = test_png.convert("RGB").resize((80, 64))
    assert _exact(pil_webp(im, lossless=False, quality=70, method=method))


@pytest.mark.parametrize("size", [(16, 16), (1, 1), (17, 33), (33, 17), (48, 97)])
def test_edge_dimensions(test_png, size):
    im = test_png.convert("RGB").resize(size)
    assert _exact(pil_webp(im, lossless=False, quality=60))


def test_lossy_with_alpha(test_png):
    im = test_png.resize((64, 48)).convert("RGBA")
    a = np.array(im)
    a[..., 3] = ((np.arange(48)[:, None] * 5 + np.arange(64)[None, :]) % 256).astype(np.uint8)
    data = pil_webp(Image.fromarray(a), lossless=False, quality=75, exact=True)
    assert _exact(data)


def test_medium_image(test_color_png):
    im = test_color_png.resize((160, 120))
    assert _exact(pil_webp(im, lossless=False, quality=75))


def test_not_keyframe_rejected(test_png):
    data = pil_webp(test_png.convert("RGB").resize((32, 32)), lossless=False)
    fr = Parser(data).frames()[0]
    bad = bytearray(fr.bitstream)
    bad[0] |= 1  # set inter-frame bit
    from webp_tpu.container.riff import WebPError

    with pytest.raises(WebPError):
        decode_vp8_rgba(bytes(bad))


def test_truncated_tokens_rejected(test_png):
    data = pil_webp(test_png.convert("RGB").resize((64, 64)), lossless=False, quality=90)
    fr = Parser(data).frames()[0]
    with pytest.raises((VP8Error, Exception)):
        decode_vp8_rgba(fr.bitstream[: len(fr.bitstream) // 3])


def test_loop_filter_simd_selftest():
    """The AVX2 loop-filter edges must be bit-exact with the scalar
    reference filters across (thresh, ithresh, hev, inner) shapes
    (vp8_dec.cc vp8_filter_selftest; trivially 0 on non-AVX2 builds)."""
    import ctypes, os
    import webp_tpu
    so = os.path.join(os.path.dirname(webp_tpu.__file__),
                      "native", "libwebptpu.so")
    if not os.path.exists(so):
        pytest.skip("native library not built")
    lib = ctypes.CDLL(so)
    lib.vp8_filter_selftest.restype = ctypes.c_int
    for seed in range(6):
        assert lib.vp8_filter_selftest(seed) == 0
