"""Edge-case matrix (reference tier: edge_cases_test.go, 1270 LoC):
degenerate dimensions, non-multiple-of-16, palettes, quality/method/
preset/partition sweeps, corrupt-input behavior. Oracle: Pillow/libwebp
must decode everything we emit; lossless must round-trip bit-exact."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.container.riff import WebPError
from tests.conftest import pil_decode_rgba


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    base = np.zeros((h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    base[..., 0] = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    base[..., 1] = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    base[..., 2] = rng.integers(0, 256, (h, w))
    return base


DIMS = [(1, 1), (1, 16), (16, 1), (1, 100), (100, 1), (3, 3), (15, 17),
        (16, 16), (17, 15), (31, 33), (64, 1), (2, 63)]


@pytest.mark.parametrize("w,h", DIMS)
def test_lossless_degenerate_dims(w, h):
    img = _img(w, h)
    data = webp_tpu.encode(img, lossless=True)
    assert np.array_equal(pil_decode_rgba(data)[..., :3], img)
    assert np.array_equal(webp_tpu.decode(data), img)


@pytest.mark.parametrize("w,h", DIMS)
def test_lossy_degenerate_dims(w, h):
    img = _img(w, h, seed=1)
    data = webp_tpu.encode(img, quality=75)
    ref = pil_decode_rgba(data)[..., :3]
    assert ref.shape == img.shape
    assert np.array_equal(webp_tpu.decode(data), ref)


@pytest.mark.parametrize("quality", [0, 1, 10, 50, 99, 100])
def test_lossy_quality_extremes(quality):
    img = _img(48, 32, seed=2)
    data = webp_tpu.encode(img, quality=quality)
    assert np.array_equal(webp_tpu.decode(data),
                          pil_decode_rgba(data)[..., :3])


@pytest.mark.parametrize("method", [0, 1, 2, 3, 4, 5, 6])
def test_lossless_method_sweep(method):
    img = _img(40, 28, seed=3)
    data = webp_tpu.encode(img, lossless=True, method=method)
    assert np.array_equal(pil_decode_rgba(data)[..., :3], img)


@pytest.mark.parametrize("preset", ["default", "picture", "photo",
                                    "drawing", "icon", "text"])
def test_presets(preset):
    from webp_tpu.encoder import options_for_preset

    img = _img(48, 48, seed=4)
    opts = options_for_preset(preset, quality=70)
    data = webp_tpu.encode(img, options=opts)
    assert np.array_equal(webp_tpu.decode(data),
                          pil_decode_rgba(data)[..., :3])


@pytest.mark.parametrize("partitions", [0, 1, 2, 3])
def test_partition_sweep(partitions):
    img = _img(64, 48, seed=5)
    data = webp_tpu.encode(img, quality=70, partitions=partitions)
    assert np.array_equal(webp_tpu.decode(data),
                          pil_decode_rgba(data)[..., :3])


def test_palette_images():
    """Few-color images take the color-index transform."""
    for ncolors, seed in ((2, 6), (5, 7), (255, 8)):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncolors, 3), np.uint8)
        idx = rng.integers(0, ncolors, (40, 56))
        img = pal[idx]
        data = webp_tpu.encode(img, lossless=True)
        assert np.array_equal(pil_decode_rgba(data)[..., :3], img)
        assert np.array_equal(webp_tpu.decode(data), img)


def test_flat_image():
    img = np.full((33, 47, 3), 77, np.uint8)
    ll = webp_tpu.encode(img, lossless=True)
    assert len(ll) < 200
    assert np.array_equal(webp_tpu.decode(ll), img)
    lo = webp_tpu.encode(img, quality=75)
    assert np.array_equal(webp_tpu.decode(lo), pil_decode_rgba(lo)[..., :3])


def test_full_alpha_range_lossless():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 24, 4), np.uint8)
    data = webp_tpu.encode(img, lossless=True, exact=True)
    assert np.array_equal(pil_decode_rgba(data), img)


def test_max_dimension_rejected():
    img = np.zeros((1, 4, 3), np.uint8)
    with pytest.raises(WebPError):
        webp_tpu.encode(np.zeros((1, 16384, 3), np.uint8))
    webp_tpu.encode(img)  # small is fine


def test_zero_dimension_rejected():
    with pytest.raises((WebPError, ValueError)):
        webp_tpu.encode(np.zeros((0, 4, 3), np.uint8))


@pytest.mark.parametrize("nbytes", [0, 4, 11, 12, 20])
def test_truncated_header_raises(nbytes):
    img = _img(16, 16)
    data = webp_tpu.encode(img, lossless=True)
    with pytest.raises(WebPError):
        webp_tpu.decode(data[:nbytes])


def test_corrupt_fourcc_raises():
    img = _img(16, 16)
    data = bytearray(webp_tpu.encode(img, lossless=True))
    data[8:12] = b"WAVE"
    with pytest.raises(WebPError):
        webp_tpu.decode(bytes(data))


def test_truncated_payload_raises_or_errors():
    img = _img(64, 64, seed=10)
    data = webp_tpu.encode(img, lossless=True)
    for frac in (0.3, 0.7, 0.95):
        cut = data[:int(len(data) * frac)]
        with pytest.raises(WebPError):
            webp_tpu.decode(cut)
