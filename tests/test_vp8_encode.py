"""VP8 lossy encode: conformance (libwebp must decode our bytes), internal
consistency (our decoder agrees bit-for-bit), and quality (PSNR parity with
libwebp at equal quality)."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from tests.conftest import pil_decode_rgba


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse else 99.0


@pytest.fixture(scope="module")
def photo():
    im = Image.open("/root/reference/testdata/test.png").convert("RGB")
    return np.array(im.resize((96, 72)))


@pytest.mark.parametrize("quality", [20, 50, 75, 95])
def test_conformance_and_consistency(photo, quality):
    data = webp_tpu.encode(photo, quality=quality)
    ref = pil_decode_rgba(data)[..., :3]  # libwebp decodes OUR bitstream
    mine = webp_tpu.decode(data)
    assert np.array_equal(mine, ref), "self-decode differs from libwebp"


def test_psnr_parity_with_libwebp(photo):
    data = webp_tpu.encode(photo, quality=75)
    ours = _psnr(photo, pil_decode_rgba(data)[..., :3])
    buf = io.BytesIO()
    Image.fromarray(photo).save(buf, format="WEBP", quality=75)
    theirs = _psnr(photo, pil_decode_rgba(buf.getvalue())[..., :3])
    assert ours > theirs - 0.75, f"PSNR {ours:.2f} vs libwebp {theirs:.2f}"


@pytest.mark.parametrize("size", [(16, 16), (1, 1), (17, 33), (64, 48)])
def test_dimensions(photo, size):
    im = np.array(Image.fromarray(photo).resize(size))
    data = webp_tpu.encode(im, quality=60)
    assert np.array_equal(webp_tpu.decode(data), pil_decode_rgba(data)[..., :3])


def test_quality_monotonic_size(photo):
    sizes = [len(webp_tpu.encode(photo, quality=q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_flat_image_skips(photo):
    flat = np.full((64, 64, 3), 77, np.uint8)
    data = webp_tpu.encode(flat, quality=75)
    out = pil_decode_rgba(data)[..., :3]
    assert _psnr(flat, out) > 40
    assert len(data) < 300


def test_partitions(photo):
    data = webp_tpu.encode(photo, quality=75, partitions=2)  # 4 partitions
    assert np.array_equal(webp_tpu.decode(data), pil_decode_rgba(data)[..., :3])
