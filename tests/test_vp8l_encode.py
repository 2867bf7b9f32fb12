"""VP8L lossless encode: bit-exact round-trip via both libwebp and our own
decoder, plus ALPH alpha and VP8X metadata assembly."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.container.parser import Parser
from tests.conftest import pil_decode_rgba


def _rgba(img):
    if img.shape[2] == 4:
        return img
    return np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])


def _roundtrip_exact(img) -> bool:
    data = webp_tpu.encode(img, lossless=True)
    want = _rgba(img)
    if not np.array_equal(pil_decode_rgba(data), want):
        return False
    return np.array_equal(webp_tpu.decode_rgba(data), want)


@pytest.fixture(scope="module")
def photo():
    return np.array(Image.open("/root/reference/testdata/test.png").resize((96, 72)))


def test_photo_rgba(photo):
    assert _roundtrip_exact(photo)


def test_photo_rgb(photo):
    assert _roundtrip_exact(photo[..., :3])


@pytest.mark.parametrize("colors", [2, 5, 13, 200])
def test_palette(photo, colors):
    im = Image.fromarray(photo[..., :3]).convert("P", palette=Image.ADAPTIVE,
                                                  colors=colors).convert("RGB")
    assert _roundtrip_exact(np.array(im))


@pytest.mark.parametrize("size", [(1, 1), (1, 9), (9, 1), (17, 3), (64, 64)])
def test_dimensions(photo, size):
    im = np.array(Image.fromarray(photo).resize(size))
    assert _roundtrip_exact(im)


@pytest.mark.parametrize("method", [0, 1, 2, 3, 5, 6])
def test_method_ladder_roundtrips(photo, method):
    """Every method level must stay pixel-exact (lossless is lossless at
    m0 too); lower methods trade size for speed, bounded here at +30%
    over m4 (measured spread on photos is ~8%)."""
    img = photo[..., :3]
    data = webp_tpu.encode(img, lossless=True, method=method)
    assert np.array_equal(pil_decode_rgba(data)[..., :3], img)
    assert np.array_equal(webp_tpu.decode(data), img)
    base = webp_tpu.encode(img, lossless=True, method=4)
    assert len(data) <= int(len(base) * 1.3), (method, len(data), len(base))


@pytest.mark.parametrize("filtering", [0, 1, 2])
@pytest.mark.parametrize("compression", [0, 1])
def test_alpha_filter_matrix(photo, filtering, compression):
    """ALPH behavior matrix (reference testc/alpha): every prediction
    filter mode x compression method must round-trip the alpha plane
    bit-exactly through libwebp. filtering: 0=none, 1=fast(auto),
    2=best-of-all; alpha_compression: 0=raw, 1=VP8L."""
    a = photo.copy()
    a[..., 3] = ((np.arange(a.shape[0])[:, None] * 7
                  + np.arange(a.shape[1])[None, :] * 3) % 256).astype(np.uint8)
    data = webp_tpu.encode(a, quality=75, alpha_compression=compression,
                           alpha_filtering=filtering)
    got = pil_decode_rgba(data)
    assert np.array_equal(got[..., 3], a[..., 3])
    assert np.array_equal(webp_tpu.decode_rgba(data), got)


@pytest.mark.parametrize("level", [0, 40, 80])
def test_near_lossless_levels(photo, level):
    """near_lossless < 100 quantizes residuals progressively: still a
    valid stream libwebp decodes, pixels within the level's error bound,
    and lower levels never produce larger files than lossless."""
    img = photo[..., :3]
    data = webp_tpu.encode(img, lossless=True, near_lossless=level)
    got = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), got)
    # Quantization bits = ceil((100-level)/20): 80 -> 1 bit (+-1),
    # 40 -> 3 bits (+-4), 0 -> 5 bits (+-16).
    maxdiff = {80: 2, 40: 4, 0: 16}[level]
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= maxdiff
    exact = webp_tpu.encode(img, lossless=True)
    assert len(data) <= len(exact) * 1.02


def test_noise_image():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    assert _roundtrip_exact(img)


def test_alpha_plane_roundtrip(photo):
    a = photo.copy()
    a[..., 3] = ((np.arange(a.shape[0])[:, None] * 3
                  + np.arange(a.shape[1])[None, :]) % 256).astype(np.uint8)
    data = webp_tpu.encode(a, quality=75)  # lossy + ALPH
    assert np.array_equal(pil_decode_rgba(data)[..., 3], a[..., 3])
    assert np.array_equal(webp_tpu.decode_rgba(data), pil_decode_rgba(data))


def test_alpha_raw_method(photo):
    a = photo.copy()
    rng = np.random.default_rng(3)
    a[..., 3] = rng.integers(0, 256, a.shape[:2]).astype(np.uint8)  # incompressible
    data = webp_tpu.encode(a, quality=75, alpha_compression=0)
    assert np.array_equal(pil_decode_rgba(data)[..., 3], a[..., 3])


def test_metadata_roundtrip(photo):
    data = webp_tpu.encode(photo[..., :3], quality=75,
                           iccp=b"icc", exif=b"exif", xmp=b"<x/>")
    p = Parser(data)
    assert p.parsed.iccp == b"icc"
    assert p.parsed.exif == b"exif"
    assert p.parsed.xmp == b"<x/>"
    # libwebp still decodes the extended file.
    assert pil_decode_rgba(data).shape[:2] == photo.shape[:2]


def test_lossless_metadata(photo):
    data = webp_tpu.encode(photo, lossless=True, exif=b"E")
    assert np.array_equal(pil_decode_rgba(data), _rgba(photo))


def test_size_competitive_small_images():
    """The transform-config search (predictor on/off compared by exact coded
    size) plus the widened color-cache search keep small-image output within
    12% of libwebp m4 (graphics previously lost ~28% to a forced predictor
    transform; libwebp decides via AnalyzeEntropy, vp8l_enc.c)."""
    for name, sz in [("test.png", (256, 192)), ("test.png", (128, 96)),
                     ("test_color.png", (200, 133))]:
        im = Image.open(f"/root/reference/testdata/{name}").convert("RGB")
        im = im.resize(sz)
        rgb = np.asarray(im)
        mine = webp_tpu.encode(rgb, lossless=True)
        buf = io.BytesIO()
        im.save(buf, format="WEBP", lossless=True, quality=75, method=4)
        assert np.array_equal(
            np.asarray(Image.open(io.BytesIO(mine)).convert("RGB")), rgb)
        ratio = len(mine) / len(buf.getvalue())
        assert ratio <= 1.12, f"{name}@{sz}: {ratio:.3f} vs libwebp"


def test_large_image_high_method_roundtrip():
    """Regression for the large-image (h*w > 2^18) method>=5 transform
    search branch (lossless/encode.py): must stay pixel-exact through the
    libwebp decoder and must not code larger than method 4."""
    im = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    rgb = np.asarray(im.resize((800, 700)))
    assert rgb.shape[0] * rgb.shape[1] > (1 << 18)
    m5 = webp_tpu.encode(rgb, lossless=True, method=5)
    assert np.array_equal(pil_decode_rgba(m5)[..., :3], rgb)
    assert np.array_equal(webp_tpu.decode(m5), rgb)
    m4 = webp_tpu.encode(rgb, lossless=True, method=4)
    assert len(m5) <= len(m4), (len(m5), len(m4))
