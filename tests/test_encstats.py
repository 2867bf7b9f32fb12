"""EncStats observability contract (reference EncStats,
lossy/encode.go:326-337, + the per-stage size breakdown its debug tests
print). These pin the surface so the stats can't silently rot."""

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu import encoder as E


@pytest.fixture(scope="module")
def photo():
    im = Image.open("/root/reference/testdata/test_color.png").convert(
        "RGB").resize((160, 112))
    return np.asarray(im)


def test_lossy_breakdown_sums_to_container(photo):
    """part0 + token partitions account for the whole VP8 payload (minus
    the 10-byte uncompressed frame header)."""
    data = webp_tpu.encode(photo, quality=75, method=4)
    s = E.LAST_STATS
    assert s.part0_size > 0 and len(s.token_sizes) >= 1
    from webp_tpu.container.parser import Parser
    from webp_tpu.container import riff as r

    vp8 = next(c for c in Parser(data).chunks() if c.tag == r.VP8)
    # size is the VP8 payload (reference coded size), not the container.
    assert s.size == len(vp8.payload)
    header = 10 + 3 * (len(s.token_sizes) - 1)  # frame hdr + partition table
    assert header + s.part0_size + sum(s.token_sizes) == s.size


def test_psnr_matches_independent_measurement(photo):
    """Stats PSNR is the luma-plane PSNR (reference EncStats keeps
    per-channel PSNR; Y is channel 0), from the encoder's own recon."""
    from webp_tpu.encoder import rgb_to_yuv420

    data = webp_tpu.encode(photo, quality=75)
    s = E.LAST_STATS
    dec = webp_tpu.decode(data)
    y_src = rgb_to_yuv420(photo)[0].astype(np.float64)
    y_dec = rgb_to_yuv420(dec)[0].astype(np.float64)
    mse = np.mean((y_dec - y_src) ** 2)
    ind = 10 * np.log10(255.0 ** 2 / mse)
    assert abs(s.psnr - ind) < 0.1


def test_alpha_size_reported():
    rng = np.random.default_rng(5)
    img = np.dstack([rng.integers(0, 256, (48, 48, 3)).astype(np.uint8),
                     np.full((48, 48), 200, np.uint8)])
    webp_tpu.encode(img, quality=75)
    s = E.LAST_STATS
    assert s.alpha_size > 0
    webp_tpu.encode(img[..., :3], quality=75)
    assert E.LAST_STATS.alpha_size == 0


def test_quality_echoes_effective_quality(photo):
    webp_tpu.encode(photo, quality=42)
    assert E.LAST_STATS.quality == 42
    webp_tpu.encode(photo, target_size=3200)
    s = E.LAST_STATS
    assert s.passes >= 2           # rate control iterated
    assert 0 < s.quality <= 100    # and reports the quality it landed on
    assert s.size <= 3200 * 1.05


def test_partitions_reflected_in_token_sizes(photo):
    webp_tpu.encode(photo, quality=75, partitions=2)
    assert len(E.LAST_STATS.token_sizes) == 4
    webp_tpu.encode(photo, quality=75)
    assert len(E.LAST_STATS.token_sizes) == 1


def test_multiple_encodes_do_not_leak_stats(photo):
    """Stats always describe the MOST RECENT encode."""
    webp_tpu.encode(photo, quality=90)
    hi = E.LAST_STATS.size
    webp_tpu.encode(photo, quality=10)
    lo = E.LAST_STATS.size
    assert lo < hi
