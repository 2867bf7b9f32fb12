"""Fixed-point rescaler (utils/rescaler.py; port of reference
internal/dsp/rescale.go): integer box-average exactness, interpolation
properties, shape coverage."""

import numpy as np
import pytest

from webp_tpu.utils.rescaler import rescale_plane, rescale_rgba


def test_identity():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (17, 23), np.uint8)
    assert np.array_equal(rescale_plane(a, 23, 17), a)


@pytest.mark.parametrize("f", [2, 3, 4])
def test_integer_factor_downscale_is_box_average(f):
    rng = np.random.default_rng(f)
    h, w = 12 * f, 8 * f
    a = rng.integers(0, 256, (h, w), np.uint8)
    got = rescale_plane(a, w // f, h // f)
    want = a.reshape(h // f, f, w // f, f).mean(axis=(1, 3))
    # Fixed-point box filter: within 1 of the float mean everywhere.
    assert np.abs(got.astype(np.float64) - want).max() <= 1.0


def test_flat_image_any_scale():
    a = np.full((7, 13), 200, np.uint8)
    for dw, dh in ((3, 2), (26, 14), (40, 5), (1, 1)):
        out = rescale_plane(a, dw, dh)
        assert out.shape == (dh, dw)
        assert np.abs(out.astype(int) - 200).max() <= 1


def test_upscale_gradient_monotonic():
    a = np.linspace(0, 255, 16).astype(np.uint8).reshape(1, 16)
    a = np.repeat(a, 4, axis=0)
    out = rescale_plane(a, 64, 8)
    d = np.diff(out[4].astype(int))
    assert (d >= 0).all()
    assert out[0, 0] <= 5 and out[0, -1] >= 250


@pytest.mark.parametrize("shape", [(5, 9), (33, 7), (64, 64)])
@pytest.mark.parametrize("dst", [(3, 4), (17, 11), (128, 40)])
def test_shapes(shape, dst):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, shape, np.uint8)
    dw, dh = dst
    out = rescale_plane(a, dw, dh)
    assert out.shape == (dh, dw)


def test_rgba_channels_independent():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (10, 14, 4), np.uint8)
    out = rescale_rgba(img, 7, 5)
    for c in range(4):
        assert np.array_equal(out[..., c],
                              rescale_plane(img[..., c], 7, 5))
