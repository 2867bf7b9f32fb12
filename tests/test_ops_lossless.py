"""Device VP8L transforms (ops/lossless.py) vs the numpy oracle
(lossless/transforms.py): bit-exact on random data."""

import numpy as np
import jax.numpy as jnp
import pytest

from webp_tpu.lossless import transforms as H
from webp_tpu.ops import lossless as D


@pytest.fixture
def argb():
    rng = np.random.default_rng(0)
    return rng.integers(0, 1 << 32, (37, 53), dtype=np.uint32)


def test_add_green_inverse(argb):
    assert np.array_equal(np.asarray(D.add_green_inverse(jnp.asarray(argb))),
                          H.add_green_inverse(argb))


def test_subtract_green_roundtrip(argb):
    sub = D.subtract_green(jnp.asarray(argb))
    back = D.add_green_inverse(sub)
    assert np.array_equal(np.asarray(back), argb)


@pytest.mark.parametrize("bits", [2, 3, 5])
def test_color_space_inverse(argb, bits):
    rng = np.random.default_rng(bits)
    ty = H.sub_sample_size(argb.shape[0], bits)
    tx = H.sub_sample_size(argb.shape[1], bits)
    tiles = (np.uint32(0xFF000000)
             | rng.integers(0, 1 << 24, (ty * tx,), dtype=np.uint32))
    want = H.color_space_inverse(argb, bits, tiles)
    got = np.asarray(D.color_space_inverse(jnp.asarray(argb), bits,
                                           jnp.asarray(tiles)))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("bits", [2, 4])
def test_color_space_forward_inverts(argb, bits):
    rng = np.random.default_rng(10 + bits)
    ty = H.sub_sample_size(argb.shape[0], bits)
    tx = H.sub_sample_size(argb.shape[1], bits)
    tiles = (np.uint32(0xFF000000)
             | rng.integers(0, 1 << 24, (ty * tx,), dtype=np.uint32))
    fwd = D.color_space_forward(jnp.asarray(argb), bits, jnp.asarray(tiles))
    back = D.color_space_inverse(fwd, bits, jnp.asarray(tiles))
    assert np.array_equal(np.asarray(back), argb)


@pytest.mark.parametrize("bits", [0, 1, 2, 3])
def test_color_index_inverse(bits):
    rng = np.random.default_rng(20 + bits)
    n = min(1 << (8 >> bits), 256) if bits else 200
    palette = rng.integers(0, 1 << 32, (n,), dtype=np.uint32)
    out_w = 41
    w = H.sub_sample_size(out_w, bits) if bits else out_w
    if bits:
        bpp = 8 >> bits
        per = 1 << bits
        idx = rng.integers(0, n, (13, w * per)).astype(np.uint32)
        packed_g = np.zeros((13, w), np.uint32)
        for k in range(per):
            packed_g |= idx[:, k::per][:, :w] << np.uint32(k * bpp)
        packed = packed_g << np.uint32(8)
    else:
        packed = (rng.integers(0, n, (13, w), dtype=np.uint32)
                  << np.uint32(8))
    want = H.color_index_inverse(packed, bits, palette, out_w)
    got = np.asarray(D.color_index_inverse(jnp.asarray(packed), bits,
                                           jnp.asarray(palette), out_w))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("bits", [3, 4, 5])
def test_predictor_search_matches_native(bits):
    """The device per-tile predictor search (ops/lossless.py
    predictor_search, SURVEY P4) is bit-identical to the host C++
    vp8l_predictor_transform: same tile modes, same residual image."""
    from PIL import Image

    from webp_tpu.lossless.encode import rgba_to_argb, subtract_green
    from webp_tpu.native.api import vp8l_predictor_transform
    from webp_tpu.ops.lossless import predictor_search

    rng = np.random.default_rng(bits)
    imgs = [
        np.asarray(Image.open("/root/reference/testdata/test_color.png")
                   .convert("RGB").resize((130, 94))),
        rng.integers(0, 256, (37, 61, 4)).astype(np.uint8),
        np.full((16, 16, 3), 200, np.uint8),  # flat: all ties -> mode 0|1
    ]
    for img in imgs:
        sg = subtract_green(rgba_to_argb(img))
        host_out, host_modes = vp8l_predictor_transform(sg, bits)
        dev_out, dev_modes = predictor_search(jnp.asarray(sg), bits)
        assert np.array_equal(np.asarray(dev_modes).reshape(-1),
                              host_modes.reshape(-1))
        assert np.array_equal(np.asarray(dev_out), host_out)


def test_predictor_search_env_wiring(monkeypatch):
    """WEBPTPU_VP8L_DEVICE=1 routes predictor_transform through the
    device kernel and the encoded stream stays byte-identical."""
    import webp_tpu

    img = np.random.default_rng(3).integers(
        0, 256, (48, 64, 3)).astype(np.uint8)
    monkeypatch.delenv("WEBPTPU_VP8L_DEVICE", raising=False)
    host = webp_tpu.encode(img, lossless=True)
    monkeypatch.setenv("WEBPTPU_VP8L_DEVICE", "1")
    dev = webp_tpu.encode(img, lossless=True)
    assert host == dev
