"""Pillow integration (webp_tpu/pil_plugin.py): the analog of the
reference's image.RegisterFormat hook (webp.go:23-34) — PIL.Image.open and
Image.save route through this codec once registered."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
import webp_tpu.pil_plugin as plugin


@pytest.fixture
def rgb_img():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (40, 56, 3), np.uint8)
    # smooth it so lossy round-trips land close
    return (base // 4 + 96).astype(np.uint8)


@pytest.fixture(autouse=True)
def registered():
    plugin.register()
    yield
    plugin.unregister()


def test_open_routes_through_webp_tpu(rgb_img):
    data = webp_tpu.encode(rgb_img, lossless=True)
    im = Image.open(io.BytesIO(data))
    assert isinstance(im, plugin.WebPTpuImageFile)
    assert im.format == "WEBP"
    assert im.size == (56, 40)
    out = np.asarray(im.convert("RGB"))
    assert np.array_equal(out, rgb_img)


def test_save_routes_through_webp_tpu(rgb_img, tmp_path):
    p = tmp_path / "x.webp"
    Image.fromarray(rgb_img).save(p, lossless=True)
    # Decoded by our own decoder: bit-exact round trip.
    got = webp_tpu.decode(p.read_bytes())
    assert np.array_equal(got, rgb_img)


def test_save_lossy_quality_param(rgb_img, tmp_path):
    p = tmp_path / "q.webp"
    Image.fromarray(rgb_img).save(p, quality=75)
    data = p.read_bytes()
    f = webp_tpu.get_features(data)
    assert (f.width, f.height) == (56, 40)
    got = webp_tpu.decode(data)
    err = np.abs(got.astype(np.int32) - rgb_img.astype(np.int32)).mean()
    assert err < 16.0  # noise image at q75


def test_rgba_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 255, (24, 24, 4), np.uint8)
    p = tmp_path / "a.webp"
    Image.fromarray(rgba, "RGBA").save(p, lossless=True, exact=True)
    im = Image.open(p)
    assert im.mode == "RGBA"
    assert np.array_equal(np.asarray(im), rgba)


def test_animated_frames_via_pil():
    from webp_tpu.animation.animation import encode_animation

    frames = [np.full((16, 16, 4), (i * 60, 0, 0, 255), np.uint8)
              for i in range(3)]
    data = encode_animation(frames, 50, lossless=True)
    im = Image.open(io.BytesIO(data))
    assert im.n_frames == 3
    assert im.is_animated
    im.seek(2)
    arr = np.asarray(im.convert("RGBA"))
    assert arr[0, 0, 0] == 120
    assert im.info["duration"] == 50
    im.seek(0)
    assert np.asarray(im.convert("RGBA"))[0, 0, 0] == 0


def test_unregister_restores_pillow():
    plugin.unregister()
    assert Image.OPEN.get("WEBP") is not None  # Pillow's own is back
    assert Image.OPEN["WEBP"][0] is not plugin.WebPTpuImageFile
    plugin.register()  # fixture's unregister expects registered state


def test_open_bytes_helper(rgb_img):
    data = webp_tpu.encode(rgb_img, lossless=True)
    im = plugin.open_bytes(data)
    assert np.array_equal(np.asarray(im.convert("RGB")), rgb_img)
