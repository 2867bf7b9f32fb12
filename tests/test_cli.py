"""CLI end-to-end tests (enc / dec / info, GIF round trips) — the
reference's cmd/gwebp/main_test.go tier."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from tests.conftest import pil_decode_rgba
from webp_tpu.cli import main


@pytest.fixture()
def png_file(tmp_path):
    img = np.array(Image.open("/root/reference/testdata/test.png")
                   .convert("RGB").resize((64, 48)))
    p = tmp_path / "in.png"
    Image.fromarray(img).save(p)
    return str(p), img


def test_enc_dec_info_roundtrip(tmp_path, png_file, capsys):
    src_path, img = png_file
    webp_path = str(tmp_path / "out.webp")
    png_out = str(tmp_path / "back.png")

    assert main(["enc", src_path, webp_path, "-q", "80"]) == 0
    data = open(webp_path, "rb").read()
    ref = pil_decode_rgba(data)[..., :3]  # libwebp decodes CLI output

    assert main(["dec", webp_path, png_out]) == 0
    back = np.array(Image.open(png_out).convert("RGB"))
    assert np.array_equal(back, ref)

    assert main(["info", webp_path]) == 0
    out = capsys.readouterr().out
    assert "64x48" in out and "VP8" in out


def test_enc_lossless_exact(tmp_path, png_file):
    src_path, img = png_file
    webp_path = str(tmp_path / "ll.webp")
    assert main(["enc", src_path, webp_path, "-lossless"]) == 0
    data = open(webp_path, "rb").read()
    assert np.array_equal(pil_decode_rgba(data)[..., :3], img)


def test_gif_roundtrip(tmp_path):
    # Build a small 3-frame GIF, encode to animated WebP, decode back to GIF.
    frames = []
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (32, 48, 3), np.uint8)
    for i in range(3):
        f = base.copy()
        f[8 * i: 8 * i + 8] = (255, 0, 0)
        frames.append(Image.fromarray(f))
    gif_path = str(tmp_path / "a.gif")
    frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                   duration=100, loop=0)

    webp_path = str(tmp_path / "a.webp")
    assert main(["enc", gif_path, webp_path, "-lossless"]) == 0
    data = open(webp_path, "rb").read()
    im = Image.open(io.BytesIO(data))
    assert getattr(im, "is_animated", False) and im.n_frames == 3

    gif_out = str(tmp_path / "b.gif")
    assert main(["dec", webp_path, gif_out]) == 0
    im2 = Image.open(gif_out)
    assert getattr(im2, "is_animated", False) and im2.n_frames == 3


def test_stdin_stdout(tmp_path, png_file, monkeypatch):
    src_path, img = png_file
    webp_path = str(tmp_path / "o.webp")
    assert main(["enc", src_path, webp_path, "-lossless"]) == 0
    # info on missing file -> nonzero/exception path
    with pytest.raises(Exception):
        main(["info", str(tmp_path / "missing.webp")])


def test_alpha_utils():
    from webp_tpu.utils.alpha import (dispatch_alpha, extract_alpha,
                                      extract_green, premultiply)

    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, (7, 9, 4), np.uint8)
    pm = premultiply(rgba)
    # exact round(c*a/255)
    want = np.round(rgba[..., :3].astype(np.float64)
                    * rgba[..., 3:4].astype(np.float64) / 255.0)
    assert np.array_equal(pm[..., :3].astype(np.float64), want)
    assert np.array_equal(pm[..., 3], rgba[..., 3])
    un = premultiply(pm, inverse=True)
    # unpremultiply is lossy but must be within quantization distance
    a = rgba[..., 3:4].astype(np.int32)
    err = np.abs(un[..., :3].astype(np.int32) - rgba[..., :3].astype(np.int32))
    assert (err[(a >= 128).repeat(3, -1)] <= 1).all()

    plane, has = extract_alpha(rgba)
    assert has and np.array_equal(plane, rgba[..., 3])
    assert np.array_equal(dispatch_alpha(rgba, plane), rgba)
    argb = rng.integers(0, 2 ** 32, (5, 5), dtype=np.uint64).astype(np.uint32)
    assert np.array_equal(extract_green(argb),
                          ((argb >> 8) & 0xFF).astype(np.uint8))


def test_sharpyuv_transfer_functions():
    """Every CICP transfer curve must round-trip gamma->linear->gamma and
    the default table build must match the legacy BT.709 fixed-point
    tables (same values the converter always used)."""
    import numpy as np

    from webp_tpu.sharpyuv import gamma as G

    x = np.linspace(0.0, 1.0, 257)
    for name in G.TRANSFER_FUNCTIONS:
        back = G.from_linear(name, G.to_linear(name, x))
        mask = x > 0.02  # log curves clip near zero by definition
        assert np.allclose(back[mask], x[mask], atol=2e-3), name

    # sharp conversion still works for a couple of non-default curves
    from webp_tpu.sharpyuv.convert import sharp_rgb_to_yuv420_planes

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 26, 3), np.uint8)
    for name in ("bt709", "iec61966", "smpte2084"):
        Y, U, V = sharp_rgb_to_yuv420_planes(img, transfer=name)
        assert Y.shape == (24, 26)


def test_enc_extended_flags(tmp_path):
    """Reference gwebp flag surface: preset, rate targets, filter and alpha
    controls all parse and produce decodable output
    (cmd/gwebp/main.go:83-104)."""
    from PIL import Image

    src = tmp_path / "in.png"
    Image.open("/root/reference/testdata/test.png").convert("RGB").resize(
        (64, 48)).save(src)
    out = tmp_path / "out.webp"
    rc = main(["enc", "-preset", "photo", "-sns", "30", "-sharpness",
                   "2", "-pass", "2", "-near_lossless", "100", "-q", "60",
                   str(src), str(out)])
    assert rc == 0
    img = Image.open(out)
    assert img.size == (64, 48)

    out2 = tmp_path / "sized.webp"
    rc = main(["enc", "-size", "900", str(src), str(out2)])
    assert rc == 0
    assert out2.stat().st_size <= 1100  # rate control honors the target

    jpg = tmp_path / "out.jpg"
    rc = main(["dec", str(out), str(jpg)])
    assert rc == 0
    assert Image.open(jpg).format == "JPEG"
