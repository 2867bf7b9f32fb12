"""Content-matrix conformance corpus.

Diverse synthetic content crossed with encoder configurations; every
bitstream we emit must decode in libwebp (Pillow), lossless must
round-trip bit-exact, and our decoder must agree with Pillow on
Pillow-generated streams (reference tier: edge_cases_test.go content
sweeps + dec_test.go golden matrix).
"""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from tests.conftest import pil_decode_rgba


def _content(kind, w=80, h=64, alpha=False):
    """Synthetic content families that stress distinct codec paths."""
    rng = np.random.default_rng(hash(kind) % (1 << 32))
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "flat":
        img = np.full((h, w, 3), 137, np.uint8)
    elif kind == "flat-extreme":
        img = np.zeros((h, w, 3), np.uint8)
        img[h // 2:] = 255
    elif kind == "checker":  # Nyquist-rate: worst case for the DCT
        img = np.where(((xx + yy) & 1)[..., None] == 0, 255, 0).astype(np.uint8)
        img = np.repeat(img, 3, axis=-1) if img.shape[-1] == 1 else img
    elif kind == "noise":
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    elif kind == "gradient":
        img = np.stack([(xx * 255 // max(w - 1, 1)),
                        (yy * 255 // max(h - 1, 1)),
                        ((xx + yy) * 255 // max(w + h - 2, 1))],
                       axis=-1).astype(np.uint8)
    elif kind == "palette":  # few distinct colors: VP8L palette transform
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
                        [10, 20, 30]], np.uint8)
        img = pal[rng.integers(0, len(pal), (h, w))]
    elif kind == "text":  # hard edges + flat runs, like rendered text
        img = np.full((h, w, 3), 255, np.uint8)
        for r in range(4, h - 4, 9):
            runs = rng.integers(2, 10, 8)
            x = 3
            for rl in runs:
                img[r:r + 5, x:x + rl] = 0
                x += rl + 4
                if x >= w - 4:
                    break
    else:
        raise AssertionError(kind)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    if alpha:
        a = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
        a[:4, :4] = 0      # fully transparent corner
        a[-4:, -4:] = 255  # fully opaque corner
        img = np.dstack([img, a])
    return img


KINDS = ["flat", "flat-extreme", "checker", "noise", "gradient", "palette",
         "text"]


@pytest.mark.parametrize("kind", KINDS)
def test_lossless_content_roundtrip(kind):
    img = _content(kind)
    data = webp_tpu.encode(img, lossless=True)
    assert np.array_equal(pil_decode_rgba(data)[..., :3], img)
    assert np.array_equal(webp_tpu.decode(data), img)


@pytest.mark.parametrize("kind", KINDS)
def test_lossless_alpha_content_roundtrip_exact(kind):
    img = _content(kind, alpha=True)
    data = webp_tpu.encode(img, lossless=True, exact=True)
    assert np.array_equal(pil_decode_rgba(data), img)
    assert np.array_equal(webp_tpu.decode(data), img)


@pytest.mark.parametrize("kind", ["flat", "gradient"])
def test_lossless_alpha_cleanup_only_touches_transparent(kind):
    """Default exact=False may rewrite RGB under alpha=0 (transparent-area
    cleanup, like libwebp); every visible pixel must still round-trip."""
    img = _content(kind, alpha=True)
    data = webp_tpu.encode(img, lossless=True)
    dec = pil_decode_rgba(data)
    visible = img[..., 3] > 0
    assert np.array_equal(dec[visible], img[visible])
    assert np.array_equal(dec[..., 3], img[..., 3])
    assert np.array_equal(webp_tpu.decode(data), dec)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("method", [0, 2, 4, 6])
def test_lossy_content_conformance(kind, method):
    """Every content family x method must produce a libwebp-decodable
    stream that our own decoder reads identically."""
    img = _content(kind)
    data = webp_tpu.encode(img, quality=75, method=method)
    ref = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), ref)


@pytest.mark.parametrize("kind", ["checker", "palette", "text"])
def test_lossy_alpha_content_conformance(kind):
    img = _content(kind, alpha=True)
    data = webp_tpu.encode(img, quality=75)
    ref = pil_decode_rgba(data)
    got = webp_tpu.decode(data)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("kind", ["gradient", "palette"])
@pytest.mark.parametrize("nl", [20, 60, 80])
def test_near_lossless_content(kind, nl):
    img = _content(kind)
    data = webp_tpu.encode(img, lossless=True, near_lossless=nl)
    dec = pil_decode_rgba(data)[..., :3]
    # Near-lossless bounds the per-pixel error by construction.
    maxdiff = {20: 8, 60: 4, 80: 2}[nl]
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= maxdiff
    assert np.array_equal(webp_tpu.decode(data), dec)


@pytest.mark.parametrize("kind", ["flat", "noise", "gradient", "palette"])
@pytest.mark.parametrize("cfg", [
    dict(lossless=True, quality=20),   # fast lossless effort
    dict(lossless=True, quality=100),  # max lossless effort
    dict(quality=0, method=1),
    dict(quality=100, method=6),
])
def test_pillow_decodes_config_matrix(kind, cfg):
    img = _content(kind, w=52, h=36)
    data = webp_tpu.encode(img, **cfg)
    dec = pil_decode_rgba(data)[..., :3]
    if cfg.get("lossless"):
        assert np.array_equal(dec, img)
    else:
        assert dec.shape == img.shape


@pytest.mark.parametrize("kind", ["gradient", "palette", "checker"])
@pytest.mark.parametrize("pilcfg", [
    dict(lossless=True),
    dict(lossless=True, method=6),
    dict(quality=50),
    dict(quality=95, method=6),
])
def test_our_decode_matches_pillow_streams(kind, pilcfg):
    """Pillow-generated streams across its config space: our decoder must
    agree with Pillow's own decode exactly."""
    img = _content(kind, w=60, h=44)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", **pilcfg)
    data = buf.getvalue()
    ref = pil_decode_rgba(data)
    got = webp_tpu.decode(data)
    assert np.array_equal(got, ref[..., :got.shape[-1]])


@pytest.mark.parametrize("pilcfg", [
    dict(lossless=True),
    dict(quality=60),
])
def test_our_decode_matches_pillow_alpha_streams(pilcfg):
    img = _content("gradient", w=60, h=44, alpha=True)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", **pilcfg)
    data = buf.getvalue()
    ref = pil_decode_rgba(data)
    got = webp_tpu.decode(data)
    assert got.shape[-1] == 4
    assert np.array_equal(got, ref)
