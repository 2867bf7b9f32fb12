"""Differential tests: native C++ fast paths vs the pure-Python/numpy
oracles (tier-4 in SURVEY.md §4 — the reference's SIMD-vs-Go analog,
internal/dsp/simd_test.go:8-40). Skipped when libwebptpu.so isn't built."""

import io

import numpy as np
import pytest
from PIL import Image

from tests.conftest import pil_webp

from webp_tpu.native import api as native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


RNG = np.random.default_rng(42)


def _random_rgb(h, w):
    return RNG.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("size", [(64, 48), (33, 17), (1, 1), (15, 16),
                                  (130, 129)])
def test_yuv_import_matches_numpy(size):
    h, w = size
    img = _random_rgb(h, w)
    got = native.native_yuv_import(img)
    real_get = native.get
    native.get = lambda: None  # force the numpy path
    try:
        from webp_tpu.encoder import rgb_to_yuv420

        want = rgb_to_yuv420(img)
    finally:
        native.get = real_get
    for a, b, name in zip(got, want, "YUV"):
        assert np.array_equal(a, b), name


@pytest.mark.parametrize("size", [(64, 48), (33, 17), (2, 2), (5, 1),
                                  (127, 254)])
def test_upsample_matches_numpy(size):
    h, w = size
    ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    Y = RNG.integers(0, 256, (ph, pw), np.uint8)
    U = RNG.integers(0, 256, (ph // 2, pw // 2), np.uint8)
    V = RNG.integers(0, 256, (ph // 2, pw // 2), np.uint8)
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    yv, uv, vv = Y[:h, :w], U[:ch, :cw], V[:ch, :cw]
    got = native.native_upsample_rgba(yv, uv, vv, 3)
    from webp_tpu.lossy.yuv import yuv_to_rgb_fancy

    assert np.array_equal(got, yuv_to_rgb_fancy(yv, uv, vv))


@pytest.mark.parametrize("size", [(64, 48), (33, 17), (5, 3)])
def test_vp8l_predictor_matches_numpy(size):
    h, w = size
    img = RNG.integers(0, 2 ** 32, (h, w), dtype=np.uint64).astype(np.uint32)
    from webp_tpu.lossless.encode import predictor_transform

    got = predictor_transform(img, 4, 75)
    real_get = native.get
    native.get = lambda: None
    try:
        want = predictor_transform(img, 4, 75)
    finally:
        native.get = real_get
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])


def test_vp8l_decoder_matches_python():
    """Native full decoder vs the Python decoder on randomized
    libwebp-generated streams (all methods, palette/photo/gradient)."""
    from webp_tpu.container.parser import Parser
    from webp_tpu.lossless.decode import VP8LDecoder

    for trial in range(9):
        h, w = int(RNG.integers(1, 70)), int(RNG.integers(1, 70))
        kind = trial % 3
        if kind == 0:  # noise (no useful transform)
            img = RNG.integers(0, 256, (h, w, 4), np.uint8)
        elif kind == 1:  # few colors (palette + bundling)
            img = np.zeros((h, w, 4), np.uint8)
            img[..., :3] = RNG.integers(0, 4, (h, w, 1)) * 60
            img[..., 3] = 255
        else:  # gradient (predictor-heavy)
            gx = np.linspace(0, 255, w, dtype=np.uint8)
            img = np.empty((h, w, 4), np.uint8)
            img[..., 0] = gx[None, :]
            img[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
            img[..., 2] = 128
            img[..., 3] = 255
        data = pil_webp(Image.fromarray(img, "RGBA"), lossless=True,
                        method=int(RNG.integers(0, 7)))
        payload = Parser(data).frames()[0].bitstream
        nat = native.vp8l_decode(payload)
        py = VP8LDecoder(payload).decode()
        assert nat is not None
        assert np.array_equal(nat[0], py), (trial, h, w)


def test_vp8l_entropy_image_roundtrips():
    """Native entropy-image emitter output decodes to the input pixels."""
    from webp_tpu.bitio.lossless import LosslessBitReader
    from webp_tpu.lossless.decode import VP8LDecoder
    import webp_tpu

    for (h, w) in ((24, 31), (7, 7), (1, 40)):
        rgb = _random_rgb(h, w)
        rgb[h // 2:] = rgb[: (h + 1) // 2][: h - h // 2]  # some repetition
        data = webp_tpu.encode(rgb, lossless=True)
        assert np.array_equal(webp_tpu.decode(data), rgb)


def test_append_bits_buffer_matches_write_bits():
    from webp_tpu.bitio.lossless import LosslessBitWriter

    payload = RNG.integers(0, 256, 333, np.uint8).tobytes()
    for lead_bits in (0, 1, 7, 13, 31):
        for nbits in (1, 8, 13, 2660, 333 * 8):
            a = LosslessBitWriter()
            b = LosslessBitWriter()
            a.write_bits(0x15A3, lead_bits)
            b.write_bits(0x15A3, lead_bits)
            a.append_bits_buffer(payload, nbits)
            val = int.from_bytes(payload, "little")
            left = nbits
            pos = 0
            while left > 0:
                take = min(24, left)
                b.write_bits((val >> pos) & ((1 << take) - 1), take)
                pos += take
                left -= take
            assert a.finish() == b.finish(), (lead_bits, nbits)


@pytest.mark.slow
def test_device_escape_overflow_falls_back():
    """Pathological noise at max quality overflows the nibble escape list;
    the batch path must fall back to the exact host encoder and still
    produce a conformant bitstream."""
    import webp_tpu
    from tests.conftest import pil_decode_rgba
    from webp_tpu.ops.fastpath import fast_encode_fn

    # 128x96 -> 48 MBs -> 1152 escape-capable blocks vs the 1024-block
    # floor; q99 noise escapes nearly everywhere.
    noise = RNG.integers(0, 256, (96, 128, 3), np.uint8)
    fn = fast_encode_fn(8, 6, 99)
    out = fn.rgb(noise[None])
    assert int(np.asarray(out["esc_cnt"])[0]) > fn.esc_cap, \
        "test premise: the escape list must overflow"
    data = webp_tpu.encode_batch([noise], quality=99)[0]
    ref = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), ref)


def test_i4_predictors_match_host():
    """Device strip-built B-mode predictors vs the scalar host oracle."""
    import jax.numpy as jnp

    from webp_tpu.lossy import dsp
    from webp_tpu.ops.i4 import pred4_all

    t = RNG.integers(0, 256, (64, 4))
    l = RNG.integers(0, 256, (64, 4))
    tl = RNG.integers(0, 256, 64)
    tr = RNG.integers(0, 256, (64, 4))
    preds = pred4_all(jnp.asarray(t), jnp.asarray(l), jnp.asarray(tl),
                      jnp.asarray(tr))
    for m in range(10):
        got = np.asarray(preds[m])
        for i in range(64):
            want = dsp.pred_luma4(m, t[i], l[i], int(tl[i]), tr[i])
            assert np.array_equal(got[i], want), (m, i)


@pytest.mark.slow
def test_device_quality_near_libwebp():
    """The full device path (segments + SNS + I4) must stay within 12%
    of libwebp method-4 size at no more than 0.35 dB PSNR deficit."""
    import io

    import webp_tpu
    from tests.conftest import pil_decode_rgba

    img = np.array(Image.open("/root/reference/testdata/test_color.png")
                   .convert("RGB"))[:256, :384]
    ours = webp_tpu.encode(img, quality=75, backend="device")
    od = pil_decode_rgba(ours)[..., :3]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", quality=75, method=4)
    ld = pil_decode_rgba(buf.getvalue())[..., :3]

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0 ** 2 / mse)

    assert len(ours) < len(buf.getvalue()) * 1.12, \
        (len(ours), len(buf.getvalue()))
    assert psnr(img, od) > psnr(img, ld) - 0.35, \
        (psnr(img, od), psnr(img, ld))


def test_fuzz_native_decoders_no_crash():
    """Mutated + truncated bitstreams must raise, decode, or be rejected —
    never crash the process (the reference's FuzzDecode tier)."""
    import io

    from webp_tpu.container.parser import Parser

    rng = np.random.default_rng(11)
    img = Image.open("/root/reference/testdata/test.png")
    b1 = io.BytesIO()
    img.convert("RGBA").resize((40, 28)).save(b1, format="WEBP",
                                              lossless=True, method=4)
    b2 = io.BytesIO()
    img.convert("RGB").resize((48, 32)).save(b2, format="WEBP", quality=70)
    ll = bytearray(Parser(b1.getvalue()).frames()[0].bitstream)
    lo = bytearray(Parser(b2.getvalue()).frames()[0].bitstream)
    for payload, dec in ((ll, native.vp8l_decode), (lo, native.vp8_decode)):
        for _ in range(120):
            mut = bytearray(payload)
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
            try:
                dec(bytes(mut))
            except Exception:
                pass
        for cut in range(5, len(payload), 11):
            try:
                dec(bytes(payload[:cut]))
            except Exception:
                pass


def test_native_mb_loop_matches_python_oracle(monkeypatch):
    """The C++ closed-loop MB encoder (vp8_enc_loop.cc) must be
    bit-identical to the Python loop across methods and segment counts —
    modes, levels, reconstruction, and the final bitstream."""
    from webp_tpu.encoder import rgb_to_yuv420
    from webp_tpu.lossy.encode import VP8Encoder, LossyConfig

    rng = np.random.default_rng(7)
    imgs = {
        "photo": np.asarray(Image.open(
            "/root/reference/testdata/test_color.png").convert("RGB")
            .resize((96, 72))),
        "noise": rng.integers(0, 256, (64, 48, 3), dtype=np.uint8),
        "grad": (np.arange(80)[None, :, None] *
                 np.array([3, 2, 1])[None, None, :] % 256).astype(np.uint8)
                .repeat(56, axis=0).reshape(56, 80, 3),
    }
    for rgb in imgs.values():
        h, w = rgb.shape[:2]
        y, u, v = rgb_to_yuv420(rgb)
        for method, segs in ((0, 1), (1, 4), (3, 1), (4, 4), (5, 4)):
            cfg = LossyConfig(quality=75, method=method, segments=segs,
                              sns_strength=50)
            monkeypatch.delenv("WEBPTPU_PY_LOOP", raising=False)
            e1 = VP8Encoder(y.copy(), u.copy(), v.copy(), w, h, cfg)
            d1 = e1.encode()
            monkeypatch.setenv("WEBPTPU_PY_LOOP", "1")
            e2 = VP8Encoder(y.copy(), u.copy(), v.copy(), w, h, cfg)
            d2 = e2.encode()
            monkeypatch.delenv("WEBPTPU_PY_LOOP")
            assert d1 == d2
            assert np.array_equal(e1.levels, e2.levels)
            assert np.array_equal(e1.recY, e2.recY)
            assert np.array_equal(e1.is_i4, e2.is_i4)


def test_native_alphas_match_python_oracle(monkeypatch):
    """vp8_compute_alphas (analysis pass) parity incl. the round-half-even
    DC means and the truncated global UV mean."""
    from webp_tpu.encoder import rgb_to_yuv420
    from webp_tpu.lossy import analysis

    rgb = np.asarray(Image.open(
        "/root/reference/testdata/test_color.png").convert("RGB")
        .resize((120, 88)))
    y, u, v = rgb_to_yuv420(rgb)
    mbw, mbh = y.shape[1] // 16, y.shape[0] // 16
    monkeypatch.delenv("WEBPTPU_PY_LOOP", raising=False)
    a1, g1 = analysis.compute_alphas(y, u, v, mbw, mbh)
    monkeypatch.setenv("WEBPTPU_PY_LOOP", "1")
    a2, g2 = analysis.compute_alphas(y, u, v, mbw, mbh)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert g1 == g2
