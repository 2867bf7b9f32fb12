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


def test_device_backend_matches_host_i16(photo):
    """Device wavefront must reproduce the host encoder's I16 path exactly
    (same levels/modes) on CPU-jax, modulo float32 near-tie mode choices."""
    import jax

    from webp_tpu.encoder import rgb_to_yuv420
    from webp_tpu.lossy.encode import VP8Encoder, LossyConfig
    from webp_tpu.ops.wavefront import wavefront_encode_fn

    img = photo[:64, :80]
    h, w = img.shape[:2]
    Y, U, V = rgb_to_yuv420(img)
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    fn = wavefront_encode_fn(mbw, mbh, 75)
    lv, y2, modes, uvm, skip = [np.asarray(o) for o in fn(Y, U, V)]
    enc = VP8Encoder(Y, U, V, w, h,
                     LossyConfig(quality=75, i4_blocks=False,
                                 segments=1, sns_strength=0))
    enc.encode()
    assert np.array_equal(lv.reshape(mbh, mbw, 24, 16), enc.levels)
    assert np.array_equal(y2.reshape(mbh, mbw, 16), enc.y2_levels)
    assert np.array_equal(modes.reshape(mbh, mbw), enc.imodes[..., 0])


def test_device_backend_end_to_end(photo):
    data = webp_tpu.encode(photo, quality=75, backend="device")
    ref = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), ref)
    assert _psnr(photo, ref) > 25


@pytest.mark.slow
def test_encode_batch_matches_single(photo):
    """encode_batch (one device launch for N same-sized images) must be
    conformant and bit-identical to the single-image device encode."""
    imgs = [photo, photo[::-1].copy(), np.roll(photo, 5, axis=1)]
    batch = webp_tpu.encode_batch(imgs, quality=75)
    for img, data in zip(imgs, batch):
        ref = pil_decode_rgba(data)[..., :3]
        assert np.array_equal(webp_tpu.decode(data), ref)
        single = webp_tpu.encode(img, quality=75, backend="device")
        assert data == single


@pytest.mark.slow
def test_device_backend_method5_skew2(photo):
    """method>=5 device path: skew-2 closed loop, full I4 mode set. The
    stream must stay conformant (our decoder == Pillow — a TR context
    mismatch vs the decoder rule would show up as drift), and the lifted
    rightmost-column ban must actually be exercised."""
    data = webp_tpu.encode(photo, quality=75, method=5, backend="device")
    ref = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), ref)
    assert _psnr(photo, ref) > 25

    from webp_tpu.ops.fastpath import fast_encode_fn, unpack_output_blob
    from webp_tpu.ops.i4 import TR_MODES

    h, w = photo.shape[:2]
    H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    pad = np.zeros((H, W, 3), np.uint8)
    pad[:h, :w] = photo
    pad[h:, :w] = photo[h - 1:h]
    fn = fast_encode_fn(W // 16, H // 16, 75, 4, 50, True, sk=2)
    out = unpack_output_blob(fn.rgb_blob(pad[None]), fn.blob_spec)
    imodes = out["imodes"][0].reshape(-1, 16)[out["is_i4"][0].astype(bool)]
    assert np.isin(imodes[:, 3::4], TR_MODES).any(), \
        "skew-2 search never picked a TR mode on the rightmost column"


def test_segments_4(photo):
    data = webp_tpu.encode(photo, quality=60, segments=4)
    ref = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), ref)
    # Bitstream declares segmentation.
    from webp_tpu.container.parser import Parser
    from webp_tpu.lossy.decode import VP8Decoder

    dec = VP8Decoder(Parser(data).frames()[0].bitstream)
    assert dec.seg_hdr.use_segment


@pytest.mark.slow
@pytest.mark.parametrize("segments", [2, 3])
def test_device_backend_segments_lt4(photo, segments):
    """Device path with segments<4 (e.g. the 'text' preset uses 2): the
    4-wide quant expansion must pad, not crash (round-1 advisor finding)."""
    data = webp_tpu.encode(photo, quality=60, segments=segments,
                           backend="device")
    ref = pil_decode_rgba(data)[..., :3]
    assert np.array_equal(webp_tpu.decode(data), ref)
    assert _psnr(photo, ref) > 25


def test_q75_m4_sharpyuv_beats_libwebp(photo):
    """Driver config 3: Q75 method-4 sharp-YUV must match or beat libwebp
    in rate-distortion terms: using the ~0.05 dB-per-1%-rate exchange rate
    (0.5 dB per 10%, the usual BD slope at these rates), our PSNR
    advantage must cover any size increase (and vice versa)."""
    img = np.array(Image.open("/root/reference/testdata/test_color.png")
                   .convert("RGB").resize((320, 224)))
    ours = webp_tpu.encode(img, quality=75, method=4, use_sharp_yuv=True)
    op = _psnr(img, pil_decode_rgba(ours)[..., :3])
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", quality=75, method=4)
    lp = _psnr(img, pil_decode_rgba(buf.getvalue())[..., :3])
    lsize = len(buf.getvalue())
    rate_pct = 100.0 * (len(ours) - lsize) / lsize
    assert (op - lp) >= 0.05 * rate_pct, (len(ours), op, lsize, lp)


@pytest.mark.slow
def test_device_backend_method6_search(photo):
    """method>=6 device path: in-scan closed-loop I4 mode search +
    trellis. Conformance (our decoder == Pillow) plus an RD sanity
    check: m6 must not be larger AND worse than the m4 device path."""
    d6 = webp_tpu.encode(photo, quality=75, method=6, backend="device")
    ref6 = pil_decode_rgba(d6)[..., :3]
    assert np.array_equal(webp_tpu.decode(d6), ref6)
    p6 = _psnr(photo, ref6)
    assert p6 > 25

    d4 = webp_tpu.encode(photo, quality=75, method=4, backend="device")
    p4 = _psnr(photo, pil_decode_rgba(d4)[..., :3])
    assert len(d6) < len(d4) or p6 >= p4 - 0.05, (
        f"m6 worse on both axes: {len(d6)}B/{p6:.2f}dB "
        f"vs m4 {len(d4)}B/{p4:.2f}dB")
