"""Device SharpYUV vs the host reference implementation."""

import numpy as np
from PIL import Image

from webp_tpu.ops.sharpyuv import sharp_yuv420
from webp_tpu.sharpyuv.convert import sharp_rgb_to_yuv420_planes


def test_device_matches_host_within_one():
    """The float-transfer device refinement must track the host fixed-point
    LUT path within 1 code value on every plane (sharpyuv/convert.py is the
    reference; the device evaluates the same BT.709 curves in float32)."""
    import jax

    im = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    rgb = np.asarray(im.resize((192, 128)))
    Yh, Uh, Vh = sharp_rgb_to_yuv420_planes(rgb)
    Yd, Ud, Vd = jax.jit(sharp_yuv420)(rgb)
    for h, d in ((Yh, Yd), (Uh, Ud), (Vh, Vd)):
        diff = np.abs(h.astype(int) - np.asarray(d).astype(int))
        assert diff.max() <= 1, diff.max()


def test_sharp_improves_psnr_on_device_encode():
    """Sharp YUV must raise decoded PSNR vs the plain import at equal
    quality settings (the point of the refinement; measured against the
    RGB source through the public codec round trip)."""
    import io

    from webp_tpu.container import riff as r
    from webp_tpu.lossy.device_encode import encode_lossy_batch

    im = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    rgb = np.asarray(im.resize((256, 160)))

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0 ** 2 / mse)

    scores = {}
    for sharp in (False, True):
        out = encode_lossy_batch(rgb[None], quality=75, segments=4,
                                 sns_strength=50, sharp_yuv=sharp)
        f = r.assemble_riff([r.Chunk(r.VP8, out[0])])
        dec = np.asarray(Image.open(io.BytesIO(f)).convert("RGB"))
        scores[sharp] = psnr(rgb, dec)
    assert scores[True] > scores[False] + 0.1, scores


def test_rd_dropout_shrinks_at_bounded_psnr():
    """The in-scan trellis-lite dropout (quantize rd_drop) must reduce the
    coded size with only a marginal PSNR cost vs the plain quantizer."""
    import io

    from PIL import Image

    from webp_tpu.container import riff as r
    from webp_tpu.lossy.device_encode import _fetch, _finish_one
    from webp_tpu.lossy.encode import LossyConfig
    from webp_tpu.ops.fastpath import fast_encode_fn

    im = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    rgb = np.asarray(im.resize((256, 160)))
    H, W = 160, 256
    cfg = LossyConfig(quality=75, segments=4, sns_strength=50)

    def run(rd):
        fn = fast_encode_fn(W // 16, H // 16, 75, 4, 50, True, rd_drop=rd)
        host = _fetch(fn.rgb(rgb[None]))
        vp8 = _finish_one({k: v[0] for k, v in host.items()},
                          W // 16, H // 16, W, H, cfg)
        f = r.assemble_riff([r.Chunk(r.VP8, vp8)])
        dec = np.asarray(Image.open(io.BytesIO(f)).convert("RGB"))
        mse = np.mean((dec.astype(np.float64) - rgb.astype(np.float64)) ** 2)
        return len(f), 10 * np.log10(255.0 ** 2 / mse)

    size0, psnr0 = run(0.0)
    size1, psnr1 = run(1024.0)
    assert size1 < size0, (size0, size1)
    assert psnr1 > psnr0 - 0.15, (psnr0, psnr1)
