"""Device-path default (q75 m4, no sharp-YUV) vs libwebp m4: size + PSNR
on the benchmark photo and the 768/384 crops (VERDICT round-2 weak #5)."""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import webp_tpu


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float((d * d).mean())
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)


src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((1536, 1024))
full = np.asarray(src)
cases = [("1536x1024", full),
         ("768x512", full[256:768, 384:1152].copy()),
         ("384x256", full[384:640, 576:960].copy())]

method = int(sys.argv[1]) if len(sys.argv) > 1 else 4
backend = sys.argv[2] if len(sys.argv) > 2 else "device"

for name, rgb in cases:
    im = Image.fromarray(rgb)
    mine = webp_tpu.encode(rgb, quality=75, method=method, backend=backend)
    out = np.asarray(Image.open(io.BytesIO(mine)).convert("RGB"))
    b = io.BytesIO()
    im.save(b, format="WEBP", quality=75, method=4)
    lw = b.getvalue()
    lw_out = np.asarray(Image.open(io.BytesIO(lw)).convert("RGB"))
    p_m, p_l = psnr(out, rgb), psnr(lw_out, rgb)
    print(f"{name}: ours m{method}/{backend} {len(mine)}B {p_m:.2f}dB | "
          f"libwebp m4 {len(lw)}B {p_l:.2f}dB | "
          f"size x{len(mine)/len(lw):.4f} dPSNR {p_m-p_l:+.2f}", flush=True)
