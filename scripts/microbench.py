"""Micro-benchmark suite (the reference's bench_test.go:26-437 analog).

Covers the same scenario matrix — quality sweep, method sweep, alpha,
1080p/4K, lossless, decodes — and adds a same-host libwebp (Pillow)
column, since the reference's published numbers are M5-Max silicon and
not comparable to this harness's single core.

Usage: python scripts/microbench.py [--quick] [--json]
Host-only (no TPU needed); device-path numbers live in bench.py.
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import webp_tpu


def _best(f, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _img(size, alpha=False):
    im = Image.open("/root/reference/testdata/test_color.png").convert(
        "RGB").resize(size)
    a = np.asarray(im)
    if alpha:
        grad = ((np.arange(size[1])[:, None] * 5
                 + np.arange(size[0])[None, :]) % 256).astype(np.uint8)
        a = np.dstack([a, grad])
    return a


def _pil_save(a, **kw):
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="WEBP", **kw)
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="1 rep, skip 4K")
    ap.add_argument("--json", action="store_true", help="JSON lines output")
    args = ap.parse_args()
    reps = 1 if args.quick else 3

    base = _img((1536, 1024))
    scenarios = [
        ("lossy_q50_m4", base, dict(quality=50, method=4),
         dict(quality=50, method=4)),
        ("lossy_q75_m4", base, dict(quality=75, method=4),
         dict(quality=75, method=4)),
        ("lossy_q75_m0", base, dict(quality=75, method=0),
         dict(quality=75, method=0)),
        ("lossy_q75_m6", base, dict(quality=75, method=6),
         dict(quality=75, method=6)),
        ("lossy_q75_alpha", _img((1536, 1024), alpha=True),
         dict(quality=75, method=4), dict(quality=75, method=4)),
        ("lossy_q75_1080p", _img((1920, 1080)), dict(quality=75, method=4),
         dict(quality=75, method=4)),
        ("lossless_m4", base, dict(lossless=True, method=4),
         dict(lossless=True, quality=75, method=4)),
    ]
    if not args.quick:
        scenarios.append(
            ("lossy_q75_4k", _img((3840, 2160)), dict(quality=75, method=4),
             dict(quality=75, method=4)))

    rows = []
    for name, img, ours_kw, pil_kw in scenarios:
        mpx = img.shape[0] * img.shape[1] / 1e6
        ours_blob = webp_tpu.encode(img, **ours_kw)
        t_ours = _best(lambda: webp_tpu.encode(img, **ours_kw), reps)
        pil_blob = _pil_save(img, **pil_kw)
        t_pil = _best(lambda: _pil_save(img, **pil_kw), reps)
        rows.append({
            "scenario": name,
            "mpx": round(mpx, 2),
            "ours_mpx_s": round(mpx / t_ours, 2),
            "libwebp_mpx_s": round(mpx / t_pil, 2),
            "speed_ratio": round(t_pil / t_ours, 2),
            "ours_bytes": len(ours_blob),
            "libwebp_bytes": len(pil_blob),
            "size_ratio": round(len(ours_blob) / len(pil_blob), 4),
        })

    # Decode scenarios (ours vs Pillow on the same bitstreams).
    lossy = webp_tpu.encode(base, quality=75, method=4)
    lossless = webp_tpu.encode(base, lossless=True)
    mpx = base.shape[0] * base.shape[1] / 1e6
    for name, blob in (("decode_lossy", lossy), ("decode_lossless", lossless)):
        webp_tpu.decode(blob)
        t_ours = _best(lambda: webp_tpu.decode(blob), reps + 2)
        t_pil = _best(
            lambda: np.asarray(Image.open(io.BytesIO(blob)).convert("RGB")),
            reps + 2)
        rows.append({
            "scenario": name, "mpx": round(mpx, 2),
            "ours_mpx_s": round(mpx / t_ours, 2),
            "libwebp_mpx_s": round(mpx / t_pil, 2),
            "speed_ratio": round(t_pil / t_ours, 2),
        })

    if args.json:
        for r in rows:
            print(json.dumps(r))
        return
    hdr = ("scenario", "mpx", "ours Mpx/s", "libwebp Mpx/s", "speed x",
           "ours B", "libwebp B", "size x")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| {scenario} | {mpx} | {ours_mpx_s} | {libwebp_mpx_s} | "
              "{speed_ratio} | {ob} | {lb} | {sr} |".format(
                  ob=r.get("ours_bytes", ""), lb=r.get("libwebp_bytes", ""),
                  sr=r.get("size_ratio", ""), **r))


if __name__ == "__main__":
    main()
