"""Benchmark: end-to-end lossy encode throughput at Q75 (the reference's
headline metric, BASELINE.md: 32.9 Mpx/s on Apple M5 Max).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Uses testdata/test_color.png (1536x1024) when the fast native path is
available; otherwise measures on a downscaled tile (honest throughput,
smaller wall-clock) until the native/device hot paths land.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image

import webp_tpu

BASELINE_MPX_S = 32.9  # reference lossy encode Q75 (BASELINE.md)


def _native_available() -> bool:
    try:
        from webp_tpu.native import loader

        return loader.available()
    except Exception:
        return False


def _device_available() -> bool:
    try:
        import jax

        return len(jax.devices()) > 0
    except Exception:
        return False


def main() -> None:
    src = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    device = _device_available()
    native = _native_available()
    backend = "device" if device else "host"
    if not device and not native:
        src = src.resize((384, 256))  # pure-Python fallback: honest but small
    rgb = np.asarray(src)
    h, w = rgb.shape[:2]
    mpx = w * h / 1e6

    if device:
        # Batched device throughput: 8 distinct full-size images per launch.
        variants = [rgb, rgb[::-1].copy(), rgb[:, ::-1].copy(),
                    np.rot90(rgb, 2).copy()]
        rgbs = [v for v in variants] + [np.roll(v, 7, axis=1) for v in variants]
        out = webp_tpu.encode_batch(rgbs, quality=75)  # warmup/compile
        assert all(len(o) > 0 for o in out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            webp_tpu.encode_batch(rgbs, quality=75)
            times.append(time.perf_counter() - t0)
        value = len(rgbs) * mpx / min(times)
        unit = f"Mpx/s ({w}x{h} x{len(rgbs)} batch, q75, device+native, 1 chip)"
    else:
        data = webp_tpu.encode(rgb, quality=75, method=4, backend=backend)
        assert len(data) > 0
        runs = 4 if native else 1
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            webp_tpu.encode(rgb, quality=75, method=4, backend=backend)
            times.append(time.perf_counter() - t0)
        value = mpx / min(times)
        unit = f"Mpx/s ({w}x{h}, q75, backend={backend}, 1 chip)"

    print(json.dumps({
        "metric": "lossy_encode_q75_mpx_per_s",
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(value / BASELINE_MPX_S, 4),
    }))


if __name__ == "__main__":
    main()
