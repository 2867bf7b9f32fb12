"""TPU micro-bench: device lossy decode (fused recon+filter scan)."""

import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")

from PIL import Image
import io


def main():
    src = Image.open("/root/reference/testdata/test_color.png").convert(
        "RGB").resize((1536, 1024))
    rgb = np.asarray(src)
    h, w = rgb.shape[:2]
    mpx = w * h / 1e6
    import webp_tpu
    from webp_tpu.container import riff as r
    from webp_tpu.lossy.device_decode import _parse_inputs, _run_device

    blob = webp_tpu.encode(rgb, quality=75, method=4, backend="device")
    vp8 = None
    # extract raw VP8 payload
    from webp_tpu.container.parser import parse_container
    feats = parse_container(blob)
    vp8 = feats.vp8_data

    parsed = _parse_inputs(vp8)
    t0 = time.perf_counter()
    out = _run_device(parsed, upsample=False)
    _ = [np.asarray(o[0, :1, :1]) for o in out]
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    K = 8
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [_run_device(parsed, upsample=False) for _ in range(K)]
        for o in outs:
            _ = np.asarray(o[0][0, :1, :1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"device decode YUV (B=1): {best*1e3:.1f} ms "
          f"({mpx/best:.1f} Mpx/s)")


if __name__ == "__main__":
    main()
