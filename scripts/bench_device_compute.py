"""Device-compute-only throughput for the batched encoder (rgb_blob
program), steady-state over K async dispatches. Compares configs fast.

Usage: python scripts/bench_device_compute.py [B] [sns] [segments] [sk]
Set WEBPTPU_NO_PLANAR=1 to measure the pre-planar formulation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax

from webp_tpu.ops.fastpath import fast_encode_fn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SNS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
SEGS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SK = int(sys.argv[4]) if len(sys.argv) > 4 else 1
TRELLIS = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
SEARCH = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
W, H = 1536, 1024
mpx = W * H / 1e6

src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((W, H))
rgb = np.asarray(src)
pad = np.broadcast_to(rgb, (B, H, W, 3)).copy()

t0 = time.perf_counter()
fn = fast_encode_fn(W // 16, H // 16, 75, SEGS, SNS, True, sk=SK,
                    trellis=TRELLIS, i4_mode_search=SEARCH)
PLANAR_IN = not os.environ.get("WEBPTPU_INTERLEAVED_IN")
if PLANAR_IN:
    entry = fn.rgbp_blob
    dev_in = jax.device_put(np.ascontiguousarray(pad.transpose(0, 3, 1, 2)))
else:
    entry = fn.rgb_blob
    dev_in = jax.device_put(pad)


def sync(out):
    _ = np.asarray(out[-1])


sync(entry(dev_in))
print(f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
K = 4
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    outs = [entry(dev_in) for _ in range(K)]
    for o in outs:
        sync(o)
    best = max(best, K * B * mpx / (time.perf_counter() - t0))
planar = "off" if os.environ.get("WEBPTPU_NO_PLANAR") else "on"
print(f"B={B} sns={SNS} segs={SEGS} sk={SK} trellis={int(TRELLIS)} "
      f"search={int(SEARCH)} planar={planar} "
      f"planar_in={int(PLANAR_IN)}: {best:.1f} Mpx/s", flush=True)
