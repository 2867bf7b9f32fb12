"""Animation frame-parallel scaling on the virtual CPU mesh (SURVEY P6,
BASELINE config 5).

Encodes an N-frame 640x480 synthetic animation through
encode_animation_device and reports frames/s. Run once per device count:

  env PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=1 \
      python scripts/bench_anim_scaling.py 100
  env PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_anim_scaling.py 100

CAVEAT (recorded with the results): the virtual devices share ONE
physical core, so the 8-device run measures the mesh program's sharding
overhead versus the sequential batch — NOT ICI scaling. Steady-state
mesh efficiency on real hardware is the analytic B/(B+sp-1) pipeline
bound (see README Multi-chip); this benchmark validates that the mesh
path's compute cost per frame stays within a few percent of the
single-device program's.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
W, H = 640, 480

# Synthetic moving-gradient frames (all distinct so nothing merges).
yy, xx = np.mgrid[0:H, 0:W]
frames = []
for i in range(N_FRAMES):
    r = ((xx * 255 // W) + 5 * i) % 256
    g = ((yy * 255 // H) + 3 * i) % 256
    b = ((xx + yy + 11 * i) // 4) % 256
    frames.append(np.stack([r, g, b], axis=-1).astype(np.uint8))

import jax

ndev = len(jax.devices())
from webp_tpu.animation.animation import encode_animation_device

# Warm-up (compile) on a short prefix, then timed full run.
encode_animation_device(frames[:8], 40, quality=75)
t0 = time.perf_counter()
blob = encode_animation_device(frames, 40, quality=75)
dt = time.perf_counter() - t0
print(f"devices={ndev} frames={N_FRAMES} bytes={len(blob)} "
      f"{N_FRAMES / dt:.2f} frames/s ({dt:.1f}s)", flush=True)
