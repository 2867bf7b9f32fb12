"""XLA cost analysis of the production batched encoder: bytes accessed
and flops per the compiler's own model, to target HBM traffic (this
harness chip measures ~17 GB/s effective HBM — scripts/bench_hbm.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as FP

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
W, H = 1536, 1024
fn = FP.fast_encode_fn(W // 16, H // 16, 75, 4, 50, True)

x = jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8)
lowered = jax.jit(fn.rgb_blob).lower(x)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
keys = sorted(ca.keys())
ba = ca.get("bytes accessed", 0)
print(f"bytes accessed: {ba/1e9:.2f} GB  "
      f"(at 17 GB/s -> {ba/17e9*1e3:.0f} ms)")
print(f"flops: {ca.get('flops', 0)/1e9:.1f} G")
for k in keys:
    if k.startswith("bytes accessed") and k != "bytes accessed":
        print(f"  {k}: {ca[k]/1e9:.3f} GB")
mem = compiled.memory_analysis()
print(mem)
