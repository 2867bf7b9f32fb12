"""Raw achievable HBM bandwidth on this chip: sum / copy / axpy over big
arrays, plus a big bf16 matmul for FLOPs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

GB = 1e9
x_u8 = jax.device_put(np.zeros((512, 1024, 1024), np.uint8))     # 512 MB
x_f32 = jax.device_put(np.zeros((64, 1024, 1024), np.float32))   # 256 MB
a_bf = jax.device_put(np.zeros((8192, 8192), np.float32).astype(jnp.bfloat16))


def steady(fn, *args, k=4, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(k)]
        for o in outs:
            _ = np.asarray(jax.tree_util.tree_leaves(o)[-1].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


t = steady(jax.jit(lambda x: x.sum(dtype=jnp.int32)), x_u8)
print(f"u8 sum 512MB read:   {t*1e3:7.1f} ms  {0.512/t:6.1f} GB/s")
t = steady(jax.jit(lambda x: x.sum()), x_f32)
print(f"f32 sum 256MB read:  {t*1e3:7.1f} ms  {0.256/t:6.1f} GB/s")
t = steady(jax.jit(lambda x: x + 1), x_f32)
print(f"f32 add 256MB r+w:   {t*1e3:7.1f} ms  {0.512/t:6.1f} GB/s")
t = steady(jax.jit(lambda a: a @ a), a_bf)
fl = 2 * 8192**3
print(f"bf16 8k matmul:      {t*1e3:7.1f} ms  {fl/t/1e12:6.1f} TFLOP/s")
