"""TPU micro-bench for the level-pack stage: full _pack_levels vs its
parts (nibble pack only / sort only / gather only), B=32 1536x1024."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as FP

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
mb_w, mb_h = 96, 64
n_mb = mb_w * mb_h
mpx = B * 1536 * 1024 / 1e6
esc_cap = max(1024, FP.ESC_BLOCKS_PER_MB * n_mb)

rng = np.random.default_rng(0)
# Realistic sparsity: mostly small levels, ~0.5% escape blocks.
lv = rng.integers(-3, 4, (B, n_mb, 24, 16), dtype=np.int16)
esc_rows = rng.random((B, n_mb, 24)) < 0.005
lv[esc_rows, 0] = 900
lvd = jax.device_put(lv)


def steady(fn, *args, k=4, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(k)]
        for o in outs:
            _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def run(name, f):
    t = steady(jax.jit(f), lvd)
    print(f"{name:10s} {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)


run("full", lambda l: jax.vmap(lambda x: FP._pack_levels(x, esc_cap))(l))


def nib_only(l):
    v = l.astype(jnp.int32)
    esc = jnp.abs(v) > 7
    nib = jnp.where(esc, 0, jnp.clip(v, -7, 7) + 8).astype(jnp.uint8)
    packed = nib[..., 0::2] | (nib[..., 1::2] << 4)
    return packed, esc.any(axis=-1)


run("nib", jax.vmap(nib_only))


def sort_only(l):
    def one(lv24):
        esc = jnp.abs(lv24.astype(jnp.int32)) > 7
        blk = esc.any(axis=-1).reshape(-1)
        n_blk = blk.shape[0]
        keys = jnp.where(blk, jnp.arange(n_blk, dtype=jnp.int32),
                         jnp.int32(n_blk))
        return jax.lax.sort(keys, is_stable=False)[:esc_cap]
    return jax.vmap(one)(l)


run("sort", sort_only)


def gather_only(l):
    def one(lv24):
        idx = jnp.arange(esc_cap, dtype=jnp.int32) * 7 % (n_mb * 24)
        return lv24.reshape(-1, 16)[idx]
    return jax.vmap(one)(l)


run("gather", gather_only)
