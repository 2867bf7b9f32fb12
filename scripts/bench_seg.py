"""TPU micro-bench: _hist_alpha_p variants (the 32-bin coefficient
histogram behind the segment plan), B=32 1536x1024 equivalents."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_mb = 96 * 64
L = B * n_mb
mpx = B * 1536 * 1024 / 1e6

rng = np.random.default_rng(0)
v = rng.integers(0, 8, (256, L)).astype(np.uint8)  # mostly small, like DCT
v[rng.random(v.shape) < 0.02] = 31
vd = jax.device_put(v)


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


def alpha_of(max_value, last_nz):
    alpha = jnp.where(max_value > 1,
                      510 * last_nz // jnp.maximum(max_value, 1), 0)
    return jnp.minimum(alpha, 255)


def cur(v):
    hist = jnp.stack([(v == k).sum(axis=0, dtype=jnp.int32)
                      for k in range(32)], axis=0)
    max_value = hist.max(axis=0)
    nz = hist > 0
    last_nz = jnp.where(nz.any(axis=0), 31 - jnp.argmax(nz[::-1], axis=0), 1)
    last_nz = jnp.maximum(last_nz, 1)
    return alpha_of(max_value, last_nz)


def two_stage(v):
    # last_nz without the histogram; counts via u8 partial sums of 16.
    C = v.shape[0]
    vr = v.reshape(C // 16, 16, v.shape[1])
    max_value = jnp.zeros(v.shape[1], jnp.int32)
    for k in range(32):
        part = (vr == k).astype(jnp.uint8).sum(axis=1, dtype=jnp.uint8)
        cnt = part.astype(jnp.int32).sum(axis=0)
        max_value = jnp.maximum(max_value, cnt)
    last_nz = jnp.maximum(v.max(axis=0).astype(jnp.int32), 1)
    return alpha_of(max_value, last_nz)


def i32_direct(v):
    # counts loop but last_nz from max(v); i32 sums.
    max_value = jnp.zeros(v.shape[1], jnp.int32)
    for k in range(32):
        cnt = (v == k).sum(axis=0, dtype=jnp.int32)
        max_value = jnp.maximum(max_value, cnt)
    last_nz = jnp.maximum(v.max(axis=0).astype(jnp.int32), 1)
    return alpha_of(max_value, last_nz)


def sort_mode(v):
    # mode count via sorted runs: max run length of equal values.
    s = jnp.sort(v, axis=0)
    eq = (s[1:] == s[:-1]).astype(jnp.int32)
    # max run of 1s per lane via prefix trick: run[i] = eq[i]*(run[i-1]+1)
    def step(c, x):
        c = (c + 1) * x
        return c, c
    _, runs = jax.lax.scan(step, jnp.zeros(v.shape[1], jnp.int32), eq)
    max_value = runs.max(axis=0) + 1
    last_nz = jnp.maximum(v.max(axis=0).astype(jnp.int32), 1)
    return alpha_of(max_value, last_nz)


def sliced4(v):
    """Bit-sliced histogram: each row contributes a 4-bit-field one-hot
    into 4 i32 accumulators (8 bins each); drain every 15 rows."""
    C, Lx = v.shape
    vi = v.astype(jnp.int32)
    counts = [jnp.zeros((Lx,), jnp.int32) for _ in range(32)]
    G = 15
    for g0 in range(0, C, G):
        accs = [jnp.zeros((Lx,), jnp.int32) for _ in range(4)]
        for r in range(g0, min(g0 + G, C)):
            row = vi[r]
            fld = jnp.left_shift(1, 4 * (row & 7))
            hi = row >> 3
            for a in range(4):
                accs[a] = accs[a] + jnp.where(hi == a, fld, 0)
        for a in range(4):
            for b in range(8):
                counts[a * 8 + b] = counts[a * 8 + b] + \
                    ((accs[a] >> (4 * b)) & 15)
    max_value = counts[0]
    for k in range(1, 32):
        max_value = jnp.maximum(max_value, counts[k])
    last_nz = jnp.maximum(v.max(axis=0).astype(jnp.int32), 1)
    return alpha_of(max_value, last_nz)


def i16_direct(v):
    max_value = jnp.zeros(v.shape[1], jnp.int16)
    for k in range(32):
        cnt = (v == k).sum(axis=0, dtype=jnp.int16)
        max_value = jnp.maximum(max_value, cnt)
    last_nz = jnp.maximum(v.max(axis=0).astype(jnp.int32), 1)
    return alpha_of(max_value.astype(jnp.int32), last_nz)


ref = None
for name, f in [("cur", cur), ("two_stage", two_stage),
                ("i32_direct", i32_direct), ("sliced4", sliced4),
                ("i16_direct", i16_direct)]:
    fj = jax.jit(f)
    out = np.asarray(fj(vd))
    if ref is None:
        ref = out
    else:
        assert np.array_equal(ref, out), name
    t = steady(fj, vd)
    print(f"{name:10s} {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)
