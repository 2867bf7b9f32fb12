"""Bisect pack_wire_planar's parts on skewed-shaped random data."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from webp_tpu.ops import planar as PL

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
mb_w, mb_h, sk = 96, 64, 1
T = mb_w + sk * (mb_h - 1)
N = B * mb_h
n_mb = mb_w * mb_h
esc_cap = 6144
mpx = B * 1536 * 1024 / 1e6

rng = np.random.default_rng(0)
lv = rng.integers(-3, 4, (T, 24, 16, N)).astype(np.int16)
tt, cc, nn = np.where(rng.random((T, 24, N)) < 0.005)
lv[tt, cc, 0, nn] = 900
y2 = rng.integers(-3, 4, (T, 16, N)).astype(np.int16)
lvd, y2d = jax.device_put(lv), jax.device_put(y2)


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


def run(name, f):
    t = steady(jax.jit(f), lvd, y2d)
    print(f"{name:10s} {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)


run("wire_full", lambda l, y: PL.pack_wire_planar(
    l, y, B, mb_w, mb_h, T, sk, esc_cap))


def nib_unskew(l, y):
    v = l.astype(jnp.int32)
    esc = jnp.abs(v) > 7
    nib = jnp.where(esc, 0, jnp.clip(v, -7, 7) + 8).astype(jnp.uint8)
    packed_sk = nib[:, :, 0::2, :] | (nib[:, :, 1::2, :] << 4)
    return PL._unskew_b(packed_sk, B, mb_w, mb_h, T, sk)


run("nib+unsk", nib_unskew)


def sort_part(l, y):
    v = l.astype(jnp.int32)
    esc = jnp.abs(v) > 7
    valid = PL._valid_mask_np(B, mb_w, mb_h, T, sk)
    escb = esc.any(axis=2) & valid[:, None, :]
    fl = escb.reshape(T, 24, B, mb_h).transpose(2, 0, 1, 3) \
        .reshape(B, T * 24 * mb_h)
    n_lid = T * 24 * mb_h
    lids = jnp.arange(n_lid, dtype=jnp.int32)
    keys = jnp.where(fl, lids[None, :], jnp.int32(n_lid))
    idx = jax.lax.sort(keys, dimension=1, is_stable=False)[:, :esc_cap]
    return jnp.where(idx >= n_lid, 0, idx), fl.sum(axis=1)


run("esc_sort", sort_part)


def gather_part(l, y):
    idx, cnt = sort_part(l, y)
    t_of = idx // (24 * mb_h)
    c_of = (idx // mb_h) % 24
    y_of = idx % mb_h
    lv_flat = l.reshape(-1)
    j16 = (jnp.arange(16, dtype=jnp.int32) * N)[None, :]

    def gather_one(b, tt, cc, yy):
        base = ((tt * 24 + cc) * 16) * N + b * mb_h + yy
        return lv_flat[base[:, None] + j16]

    return jax.vmap(gather_one)(
        jnp.arange(B, dtype=jnp.int32), t_of, c_of, y_of)


run("esc+gath", gather_part)


def y2_skip(l, y):
    v = l.astype(jnp.int32)
    blk_z = (v == 0).all(axis=2)
    mb_skip = blk_z.all(axis=1) & (y == 0).all(axis=1)
    return (PL._unskew_b(mb_skip, B, mb_w, mb_h, T, sk),
            PL._unskew_b(y, B, mb_w, mb_h, T, sk))


run("y2+skip", y2_skip)
