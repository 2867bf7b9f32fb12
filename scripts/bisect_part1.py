"""Sub-bisection of part1 (YUV import + phase0/1 + I4 search) inside the
fused batched program — each variant nulls one stage to expose its in-situ
cost (same methodology as bench_bisect.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as FP
from webp_tpu.ops import phase1p as P1
from webp_tpu.ops import yuv as devyuv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
W, H = 1536, 1024
mb_w, mb_h = W // 16, H // 16
n_mb = mb_w * mb_h
mpx = B * W * H / 1e6
quality, SEGS, SNS = 75, 4, 50

src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((W, H))
pad = np.broadcast_to(np.asarray(src), (B, H, W, 3)).copy()
dev_in = jax.device_put(pad)

fn = FP.fast_encode_fn(mb_w, mb_h, quality, SEGS, SNS, True)


def steady(f, *args, k=2, reps=2):
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(k)]
        for o in outs:
            _ = np.asarray(jax.tree_util.tree_leaves(o)[-1].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def run(name, f):
    t = steady(jax.jit(f), dev_in)
    print(f"{name:12s} {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)


rt = FP.RateTables(np.asarray(__import__("webp_tpu.lossy.tables",
                                         fromlist=["T"]).COEFFS_PROBA0))
qp, lambdas = FP.rd_params(quality)
lambdas_j = {k: jnp.float32(v) for k, v in lambdas.items()}


def stage(rgbs, do_seg=True, do_p1=True, do_i4=True, do_src=True):
    Yb, Ub, Vb = jax.vmap(devyuv.rgb_to_yuv420)(rgbs)
    outs = [Yb.astype(jnp.int32).sum()]
    if not do_src:
        return tuple(outs)
    srcY = P1._src_planar(Yb, mb_h, mb_w, 16)
    srcU = P1._src_planar(Ub, mb_h, mb_w, 8)
    srcV = P1._src_planar(Vb, mb_h, mb_w, 8)
    outs += [srcY.astype(jnp.int32).sum(), srcU.astype(jnp.int32).sum(),
             srcV.astype(jnp.int32).sum()]
    if do_seg:
        seg_map, seg_q, seg_beta, _ = P1.plan_segments_planar(
            srcY, srcU, srcV, B, n_mb, quality, SNS, SEGS)
        outs += [seg_map.sum(), seg_q.sum()]
    if do_p1:
        qp_rows = {k: tuple(jnp.asarray(a, jnp.int32).reshape(16, 1)
                            for a in qp[k]) for k in ("y1", "y2", "uv")}
        lam_l = {"i16": lambdas_j["i16"], "uv": lambdas_j["uv"]}
        modes, uvmodes, i16s = P1.phase1_planar(
            Yb, Ub, Vb, qp_rows, lam_l, rt, mb_w, mb_h, tlsd=None,
            srcs=(srcY, srcU, srcV))
        outs += [modes.sum(), uvmodes.sum(), i16s.sum()]
    else:
        i16s = jnp.zeros((B, n_mb), jnp.float32)
    if do_i4:
        def i4_one(Y, i16sc):
            Y = Y.astype(jnp.int32)
            src_b = FP._block(
                Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3)
                .reshape(n_mb, 16, 16), 16)
            return FP._i4_dispatch(Y, src_b, qp, lambdas_j, None, rt,
                                   mb_w, mb_h, i16sc)[:2]
        is_i4, i4m = jax.vmap(i4_one)(Yb, i16s)
        outs += [is_i4.sum(), i4m.sum()]
    return tuple(outs)


run("yuv-only", lambda r: stage(r, do_seg=False, do_p1=False, do_i4=False,
                                do_src=False))
run("+src", lambda r: stage(r, do_seg=False, do_p1=False, do_i4=False))
run("+seg", lambda r: stage(r, do_p1=False, do_i4=False))
run("+p1", lambda r: stage(r, do_i4=False))
run("+i4(full)", lambda r: stage(r))
