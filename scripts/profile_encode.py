"""Profile the device encoder's phase splits on the real chip.

Times phase0+1 (analysis + mode search), i4 dispatch, phase2 scan, and
the full pipeline separately, steady-state (K async dispatches, one sync
via a tiny fetch — the axon tunnel costs ~27 ms per blocking call).

Usage: python scripts/profile_encode.py [B] [sns]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as fp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SNS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
SK = int(sys.argv[3]) if len(sys.argv) > 3 else 1
W, H = 1536, 1024
mb_w, mb_h = W // 16, H // 16
n_mb = mb_w * mb_h
quality = 75
segments = 4

src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((W, H))
rgb = np.asarray(src)
from webp_tpu.encoder import rgb_to_yuv420
Yh, Uh, Vh = rgb_to_yuv420(rgb)
Yb = np.broadcast_to(Yh, (B,) + Yh.shape).copy()
Ub = np.broadcast_to(Uh, (B,) + Uh.shape).copy()
Vb = np.broadcast_to(Vh, (B,) + Vh.shape).copy()

qp, lambdas = fp.rd_params(quality)
q_i4_static = lambdas["q_i4"]
lambdas_j = {k: jnp.float32(v) for k, v in lambdas.items()}
rt = fp.RateTables(np.asarray(fp.T.COEFFS_PROBA0))


def stage01(Y, U, V):
    Y, U, V = (a.astype(jnp.int32) for a in (Y, U, V))
    seg_map, seg_q, seg_beta, _ = fp._segment_plan_device(
        Y, U, V, mb_w, mb_h, quality, SNS, segments)
    qp_i, lam_i, seg_rows = fp._mb_quant(seg_map, seg_q, n_mb)
    tlsd4, tlsd = fp._tlsd_from_seg(SNS, seg_q, seg_map)
    modes, uvmodes, i16_score = fp._phase1(Y, U, V, qp_i, lam_i, rt,
                                           mb_w, mb_h, tlsd=tlsd)
    return modes, uvmodes, i16_score, seg_map, seg_q


def stage_i4(Y, U, V):
    Y, U, V = (a.astype(jnp.int32) for a in (Y, U, V))
    seg_map, seg_q, seg_beta, _ = fp._segment_plan_device(
        Y, U, V, mb_w, mb_h, quality, SNS, segments)
    qp_i, lam_i, seg_rows = fp._mb_quant(seg_map, seg_q, n_mb)
    seg = (seg_map, seg_rows)
    tlsd4, tlsd = fp._tlsd_from_seg(SNS, seg_q, seg_map)
    modes, uvmodes, i16_score = fp._phase1(Y, U, V, qp_i, lam_i, rt,
                                           mb_w, mb_h, tlsd=tlsd)
    src_b = fp._block(Y.reshape(mb_h, 16, mb_w, 16)
                      .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16), 16)
    is_i4, i4_modes, _ = fp._i4_dispatch(
        Y, src_b, qp_i, lam_i, seg, rt, mb_w, mb_h, i16_score,
        tlsd=tlsd, tlsd4=tlsd4, allow_tr=(SK == 2))
    return is_i4, i4_modes


def full(Y, U, V):
    fn = fp.fast_encode_fn(mb_w, mb_h, quality, segments=segments,
                           sns_strength=SNS, i4_blocks=True, sk=SK)
    return fn


def timeit(name, jfn, args, n=4):
    outs = jfn(*args)
    leaves = jax.tree_util.tree_leaves(outs)
    tiny = jax.jit(lambda *a: sum(jnp.sum(x[..., :1].astype(jnp.float32))
                                  for x in jax.tree_util.tree_leaves(a)))
    s = tiny(outs)
    np.asarray(s)  # warm + sync
    t0 = time.perf_counter()
    accs = []
    for _ in range(n):
        o = jfn(*args)
        accs.append(tiny(o))
    np.asarray(accs[-1])
    dt = (time.perf_counter() - t0) / n
    mpx = B * W * H / 1e6
    print(f"{name:22s} {dt*1e3:8.1f} ms  {mpx/dt:8.1f} Mpx/s")
    return dt


print(f"B={B} {W}x{H} q{quality} seg{segments} sns{SNS} sk{SK}")
j01 = jax.jit(jax.vmap(stage01))
ji4 = jax.jit(jax.vmap(stage_i4))
fn = full(None, None, None)

t01 = timeit("phase0+1", j01, (Yb, Ub, Vb))
ti4 = timeit("phase0+1+i4", ji4, (Yb, Ub, Vb))
tfull = timeit("full (dict)", fn, (Yb, Ub, Vb))
print(f"{'i4 marginal':22s} {(ti4-t01)*1e3:8.1f} ms")
print(f"{'phase2 marginal':22s} {(tfull-ti4)*1e3:8.1f} ms")
