"""Per-phase device timing for the production two-phase encoder at the
bench config (B=32, 1536x1024, q75, segments=4, sns=50, I4 on).

Times (steady state over K dispatches, synced by a tiny fetch):
  yuv     — RGB->YUV420 import only
  part1   — phase 0 (segments) + phase 1 (I16/UV search) + I4 search
  phase2  — planar closed-loop wavefront only (given fixed modes)
  pack    — nibble pack + blobify
  full    — the production rgb_blob program
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as FP
from webp_tpu.ops import planar as PL
from webp_tpu.ops import yuv as devyuv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
W, H = 1536, 1024
mb_w, mb_h = W // 16, H // 16
mpx = W * H / 1e6
quality, SEGS, SNS = 75, 4, 50

src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((W, H))
rgb = np.asarray(src)
pad = np.broadcast_to(rgb, (B, H, W, 3)).copy()
dev_in = jax.device_put(pad)

fn = FP.fast_encode_fn(mb_w, mb_h, quality, SEGS, SNS, True)

qp, lambdas = FP.rd_params(quality)
lambdas_j = {k: jnp.float32(v) for k, v in lambdas.items()}
rt = FP.RateTables(np.asarray(__import__(
    "webp_tpu.lossy.tables", fromlist=["T"]).COEFFS_PROBA0))
n_mb = mb_w * mb_h


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    _ = np.asarray(leaves[-1].ravel()[:1])


def bench(name, f, *args):
    out = f(*args)
    sync(out)  # compile
    K = 4
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(K)]
        for o in outs:
            sync(o)
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:8s} {best*1e3:8.1f} ms/batch  "
          f"{B*mpx/best:7.1f} Mpx/s", flush=True)
    return out


# --- yuv only ---
yuv_j = jax.jit(jax.vmap(devyuv.rgb_to_yuv420))
Yb, Ub, Vb = bench("yuv", yuv_j, dev_in)

# --- part1 (phase 0 + 1 + i4 search) ---
import webp_tpu.lossy.tables as T

use_segments = True


def part1(Y, U, V):
    Y = Y.astype(jnp.int32)
    U = U.astype(jnp.int32)
    V = V.astype(jnp.int32)
    seg_map, seg_q, seg_beta = FP._segment_plan_device(
        Y, U, V, mb_w, mb_h, quality, SNS, SEGS)
    qp_i, lam_i, seg_rows = FP._mb_quant(seg_map, seg_q, n_mb)
    seg = (seg_map, seg_rows)
    tlsd4, tlsd = FP._tlsd_from_seg(SNS, seg_q, seg_map)
    modes, uvmodes, i16_score = FP._phase1(Y, U, V, qp_i, lam_i, rt,
                                           mb_w, mb_h, tlsd=tlsd)
    src_b = FP._block(Y.reshape(mb_h, 16, mb_w, 16)
                      .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16), 16)
    is_i4, i4_modes, _ = FP._i4_dispatch(
        Y, src_b, qp_i, lam_i, seg, rt, mb_w, mb_h, i16_score,
        tlsd=tlsd, tlsd4=tlsd4)
    return (modes, uvmodes, is_i4, i4_modes, seg_map, seg_q, seg_beta,
            seg_rows)


def seg_only(Y, U, V):
    Y = Y.astype(jnp.int32)
    U = U.astype(jnp.int32)
    V = V.astype(jnp.int32)
    return FP._segment_plan_device(Y, U, V, mb_w, mb_h, quality, SNS, SEGS)


def p1_only(Y, U, V):
    Y = Y.astype(jnp.int32)
    U = U.astype(jnp.int32)
    V = V.astype(jnp.int32)
    seg_map, seg_q, seg_beta = FP._segment_plan_device(
        Y, U, V, mb_w, mb_h, quality, SNS, SEGS)
    qp_i, lam_i, seg_rows = FP._mb_quant(seg_map, seg_q, n_mb)
    tlsd4, tlsd = FP._tlsd_from_seg(SNS, seg_q, seg_map)
    return FP._phase1(Y, U, V, qp_i, lam_i, rt, mb_w, mb_h, tlsd=tlsd)


bench("seg0", jax.jit(jax.vmap(seg_only)), Yb, Ub, Vb)
bench("p1+seg", jax.jit(jax.vmap(p1_only)), Yb, Ub, Vb)
res = bench("part1", jax.jit(jax.vmap(part1)), Yb, Ub, Vb)
(modes, uvmodes, is_i4, i4_modes, seg_map, seg_q, seg_beta, seg_rows) = res


# --- phase2 planar only ---
def p2(Yb, Ub, Vb, modes, uvmodes, is_i4, i4_modes, seg_map, seg_rows):
    seg = (seg_map, seg_rows)
    out = PL.phase2_planar(
        Yb.astype(jnp.int32), Ub.astype(jnp.int32), Vb.astype(jnp.int32),
        modes, uvmodes, qp, mb_w, mb_h,
        rd_drop=1024.0, seg=seg, i4=(is_i4, i4_modes), sk=1)
    return out[0], out[1]


p2j = jax.jit(p2)
lv24, y2 = bench("phase2", p2j, Yb, Ub, Vb, modes, uvmodes, is_i4,
                 i4_modes, seg_map, seg_rows)

# --- pack only ---
esc_cap = fn.esc_cap


def pack(lv24, y2):
    return jax.vmap(lambda l: FP._pack_levels(l, esc_cap))(lv24)


bench("pack", jax.jit(pack), lv24, y2)

# --- full production program ---
bench("full", fn.rgb_blob, dev_in)
