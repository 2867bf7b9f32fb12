"""Per-phase device timing for the production two-phase encoder at the
bench config (B=32, 1536x1024, q75, segments=4, sns=50, I4 on).

Times (steady state over K dispatches, synced by a tiny fetch):
  yuv     — RGB->YUV420 import only
  part1   — planar phase 0 (segments) + phase 1 (I16/UV) + Pallas I4
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

# --- part1 (planar phase 0 + 1 + Pallas I4 search) ---
res = bench("part1", fn.part1, Yb, Ub, Vb)
(modes, uvmodes, is_i4, i4_modes, seg_map, seg_q, seg_beta,
 seg_rows, lam4, lam16_4, lamuv_4, lammd_4, dq_uv_b) = res


# --- i4 search alone (the Pallas planar kernel incl. its relayout) ---
def i4_only(Yb, seg_map, seg_rows, lam4, seg_q):
    from webp_tpu.ops import i4 as I4

    tabs, lam_i16_t, lam_uv_t, lam_i4_t, qi4_t = FP.all_q_tables()
    qi4_seg = jnp.take(jnp.asarray(qi4_t, jnp.int32), seg_q)
    tlsd4 = ((SNS * qi4_seg) >> 5).astype(jnp.float32)       # [B, 4]

    def one(Y, seg_m, seg_r, lam4_b, i16s_i, tl4):
        Y = Y.astype(jnp.int32)
        qtab = seg_r.reshape(16, 16).astype(jnp.int32)
        return I4.i4_search_pallas(Y, None, seg_m, qtab, lam4_b, rt,
                                   mb_w, mb_h, i16s_i, tlsd4=tl4)[:2]
    return jax.vmap(one)(Yb, seg_map, seg_rows["y1"], lam4,
                         jnp.zeros((B, n_mb), jnp.float32), tlsd4)


bench("i4", jax.jit(i4_only), Yb, seg_map, seg_rows, lam4, seg_q)


# --- segment plan alone ---
def seg_only(Yb, Ub, Vb):
    from webp_tpu.ops import phase1p as P1

    srcY = P1._src_planar(Yb, mb_h, mb_w, 16)
    srcU = P1._src_planar(Ub, mb_h, mb_w, 8)
    srcV = P1._src_planar(Vb, mb_h, mb_w, 8)
    return P1.plan_segments_planar(srcY, srcU, srcV, B, n_mb, quality,
                                   SNS, SEGS)


bench("seg", jax.jit(seg_only), Yb, Ub, Vb)


# --- phase2 planar only (as production at the bench config: sk=1, no
# in-scan search) ---
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
