"""Program-level bisection of the production batched encoder: compile the
SAME fused pipeline with one stage nulled at a time, so each number shows
that stage's cost inside the fused program (standalone stage timings
mislead — XLA overlaps them differently in situ).

Variants (B=32, 1536x1024, q75 segs=4 sns=50):
  full      part1 + phase2 + part3(pack+blobify)
  -pack     part3 replaced by cheap sums (keeps phase2 outputs alive)
  -phase2   phase2 replaced by zeros (keeps part1 outputs alive)
  -i4       part1 with the Pallas I4 search output replaced by zeros
            (env WEBPTPU_NO_I4SEARCH bisect knob is not present; emulated
            by i4_blocks=False which also simplifies phase2)
  p1only    part1 alone + blobify of its small outputs
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
qp, _ = FP.rd_params(quality)
esc_cap = fn.esc_cap


def steady(f, *args, k=4, reps=3):
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
    print(f"{name:9s} {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)


from webp_tpu.ops import yuv as devyuv


def pipeline(rgbs, do_phase2=True, do_pack=True):
    Yb, Ub, Vb = jax.vmap(devyuv.rgb_to_yuv420)(rgbs)
    (modes, uvmodes, is_i4, i4_modes, seg_map, seg_q, seg_beta,
     seg_rows, lam4, lam16_4, lamuv_4, lammd_4) = fn.part1(Yb, Ub, Vb)
    if not do_phase2:
        # keep part1 outputs live with a cheap consumer
        return (modes.sum(), uvmodes.sum(), is_i4.sum(), i4_modes.sum(),
                seg_map.sum(), jnp.int32(0))
    seg = (seg_map, seg_rows)
    out = PL.phase2_planar(
        Yb.astype(jnp.int32), Ub.astype(jnp.int32), Vb.astype(jnp.int32),
        modes, uvmodes, qp, mb_w, mb_h,
        rd_drop=1024.0, seg=seg, i4=(is_i4, i4_modes), sk=1)
    lv24, y2 = out[0], out[1]
    if not do_pack:
        return (lv24.sum(), y2.sum(), jnp.int32(0))

    def part3(lv24, y2):
        packed, esc_idx, esc_val, esc_cnt = FP._pack_levels(lv24, esc_cap)
        skip = (lv24 == 0).all(axis=(-2, -1)) & (y2 == 0).all(axis=-1)
        return packed.sum(), esc_idx.sum(), esc_val.sum(), skip.sum(), \
            esc_cnt
    return jax.vmap(part3)(lv24, y2)


run("full", lambda r: pipeline(r))
run("-pack", lambda r: pipeline(r, do_pack=False))
run("-phase2", lambda r: pipeline(r, do_phase2=False))
