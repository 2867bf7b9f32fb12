"""TPU micro-bench: RGB->YUV420 import variants at B=32 1536x1024.

  pow   — current ops/yuv.py (float power curves)
  lut   — gamma LUTs via one-hot matmuls on the MXU (bit-exact vs the
          host LUT+interp path, encoder.py:91)
  yonly — luma plane only (lower bound: no gamma chroma)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from webp_tpu.ops import yuv as devyuv
from webp_tpu import encoder as E

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
W, H = 1536, 1024
mpx = B * W * H / 1e6

src = Image.open("/root/reference/testdata/test_color.png").convert(
    "RGB").resize((W, H))
pad = np.broadcast_to(np.asarray(src), (B, H, W, 3)).copy()
dev_in = jax.device_put(pad)

E._init_gamma()
G2L = jnp.asarray(E._gamma_to_linear, jnp.float32)          # [256]
L2G = jnp.asarray(E._linear_to_gamma, jnp.float32)          # [34]


def lut_yuv420(rgb):
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    yy = (E.K_RGB_TO_Y[0] * r + E.K_RGB_TO_Y[1] * g + E.K_RGB_TO_Y[2] * b
          + E.YUV_HALF + (16 << E.YUV_FIX)) >> E.YUV_FIX
    Y = jnp.clip(yy, 0, 255).astype(jnp.uint8)

    h, w = r.shape[-2:]
    shift = E.K_GAMMA_TAB_FIX + 2                            # 9
    xmax = E.K_GAMMA_TAB_SCALE << 2                          # 512
    gam = []
    for c in (r, g, b):
        lin = (jax.nn.one_hot(c, 256, dtype=jnp.float32) @ G2L
               ).astype(jnp.int32)
        l4 = lin.reshape(*lin.shape[:-2], h // 2, 2, w // 2, 2)
        acc = l4.sum(axis=(-3, -1))
        # host _linear_to_gamma_interp(acc, 0): tab_pos = min(acc>>9, 31),
        # x = acc & 511, y = v1*x + v0*(512-x), (y + 64) >> 7.
        idx = jnp.minimum(acc >> shift, E.K_GAMMA_TAB_SIZE - 1)
        x = acc & (xmax - 1)
        t0 = (jax.nn.one_hot(idx, 34, dtype=jnp.float32) @ L2G
              ).astype(jnp.int32)
        t1 = (jax.nn.one_hot(idx + 1, 34, dtype=jnp.float32) @ L2G
              ).astype(jnp.int32)
        y2 = t1 * x + t0 * (xmax - x)
        gam.append((y2 + (E.K_GAMMA_TAB_SCALE >> 1)) >> E.K_GAMMA_TAB_FIX)
    rg, gg, bg = gam
    ru = (E.K_RGB_TO_U[0] * rg + E.K_RGB_TO_U[1] * gg + E.K_RGB_TO_U[2] * bg
          + (E.YUV_HALF << 2) + (128 << (E.YUV_FIX + 2))) >> (E.YUV_FIX + 2)
    rv = (E.K_RGB_TO_V[0] * rg + E.K_RGB_TO_V[1] * gg + E.K_RGB_TO_V[2] * bg
          + (E.YUV_HALF << 2) + (128 << (E.YUV_FIX + 2))) >> (E.YUV_FIX + 2)
    U = jnp.clip(ru, 0, 255).astype(jnp.uint8)
    V = jnp.clip(rv, 0, 255).astype(jnp.uint8)
    return Y, U, V


def y_only(rgb):
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    yy = (E.K_RGB_TO_Y[0] * r + E.K_RGB_TO_Y[1] * g + E.K_RGB_TO_Y[2] * b
          + E.YUV_HALF + (16 << E.YUV_FIX)) >> E.YUV_FIX
    return jnp.clip(yy, 0, 255).astype(jnp.uint8)


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


pow_j = jax.jit(jax.vmap(devyuv.rgb_to_yuv420))
lut_j = jax.jit(jax.vmap(lut_yuv420))
y_j = jax.jit(jax.vmap(y_only))

t = steady(pow_j, dev_in)
print(f"pow   {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)
t = steady(lut_j, dev_in)
print(f"lut   {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)
t = steady(y_j, dev_in)
print(f"yonly {t*1e3:7.1f} ms  {mpx/t:8.1f} Mpx/s", flush=True)

# parity: lut vs host oracle on one image
Yl, Ul, Vl = (np.asarray(a[0]) for a in lut_j(dev_in[:1]))
Yh, Uh, Vh = E.rgb_to_yuv420(pad[0])
print("lut parity vs host:",
      int(np.abs(Yl.astype(int) - Yh.astype(int)).max()),
      int(np.abs(Ul.astype(int) - Uh.astype(int)).max()),
      int(np.abs(Vl.astype(int) - Vh.astype(int)).max()), flush=True)
