"""Device-side color conversion (JAX): RGB->YUV420 import and YUV->RGB
with fancy upsampling. Exact integer parity with webp_tpu.encoder /
webp_tpu.lossy.yuv (the numpy oracles)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoder import (
    K_RGB_TO_Y, K_RGB_TO_U, K_RGB_TO_V, YUV_FIX, YUV_HALF, _init_gamma,
)
from ..encoder import K_GAMMA_TAB_FIX, K_GAMMA_TAB_SCALE, K_GAMMA_TAB_SIZE
from ..lossy.yuv import (
    K_YSCALE, K_RCR, K_GCB, K_GCR, K_BCB, K_RBIAS, K_GBIAS, K_BBIAS,
)


def _gamma_tables():
    _init_gamma()
    from .. import encoder as E

    return (jnp.asarray(E._gamma_to_linear, dtype=jnp.int32),
            jnp.asarray(E._linear_to_gamma, dtype=jnp.int32))


def rgb_to_yuv420(rgb: jnp.ndarray):
    """uint8 [..., H, W, 3] (H, W even) -> (Y [...,H,W], U, V [...,H/2,W/2]).

    Channel-last input: the de-interleave (every-3rd-byte strided loads)
    costs ~2/3 of this op's time on TPU — prefer rgb_planes_to_yuv420
    (planar [3, H, W] upload) where the caller controls the layout.
    """
    return rgb_planes_to_yuv420(rgb[..., 0], rgb[..., 1], rgb[..., 2])


def rgb_planes_to_yuv420(r, g, b):
    """uint8 planes [..., H, W] (H, W even) -> (Y, U, V [...,H/2,W/2]).

    Matches the host import path: per-pixel luma, gamma-correct 2x2 chroma
    accumulation. The host uses gamma LUTs; per-pixel gathers are slow on
    TPU, so the device evaluates the same power curves in float32 directly
    (the tables ARE pure power functions, encoder.py:_init_gamma; the
    resulting chroma differs from the LUT+interp host path by at most 1,
    an encoder-side choice invisible to conformance).
    """
    r = r.astype(jnp.int32)
    g = g.astype(jnp.int32)
    b = b.astype(jnp.int32)
    yy = (K_RGB_TO_Y[0] * r + K_RGB_TO_Y[1] * g + K_RGB_TO_Y[2] * b
          + YUV_HALF + (16 << YUV_FIX)) >> YUV_FIX
    Y = jnp.clip(yy, 0, 255).astype(jnp.uint8)

    # GammaToLinear: round((v/255)^0.8 * 4095) evaluated in float, per
    # PLANE — channel-last [..., 3] arrays put 3 on the minor axis and
    # waste the 128-wide VPU lanes (measured 2.3x slower).
    #
    # The 2x2 accumulation is a sublane-strided row-pair add (i16,
    # values <= 8190) followed by a bitcast i16-pair -> i32 column sum:
    # the reshape+reduce formulation lowered to a lane-strided reduce
    # plus full-res s32 layout copies that together were the single
    # most expensive op group of the whole encoder (XLA cost model:
    # ~26% of the batched-encode program).
    H, W = r.shape[-2:]
    gam = []
    for c in (r, g, b):
        xf = c.astype(jnp.float32) * (1.0 / 255.0)
        lin = jnp.floor(jnp.power(xf, 0.80) * 4095.0 + 0.5).astype(jnp.int16)
        rows = lin[..., 0::2, :] + lin[..., 1::2, :]   # i16, <= 8190
        p32 = jax.lax.bitcast_convert_type(
            rows.reshape(*rows.shape[:-1], W // 2, 2), jnp.int32)
        acc = (p32 & 0xFFFF) + (p32 >> 16)             # <= 16380
        # LinearToGamma(acc, 0) -> 4x-scale gamma: 1020 * (acc/16380)^1.25.
        af = acc.astype(jnp.float32) * (1.0 / (4.0 * 4095.0))
        gam.append(jnp.floor(jnp.power(af, 1.25) * 1020.0
                             + 0.5).astype(jnp.int32))
    rg, gg, bg = gam
    ru = (K_RGB_TO_U[0] * rg + K_RGB_TO_U[1] * gg + K_RGB_TO_U[2] * bg
          + (YUV_HALF << 2) + (128 << (YUV_FIX + 2))) >> (YUV_FIX + 2)
    rv = (K_RGB_TO_V[0] * rg + K_RGB_TO_V[1] * gg + K_RGB_TO_V[2] * bg
          + (YUV_HALF << 2) + (128 << (YUV_FIX + 2))) >> (YUV_FIX + 2)
    U = jnp.clip(ru, 0, 255).astype(jnp.uint8)
    V = jnp.clip(rv, 0, 255).astype(jnp.uint8)
    return Y, U, V


def yuv_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pointwise full-res YUV -> RGB uint8 [..., 3]."""
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    yy = (y * K_YSCALE) >> 8
    r = yy + ((v * K_RCR) >> 8) - K_RBIAS
    g = yy - ((u * K_GCB) >> 8) - ((v * K_GCR) >> 8) + K_GBIAS
    b = yy + ((u * K_BCB) >> 8) - K_BBIAS
    rgb = jnp.stack([r, g, b], axis=-1) >> 6
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def upsample_chroma_fancy(c: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Fancy 4-tap diamond chroma upsampling: [..., ch, cw] -> [..., H, W]
    (int32). Vectorized form of the reference UpsampleLinePair driver."""
    ch = c.shape[-2]
    c = c.astype(jnp.int32)
    rows = jnp.arange(height)
    near = rows >> 1
    far = jnp.where(rows & 1, jnp.minimum(near + 1, ch - 1),
                    jnp.maximum(near - 1, 0))
    cn = jnp.take(c, near, axis=-2)  # [..., H, cw]
    cf = jnp.take(c, far, axis=-2)
    last_pair = (width - 1) >> 1
    out = jnp.zeros(c.shape[:-2] + (height, width), dtype=jnp.int32)
    out = out.at[..., 0].set((3 * cn[..., 0] + cf[..., 0] + 2) >> 2)
    if last_pair >= 1:
        tl = cn[..., :last_pair]
        t = cn[..., 1 : last_pair + 1]
        l = cf[..., :last_pair]
        cc = cf[..., 1 : last_pair + 1]
        avg = tl + t + l + cc + 8
        diag12 = (avg + 2 * (t + l)) >> 3
        diag03 = (avg + 2 * (tl + cc)) >> 3
        out = out.at[..., 1 : 2 * last_pair : 2].set((diag12 + tl) >> 1)
        out = out.at[..., 2 : 2 * last_pair + 1 : 2].set((diag03 + t) >> 1)
    if width % 2 == 0 and width >= 2:
        i = (width - 1) >> 1
        out = out.at[..., width - 1].set((3 * cn[..., i] + cf[..., i] + 2) >> 2)
    return out


def yuv420_to_rgb_fancy(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    h, w = y.shape[-2], y.shape[-1]
    uu = upsample_chroma_fancy(u, h, w)
    vv = upsample_chroma_fancy(v, h, w)
    return yuv_to_rgb(y, uu, vv)
