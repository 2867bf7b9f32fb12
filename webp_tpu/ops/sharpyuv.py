"""Device SharpYUV: RGB -> YUV420 with iterative luma/chroma refinement.

Same algorithm as the host path (webp_tpu/sharpyuv/convert.py, parity with
reference /root/reference/sharpyuv/sharpyuv.go): refine a full-res luma
plane and half-res chroma residuals so the fancy-upsampled reconstruction's
gamma-aware luminance matches the source. The host uses fixed-point gamma
LUTs; per-pixel gathers are slow on TPU, so the device evaluates the same
BT.709 transfer curves directly in float32 (sub-LSB differences, an
encoder-side choice invisible to conformance).

Everything is elementwise / 2x2-pooling / static-slice work in float32 —
pure VPU, no scan, no gathers. The convergence early-exit becomes a
per-image `done` flag selecting between states (static control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_Y = 1023.0  # 10-bit working depth (8 bits + SFIX=2)
NUM_ITERATIONS = 4

# WebP conversion matrix (reference csp.go:60-64).
_RGB_TO_Y = (16839.0, 33059.0, 6420.0, float(16 << 16))
_RGB_TO_U = (-9719.0, -19081.0, 28800.0, float(128 << 16))
_RGB_TO_V = (28800.0, -24116.0, -4684.0, float(128 << 16))

_A709 = 0.09929682680944
_T709 = 0.018053968510807


def _to_linear(g):
    """BT.709 inverse OETF on [0,1] (sharpyuv/gamma.py _to_linear_709)."""
    lo = g * (1.0 / 4.5)
    hi = jnp.power(jnp.maximum((g + _A709) * (1.0 / (1.0 + _A709)), 0.0),
                   1.0 / 0.45)
    return jnp.where(g <= _T709 * 4.5, lo, hi)


def _from_linear(v):
    lo = 4.5 * v
    hi = (1.0 + _A709) * jnp.power(jnp.maximum(v, 1e-8), 0.45) - _A709
    return jnp.where(v <= _T709, lo, hi)


def _gray_linear(r, g, b):
    # Rec.709 luminance weights at YUV_FIX scale (sharpyuv.go rgbToGray).
    return (13933.0 * r + 46871.0 * g + 4732.0 * b) * (1.0 / 65536.0)


def _update_w(rgb10):
    """Gamma-aware luminance of [h, w, 3] 10-bit-scale RGB -> [h, w]."""
    lin = _to_linear(rgb10 * (1.0 / MAX_Y))
    return _from_linear(_gray_linear(lin[..., 0], lin[..., 1],
                                     lin[..., 2])) * MAX_Y


def _scale_down(rgb10):
    """Gamma-aware 2x2 average per channel: [2h, 2w, 3] -> [h, w, 3]."""
    lin = _to_linear(rgb10 * (1.0 / MAX_Y))
    h2, w2 = lin.shape[0] // 2, lin.shape[1] // 2
    acc = lin.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3))
    return _from_linear(acc) * MAX_Y


def _update_chroma(rgb10):
    """Target chroma residuals [h/2, w/2, 3] = scaled RGB - its gray."""
    s = _scale_down(rgb10)
    gray = (13933.0 * s[..., 0] + 46871.0 * s[..., 1]
            + 4732.0 * s[..., 2]) * (1.0 / 65536.0)
    return s - gray[..., None]


def _interpolate(best_y, best_uv):
    """Full-res RGB = clip(bestY + diamond-upsampled bestUV), 10-bit scale.

    The 9-3-3-1 diamond with the even/odd row pairing of the host
    _interpolate (convert.py:96-124); h and w are even here (MB-padded)."""
    h, w = best_y.shape
    uvh, uvw = best_uv.shape[:2]
    prev = jnp.concatenate([best_uv[:1], best_uv[:-1]], axis=0)
    nxt = jnp.concatenate([best_uv[1:], best_uv[-1:]], axis=0)

    def expand(cur, oth):
        # One output row per UV row: [uvh, w, 3].
        a0 = cur[:, :-1]
        a1 = cur[:, 1:]
        b0 = oth[:, :-1]
        b1 = oth[:, 1:]
        # Columns 1..w-2 interleave (odd leans left pair, even leans right).
        odd = (9.0 * a0 + 3.0 * a1 + 3.0 * b0 + b1) * (1.0 / 16.0)
        even = (9.0 * a1 + 3.0 * a0 + 3.0 * b1 + b0) * (1.0 / 16.0)
        mid = jnp.stack([odd, even], axis=2).reshape(uvh, 2 * (uvw - 1), 3)
        first = (3.0 * cur[:, :1] + oth[:, :1]) * 0.25
        last = (3.0 * cur[:, -1:] + oth[:, -1:]) * 0.25
        return jnp.concatenate([first, mid, last], axis=1)

    rows_even = expand(best_uv, prev)  # output rows 0, 2, 4, ...
    rows_odd = expand(best_uv, nxt)   # output rows 1, 3, 5, ...
    uv_full = jnp.stack([rows_even, rows_odd], axis=1).reshape(h, w, 3)
    return jnp.clip(uv_full + best_y[:, :, None], 0.0, MAX_Y)


def sharp_yuv420(rgb):
    """uint8 [H, W, 3] (H, W even) -> (Y [H,W], U, V [H/2,W/2]) uint8."""
    h, w = rgb.shape[:2]
    rgb10 = rgb.astype(jnp.float32) * 4.0  # SFIX=2

    best_y = _gray_linear(rgb10[..., 0], rgb10[..., 1], rgb10[..., 2])
    target_y = _update_w(rgb10)
    target_uv = _update_chroma(rgb10)
    best_uv = target_uv

    diff_threshold = 3.0 * w * h  # host threshold at the same 10-bit scale
    done = jnp.bool_(False)
    prev_diff = jnp.float32(0.0)
    for it in range(NUM_ITERATIONS):
        rec = _interpolate(best_y, best_uv)
        diff_y = target_y - _update_w(rec)
        new_y = jnp.clip(best_y + diff_y, 0.0, MAX_Y)
        new_uv = best_uv + (target_uv - _update_chroma(rec))
        best_y = jnp.where(done, best_y, new_y)
        best_uv = jnp.where(done, best_uv, new_uv)
        diff_sum = jnp.abs(diff_y).sum()
        if it > 0:
            done = done | (diff_sum < diff_threshold) | (diff_sum > prev_diff)
        prev_diff = diff_sum

    # Final conversion (convertWRGBToYUV): SFIX-scale fixed-point rounding.
    scale = 1.0 / float(1 << (16 + 2))
    uv_up = jnp.repeat(jnp.repeat(best_uv, 2, axis=0), 2, axis=1)
    r = uv_up[..., 0] + best_y
    g = uv_up[..., 1] + best_y
    b = uv_up[..., 2] + best_y
    yv = jnp.floor((_RGB_TO_Y[0] * r + _RGB_TO_Y[1] * g + _RGB_TO_Y[2] * b
                    + _RGB_TO_Y[3] * 4.0) * scale + 0.5)
    Y = jnp.clip(yv, 0, 255).astype(jnp.uint8)
    ur, ug, ub = best_uv[..., 0], best_uv[..., 1], best_uv[..., 2]
    uvv = jnp.floor((_RGB_TO_U[0] * ur + _RGB_TO_U[1] * ug + _RGB_TO_U[2] * ub
                     + _RGB_TO_U[3] * 4.0) * scale + 0.5)
    vvv = jnp.floor((_RGB_TO_V[0] * ur + _RGB_TO_V[1] * ug + _RGB_TO_V[2] * ub
                     + _RGB_TO_V[3] * 4.0) * scale + 0.5)
    U = jnp.clip(uvv, 0, 255).astype(jnp.uint8)
    V = jnp.clip(vvv, 0, 255).astype(jnp.uint8)
    return Y, U, V
