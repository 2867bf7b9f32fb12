"""Device-side quality metrics (JAX): SSE, PSNR, weighted-Hadamard TDisto,
and windowed SSIM. These are encoder inputs (RD spectral term, quality
stats), matching /root/reference/internal/dsp/ssim.go.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Hadamard weights for TDisto (libwebp kWeightY / enc.c).
WEIGHT_Y = np.array(
    [38, 32, 20, 9, 32, 28, 17, 7, 20, 17, 10, 4, 9, 7, 4, 2], dtype=np.int32
).reshape(4, 4)


def sse(a: jnp.ndarray, b: jnp.ndarray, axes=None) -> jnp.ndarray:
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=axes)


def psnr_from_sse(sse_val, count) -> jnp.ndarray:
    mse = sse_val / jnp.maximum(count, 1)
    return jnp.where(mse > 0, 10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(mse, 1e-12)), 99.0)


def _hadamard4(x: jnp.ndarray) -> jnp.ndarray:
    """Weighted-transform inner: 2D 4x4 Hadamard, [..., 4, 4] int32."""
    c0, c1, c2, c3 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    a0, a1 = c0 + c2, c1 + c3
    a2, a3 = c1 - c3, c0 - c2
    t = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-1)
    r0, r1, r2, r3 = t[..., 0, :], t[..., 1, :], t[..., 2, :], t[..., 3, :]
    a0, a1 = r0 + r2, r1 + r3
    a2, a3 = r1 - r3, r0 - r2
    return jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-2)


def tdisto4x4(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray = None) -> jnp.ndarray:
    """Spectral distortion |W*H(a)| vs |W*H(b)| summed (batched [..., 4, 4]).

    Matches TDisto4x4 (ssim.go:266-335): sum1/sum2 weighted absolute
    Hadamard, result = |sum2 - sum1| >> 5.
    """
    if w is None:
        w = jnp.asarray(WEIGHT_Y)
    ha = _hadamard4(a.astype(jnp.int32))
    hb = _hadamard4(b.astype(jnp.int32))
    sum1 = jnp.sum(w * jnp.abs(ha), axis=(-2, -1))
    sum2 = jnp.sum(w * jnp.abs(hb), axis=(-2, -1))
    return jnp.abs(sum2 - sum1) >> 5


# SSIM: plane-level with the hat kernel {1,2,3,4,3,2,1} (VP8_SSIM_KERNEL=3).
_SSIM_K = np.array([1, 2, 3, 4, 3, 2, 1], dtype=np.float64)


def ssim_plane(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM over the plane interior (float; matches libwebp's
    integer SSIMCalculation semantics up to rounding)."""
    a = a.astype(jnp.float64)
    b = b.astype(jnp.float64)
    k = jnp.asarray(_SSIM_K)
    kern = k[:, None] * k[None, :]
    N = jnp.sum(kern)

    def filt(x):
        x4 = x[None, None, :, :]
        return jax.lax.conv_general_dilated(
            x4, kern[None, None, :, :], (1, 1), "VALID")[0, 0]

    w2 = N * N
    C1 = 20.0 * w2
    C2 = 60.0 * w2
    xm = filt(a)
    ym = filt(b)
    xxm = filt(a * a)
    yym = filt(b * b)
    xym = filt(a * b)
    sxy = xym * N - xm * ym
    sxx = xxm * N - xm * xm
    syy = yym * N - ym * ym
    num = (2 * xm * ym + C1) * (2 * jnp.maximum(sxy, 0) + C2)
    den = (xm * xm + ym * ym + C1) * (sxx + syy + C2)
    return jnp.mean(num / den)
