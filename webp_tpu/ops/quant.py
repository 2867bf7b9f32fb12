"""Device-side VP8 quantization (JAX), mirroring webp_tpu.lossy.quant."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

QFIX = 17
MAX_LEVEL = 2047


def quantize(coeffs: jnp.ndarray, q: jnp.ndarray, iq: jnp.ndarray,
             bias: jnp.ndarray, sharpen: jnp.ndarray, zigzag: np.ndarray,
             first: int = 0):
    """coeffs int32 [..., 16] raster -> (levels_zz [..., 16], dequant [..., 16]).

    q/iq/bias/sharpen: int32 [16] in zigzag order (SegmentQuant layout).
    """
    czz = coeffs[..., zigzag]
    sign = czz < 0
    mag = jnp.abs(czz) + sharpen
    level = (mag * iq + bias) >> QFIX
    level = jnp.minimum(level, MAX_LEVEL)
    level = jnp.where(sign, -level, level)
    if first:
        level = level.at[..., 0].set(0)
    dq_zz = level * q
    inv = np.argsort(zigzag)
    dequant = dq_zz[..., inv]
    return level, dequant
