"""Device-side VP8 quantization (JAX), mirroring webp_tpu.lossy.quant."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

QFIX = 17
MAX_LEVEL = 2047

# Per-frequency trellis distortion weights, zigzag order
# (lossy/quant.py WEIGHT_TRELLIS; reference encode_trellis.go).
_WT = np.array([30, 27, 19, 11, 27, 24, 17, 10,
                19, 17, 12, 8, 11, 10, 8, 6], np.float32)


def quantize(coeffs: jnp.ndarray, q: jnp.ndarray, iq: jnp.ndarray,
             bias: jnp.ndarray, sharpen: jnp.ndarray, zigzag: np.ndarray,
             first: int = 0, rd_drop: float = 0.0):
    """coeffs int32 [..., 16] raster -> (levels_zz [..., 16], dequant [..., 16]).

    q/iq/bias/sharpen: int32 [16] in zigzag order (SegmentQuant layout).

    rd_drop > 0 enables the trellis-lite RD dropout: a |level|==1
    coefficient is zeroed when the ~rate it costs (rd_drop, in the <<8 bit
    units of the host cost tables, scaled by the trellis lambda derived
    from this row's q) exceeds the weighted distortion increase — the
    single-coefficient core of trellis_quantize_block, cheap enough for
    the in-scan closed loop (elementwise, no DP).
    """
    czz = coeffs[..., zigzag]
    sign = czz < 0
    mag = jnp.abs(czz) + sharpen
    level = (mag * iq + bias) >> QFIX
    level = jnp.minimum(level, MAX_LEVEL)
    if rd_drop:
        qf = q.astype(jnp.float32)
        c0 = mag.astype(jnp.float32)
        dd = jnp.asarray(_WT) * (c0 * c0 - (c0 - qf) * (c0 - qf))
        base = jnp.floor((qf[..., 0:1] + 15.0 * qf[..., 1:2] + 8.0)
                         * (1.0 / 16.0))
        tlam = base * base * 0.25  # TLambda (lossy/encode.py:236)
        level = jnp.where((level == 1) & (256.0 * dd < rd_drop * tlam),
                          0, level)
    level = jnp.where(sign, -level, level)
    if first:
        level = level.at[..., 0].set(0)
    dq_zz = level * q
    inv = np.argsort(zigzag)
    dequant = dq_zz[..., inv]
    return level, dequant
