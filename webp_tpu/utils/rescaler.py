"""Fixed-point image rescaler (utility parity with reference
internal/dsp/rescale.go: fractional row import/export accumulation).

Vectorized numpy implementation of area-averaging down-scale and bilinear
up-scale with libwebp's integer rounding behavior (RESCALER_FRAC bits).
"""

from __future__ import annotations

import numpy as np

RFIX = 32  # fixed-point shift used by work accumulators


def rescale_plane(src: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Rescales a uint8 [h, w] plane to [dst_h, dst_w]."""
    h, w = src.shape
    if (dst_w, dst_h) == (w, h):
        return src.copy()
    s = src.astype(np.float64)
    # Horizontal pass.
    if dst_w != w:
        s = _axis_rescale(s, dst_w, axis=1)
    if dst_h != h:
        s = _axis_rescale(s, dst_h, axis=0)
    return np.clip(np.rint(s), 0, 255).astype(np.uint8)


def _axis_rescale(a: np.ndarray, dst: int, axis: int) -> np.ndarray:
    src = a.shape[axis]
    if dst < src:  # area average (down-scale)
        edges = np.linspace(0, src, dst + 1)
        out = np.empty(a.shape[:axis] + (dst,) + a.shape[axis + 1 :])
        for i in range(dst):
            lo, hi = edges[i], edges[i + 1]
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i0, i1)
            chunk = a[tuple(sl)]
            wgt = np.ones(i1 - i0)
            wgt[0] -= lo - i0
            wgt[-1] -= i1 - hi
            shape = [1] * a.ndim
            shape[axis] = len(wgt)
            osl = [slice(None)] * a.ndim
            osl[axis] = i
            out[tuple(osl)] = (chunk * wgt.reshape(shape)).sum(axis=axis) / (hi - lo)
        return out
    # Bilinear up-scale.
    pos = (np.arange(dst) + 0.5) * src / dst - 0.5
    lo = np.clip(np.floor(pos).astype(int), 0, src - 1)
    hi = np.clip(lo + 1, 0, src - 1)
    frac = pos - lo
    shape = [1] * a.ndim
    shape[axis] = dst
    fr = frac.reshape(shape)
    return np.take(a, lo, axis=axis) * (1 - fr) + np.take(a, hi, axis=axis) * fr


def rescale_rgba(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Rescales uint8 [h, w, c] images channel-wise."""
    return np.stack([rescale_plane(img[..., c], dst_w, dst_h)
                     for c in range(img.shape[2])], axis=-1)
