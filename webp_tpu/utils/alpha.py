"""Alpha-plane processing utilities: premultiply / unpremultiply and
alpha extraction/dispatch.

Parity with the reference's alpha processing kernels
(internal/dsp/alpha_proc.go: MultARGBRow :28, DispatchAlpha :140,
ExtractAlpha/ExtractGreen :221): exact 8-bit fixed-point rounding
(((x + 128) * 257) >> 16 == round(x / 255) for all x <= 255*255),
vectorized numpy.
"""

from __future__ import annotations

import numpy as np

def _div255_round(x: np.ndarray) -> np.ndarray:
    """Exact round(x / 255) for 0 <= x <= 255*255: ((x + 128) * 257) >> 16."""
    return ((x + 128) * 257) >> 16


def premultiply(rgba: np.ndarray, inverse: bool = False) -> np.ndarray:
    """(Un)premultiplies RGB by alpha in place-semantics (returns a copy).

    rgba: uint8 [..., 4]. inverse=True undoes a premultiply (values are
    clamped; fully transparent pixels stay unchanged).
    """
    out = rgba.copy()
    a = rgba[..., 3].astype(np.uint32)
    if not inverse:
        for c in range(3):
            v = rgba[..., c].astype(np.uint32)
            out[..., c] = _div255_round(v * a).astype(np.uint8)
        return out
    safe = np.maximum(a, 1)
    for c in range(3):
        v = rgba[..., c].astype(np.uint32)
        r = (v * 255 + safe // 2) // safe
        out[..., c] = np.where(a == 0, rgba[..., c],
                               np.minimum(r, 255)).astype(np.uint8)
    return out


def extract_alpha(rgba: np.ndarray) -> tuple[np.ndarray, bool]:
    """Returns (alpha plane u8 [h, w], has_non_opaque) — ExtractAlpha."""
    a = np.ascontiguousarray(rgba[..., 3])
    return a, bool((a != 255).any())


def dispatch_alpha(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Interleaves an alpha plane back into RGBA — DispatchAlpha."""
    h, w = alpha.shape
    out = np.empty((h, w, 4), np.uint8)
    out[..., :3] = rgb[..., :3]
    out[..., 3] = alpha
    return out


def extract_green(argb: np.ndarray) -> np.ndarray:
    """Packed uint32 ARGB -> green-channel plane u8 — ExtractGreen (the
    alpha codec stores the plane in VP8L's green channel)."""
    return ((argb >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
