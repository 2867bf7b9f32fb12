"""ALPH alpha-plane encoder.

Parity with /root/reference/internal/lossy/alpha.go EncodeAlpha: 1-byte
header (method, filter, preprocessing), optional prediction filter, raw or
headerless-VP8L payload (alpha values in the green channel), best-filter
search by output size.
"""

from __future__ import annotations

import numpy as np

from ..container.riff import WebPError

FILTER_NONE, FILTER_HORIZONTAL, FILTER_VERTICAL, FILTER_GRADIENT = range(4)


def _filter_horizontal(a: np.ndarray) -> np.ndarray:
    out = a.astype(np.int16)
    out[:, 1:] = a[:, 1:].astype(np.int16) - a[:, :-1]
    out[1:, 0] = a[1:, 0].astype(np.int16) - a[:-1, 0]
    return (out & 0xFF).astype(np.uint8)


def _filter_vertical(a: np.ndarray) -> np.ndarray:
    out = a.astype(np.int16)
    out[0, 1:] = a[0, 1:].astype(np.int16) - a[0, :-1]
    out[1:, :] = a[1:, :].astype(np.int16) - a[:-1, :]
    return (out & 0xFF).astype(np.uint8)


def _filter_gradient(a: np.ndarray) -> np.ndarray:
    h, w = a.shape
    out = a.astype(np.int16).copy()
    out[0, 1:] = a[0, 1:].astype(np.int16) - a[0, :-1]
    if h > 1:
        ai = a.astype(np.int32)
        left = np.empty((h - 1, w), dtype=np.int32)
        left[:, 1:] = ai[1:, :-1]
        left[:, 0] = ai[:-1, 0]  # first col: left = top
        top = ai[:-1, :]
        top_left = np.empty((h - 1, w), dtype=np.int32)
        top_left[:, 1:] = ai[:-1, :-1]
        top_left[:, 0] = ai[:-1, 0]
        pred = np.clip(left + top - top_left, 0, 255)
        out[1:, :] = ai[1:, :] - pred
    return (out & 0xFF).astype(np.uint8)


FILTERS = {
    FILTER_NONE: lambda a: a,
    FILTER_HORIZONTAL: _filter_horizontal,
    FILTER_VERTICAL: _filter_vertical,
    FILTER_GRADIENT: _filter_gradient,
}


def encode_alpha(alpha: np.ndarray, quality: int = 100, method: int = 1,
                 filtering: int = 1, effort: int = 4) -> bytes:
    """Encodes a uint8 [h, w] alpha plane into an ALPH chunk payload."""
    alpha = np.asarray(alpha, dtype=np.uint8)
    h, w = alpha.shape
    if method == 0:
        header = 0  # no compression, no filter
        return bytes([header]) + alpha.tobytes()

    from ..lossless.encode import encode_vp8l_argb

    # Pick filters to try: 0=none only, 1=fast (none+gradient), 2=best (all).
    if filtering == 0:
        candidates = [FILTER_NONE]
    elif filtering == 1:
        candidates = [FILTER_NONE, FILTER_GRADIENT]
    else:
        candidates = [FILTER_NONE, FILTER_HORIZONTAL, FILTER_VERTICAL,
                      FILTER_GRADIENT]

    best = None
    for f in candidates:
        filtered = FILTERS[f](alpha)
        argb = (np.uint32(0xFF000000)
                | (filtered.astype(np.uint32) << np.uint32(8)))
        payload = encode_vp8l_argb(argb, quality=min(quality, 100),
                                   method=max(1, effort), with_header=False)
        header = 1 | (f << 2)  # lossless compression | filter
        blob = bytes([header]) + payload
        if best is None or len(blob) < len(best):
            best = blob
    # Raw fallback if compression doesn't help.
    if len(best) > 1 + w * h:
        return bytes([0]) + alpha.tobytes()
    return best
