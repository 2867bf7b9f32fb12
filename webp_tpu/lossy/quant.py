"""VP8 quantization (encoder side).

QFIX=17 fixed-point bias quantization with per-frequency sharpening,
matching libwebp quant_enc.c semantics (reference: internal/lossy/
encode_quant.go, encode.go:1065-1160).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import tables as T

QFIX = 17
MAX_LEVEL = 2047

# Per-type quantization bias [type][is_ac]; type 0=Y1, 1=Y2, 2=UV.
BIAS_MATRICES = ((96, 110), (96, 108), (110, 115))

# Per-frequency sharpening factors (raster order), Y1 only.
FREQ_SHARPENING = (0, 30, 60, 90, 30, 60, 90, 90, 60, 90, 90, 90, 90, 90, 90, 90)


@dataclass
class SegmentQuant:
    """Expanded quantizer for one coefficient class."""

    q: np.ndarray = None        # [16] dequant steps (dc at 0, ac elsewhere)
    iq: np.ndarray = None       # [16] (1<<QFIX)/q
    bias: np.ndarray = None     # [16]
    zthresh: np.ndarray = None  # [16]
    sharpen: np.ndarray = None  # [16]

    @staticmethod
    def make(dc_quant: int, ac_quant: int, bias_type: int,
             sharpen: bool = False) -> "SegmentQuant":
        sq = SegmentQuant()
        q = np.full(16, ac_quant, dtype=np.int64)
        q[0] = dc_quant
        iq = (1 << QFIX) // q
        b = np.full(16, BIAS_MATRICES[bias_type][1] << (QFIX - 8), dtype=np.int64)
        b[0] = BIAS_MATRICES[bias_type][0] << (QFIX - 8)
        zt = ((1 << QFIX) - 1 - b) // iq
        sh = np.zeros(16, dtype=np.int64)
        if sharpen:
            fs = np.array(FREQ_SHARPENING, dtype=np.int64)
            sh = (fs * q) >> 11
        sq.q, sq.iq, sq.bias, sq.zthresh, sq.sharpen = q, iq, b, zt, sh
        return sq


def quantize_block(coeffs: np.ndarray, sq: SegmentQuant, first: int = 0):
    """Quantizes one (or a batch of) 4x4 coefficient block(s).

    coeffs: int [..., 16] natural (raster) order.
    Returns (levels_zigzag int32 [..., 16], dequantized int32 [..., 16] raster,
    last_nonzero+1 in zigzag order as int [...]).
    """
    zz = T.ZIGZAG
    c = coeffs.reshape(-1, 16).astype(np.int64)
    # Reorder to zigzag.
    czz = c[:, zz]
    sign = czz < 0
    mag = np.abs(czz) + sq.sharpen[None, :]
    level = (mag * sq.iq[None, :] + sq.bias[None, :]) >> QFIX
    level = np.minimum(level, MAX_LEVEL)
    # Zero-threshold shortcut parity: values below zthresh quantize to 0
    # already via the bias formula; explicit check unnecessary.
    level = np.where(sign, -level, level)
    if first:
        level[:, 0] = 0
    out = np.zeros_like(c)
    out[:, zz] = level * sq.q[None, :]
    nz = (level != 0)
    last = np.where(nz.any(axis=1), 16 - np.argmax(nz[:, ::-1], axis=1), 0)
    shape = coeffs.shape[:-1]
    return (level.astype(np.int32).reshape(*shape, 16),
            out.astype(np.int32).reshape(*shape, 16),
            last.reshape(shape))
