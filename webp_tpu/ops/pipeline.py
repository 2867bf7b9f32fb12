"""Device-side encode pipeline core (JAX, jittable).

This is the batched tensor heart of the lossy encoder: color import,
per-macroblock forward transforms (FDCT + WHT), quantization, inverse
reconstruction, metrics and level histograms. Everything here is static-
shape, integer, fusable XLA — the host only does the serial boolean
entropy coding afterwards (SURVEY.md §7: compute-bound vs bit-bound split).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.encode import quality_to_qindex
from ..lossy.quant import SegmentQuant
from . import dct, metrics, quant, yuv


def quant_params(quality: int):
    """Builds device quantizer arrays for all three coefficient classes."""
    q = quality_to_qindex(quality)
    dc_t, ac_t, ac2_t = T.DC_TABLE, T.AC_TABLE, T.AC_TABLE2
    clip = lambda v, m: max(0, min(m, v))
    y1 = SegmentQuant.make(int(dc_t[q]), int(ac_t[q]), 0, sharpen=True)
    y2 = SegmentQuant.make(max(8, int(dc_t[q]) * 2), int(ac2_t[q]), 1)
    uv = SegmentQuant.make(int(dc_t[clip(q, 117)]), int(ac_t[q]), 2)
    out = {}
    for name, sq in (("y1", y1), ("y2", y2), ("uv", uv)):
        out[name] = tuple(
            jnp.asarray(v, dtype=jnp.int32)
            for v in (sq.q, sq.iq, sq.bias, sq.sharpen)
        )
    return out


ZIGZAG = np.asarray(T.ZIGZAG)


def _blocks16(plane: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W] -> [..., H/16 * W/16, 16, 4, 4] (MB-major, raster blocks)."""
    *lead, H, W = plane.shape
    mbh, mbw = H // 16, W // 16
    x = plane.reshape(*lead, mbh, 4, 4, mbw, 4, 4)
    # axes: [mbh, by, py, mbw, bx, px] -> [mbh, mbw, by, bx, py, px]
    x = jnp.moveaxis(x, (-6, -5, -4, -3, -2, -1), (-6, -4, -2, -5, -3, -1))
    return x.reshape(*lead, mbh * mbw, 16, 4, 4)


def _blocks8(plane: jnp.ndarray) -> jnp.ndarray:
    *lead, H, W = plane.shape
    mbh, mbw = H // 8, W // 8
    x = plane.reshape(*lead, mbh, 2, 4, mbw, 2, 4)
    x = jnp.moveaxis(x, (-6, -5, -4, -3, -2, -1), (-6, -4, -2, -5, -3, -1))
    return x.reshape(*lead, mbh * mbw, 4, 4, 4)


def encode_core(rgb: jnp.ndarray, qp, top_context: jnp.ndarray = None):
    """One device encode step over a batch of images.

    rgb: uint8 [B, H, W, 3] with H, W multiples of 16.
    qp: output of quant_params().
    top_context: optional uint8 [B, W] row of reconstructed context pixels
      from the band above (multi-chip halo; 127s if None).

    Returns (levels dict, recon Y, stats dict). The levels feed the host
    entropy coder; stats feed rate control / probability optimization.
    """
    B, H, W, _ = rgb.shape
    Y, U, V = yuv.rgb_to_yuv420(rgb)

    if top_context is None:
        top_context = jnp.full((B, W), 127, dtype=jnp.uint8)

    # Flat DC-style prediction: each MB predicted from the mean of the context
    # row above the image band (analysis-pass prediction, statLoop analog).
    ctx_mean = jnp.mean(top_context.astype(jnp.int32), axis=-1, keepdims=True)
    predY = jnp.broadcast_to(
        jnp.clip(ctx_mean, 0, 255)[:, :, None, None, None],
        (B, (H // 16) * (W // 16), 16, 4, 4),
    ).astype(jnp.int32)

    yb = _blocks16(Y)
    coeffs = dct.fdct4x4(yb, predY)  # [B, nMB, 16, 4, 4]
    flat = coeffs.reshape(*coeffs.shape[:-2], 16)
    dcs = flat[..., 0].reshape(B, -1, 4, 4)
    wht = dct.fwht4x4(dcs).reshape(B, -1, 16)

    y2_lv, y2_dq = quant.quantize(wht, *qp["y2"], ZIGZAG)
    rec_dcs = dct.wht4x4(y2_dq.reshape(B, -1, 4, 4)).reshape(B, -1, 16)
    lv, dq = quant.quantize(flat, *qp["y1"], ZIGZAG, first=1)
    dq = dq.at[..., 0].set(rec_dcs)
    recY = jnp.clip(predY + dct.idct4x4(dq.reshape(*coeffs.shape)), 0, 255)

    ub = _blocks8(U)
    vb = _blocks8(V)
    pred_uv = jnp.full_like(ub, 128).astype(jnp.int32)
    cu = dct.fdct4x4(ub, pred_uv)
    cv = dct.fdct4x4(vb, pred_uv)
    lv_u, dq_u = quant.quantize(cu.reshape(*cu.shape[:-2], 16), *qp["uv"], ZIGZAG)
    lv_v, dq_v = quant.quantize(cv.reshape(*cv.shape[:-2], 16), *qp["uv"], ZIGZAG)

    sse_y = metrics.sse(yb, recY, axes=(-3, -2, -1))
    tdisto = metrics.tdisto4x4(yb, recY).sum(axis=(-1,))
    # Level histogram (proba-stats analog; psum'd across shards by callers).
    hist = jnp.histogram(
        jnp.abs(lv).astype(jnp.int32), bins=16, range=(0, 16)
    )[0]

    bottom_row = recY.reshape(B, H // 16, W // 16, 4, 4, 4, 4)
    # Extract the band's bottom pixel row as halo for the next shard.
    recY_plane = _unblocks16(recY, H, W)
    halo = recY_plane[:, -1, :].astype(jnp.uint8)

    levels = {"y1": lv, "y2": y2_lv, "u": lv_u, "v": lv_v}
    stats = {"sse_y": sse_y, "tdisto": tdisto, "hist": hist,
             "skip": (jnp.abs(lv).sum(axis=(-2, -1)) == 0)}
    return levels, recY_plane, halo, stats


def _unblocks16(blocks: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[B, nMB, 16, 4, 4] -> [B, H, W]."""
    B = blocks.shape[0]
    mbh, mbw = H // 16, W // 16
    x = blocks.reshape(B, mbh, mbw, 4, 4, 4, 4)
    # [B, mbh, mbw, by, bx, py, px] -> [B, mbh, by, py, mbw, bx, px]
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6))
    return x.reshape(B, H, W)


def make_encode_fn(quality: int = 75):
    """Returns a jittable single-chip forward step over an image batch."""
    qp = quant_params(quality)

    @jax.jit
    def step(rgb):
        levels, rec, halo, stats = encode_core(rgb, qp)
        return levels, rec, stats

    return step
