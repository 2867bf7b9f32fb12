"""Batched planar phase 0 + 1: segment analysis and the parallel I16/UV
mode search in the lanes-minor layout.

fastpath._phase1 carries [n_mb, 16, 4, 4] block tensors whose trailing
(4, 4) / (24, 16) dims land on the TPU's (sublane, lane) tiles at ~1/8
occupancy — measured, the blocked I16 search spends ~4x its arithmetic in
relayouts. This module is the same math with the fused batch x MB axis
minor (L = B * n_mb lanes), like ops/planar.py does for the phase-2 scan:
every elementwise op is a full-width [..., L] vector op, every butterfly
or zigzag step is a major-axis slice.

Mode choices and scores are bit-identical to fastpath._phase1 /
fastpath._segment_plan_device (asserted in tests/test_planar.py).

Reference behavior: encode_analysis.go:29 (analysis alphas + k-means),
encode_analysis.go:1075 (PickBestI16ModeRD), :1379 (PickBestUVModeRD),
ssim.go:266 (TDisto).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.encode import FIXED_COSTS_I16 as FC16
from ..lossy.encode import FIXED_COSTS_UV as FCUV
from .metrics import WEIGHT_Y
from .planar import (
    _mb_planar,
    _seg_select_p,
    approx_rate_p,
    fdct4x4_p,
    fwht4x4_p,
    idct4x4_p,
    quantize_p,
    wht4x4_p,
)

__all__ = ["phase1_planar", "phase1_planar_pallas", "plan_segments_planar"]


def hadamard4_p(x):
    """Planar metrics._hadamard4: [..., 4, 4, N] int32 (cols first)."""
    c0, c1, c2, c3 = (x[..., :, 0, :], x[..., :, 1, :],
                      x[..., :, 2, :], x[..., :, 3, :])
    a0, a1 = c0 + c2, c1 + c3
    a2, a3 = c1 - c3, c0 - c2
    t = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-2)
    r0, r1, r2, r3 = (t[..., 0, :, :], t[..., 1, :, :],
                      t[..., 2, :, :], t[..., 3, :, :])
    a0, a1 = r0 + r2, r1 + r3
    a2, a3 = r1 - r3, r0 - r2
    return jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-3)


_WY_P = np.asarray(WEIGHT_Y, np.int32).reshape(4, 4, 1)


def _wha(blocks):
    """sum(W * |hadamard|) per block: [nb, 4, 4, N] -> [nb, N] int32."""
    return jnp.sum(_WY_P * jnp.abs(hadamard4_p(blocks.astype(jnp.int32))),
                   axis=(-3, -2))


def _src_planar(plane_b, mb_h, mb_w, s):
    """[B, H, W] u8 -> [(s/4)^2, 4, 4, L] uint8, L = B * n_mb minor.

    Kept u8: this chip is HBM-bound and the mode loops re-read these
    planes per mode — an i32 copy would 4x the dominant traffic. Every
    consumer (fdct4x4_p, _wha, mean) converts inside its own fusion.
    """
    B = plane_b.shape[0]
    nb = (s // 4) ** 2
    g = _mb_planar(plane_b.astype(jnp.uint8), mb_h, mb_w, s)
    g = g.reshape(B * mb_h * mb_w, nb, 4, 4)
    return g.transpose(1, 2, 3, 0)


def _ctx_planar(plane_b, s, mb_h, mb_w, src=None):
    """Batched source-pixel contexts -> (top [s, L], left [s, L], tl [L]).

    Built from the planar src blocks by lane shifts (left neighbor =
    lane-1, top = lane-mb_w): the strided full-plane slices of the
    per-image formulation were among the costliest layout ops of the
    whole program. Out-of-row/image leakage lands on lanes whose
    has_top/has_left is False — every consumer masks it."""
    if src is None:
        src = _src_planar(plane_b, mb_h, mb_w, s)
    nb = s // 4                                  # blocks per side
    L = src.shape[-1]
    src = src.astype(jnp.int32)
    blocks = src.reshape(nb, nb, 4, 4, L)
    # Bottom pixel row of each MB: block row nb-1, pixel row 3 ->
    # [nb, 4cols, L] -> [s, L]; top ctx = that, one MB-row up.
    bot = blocks[nb - 1, :, 3].reshape(s, L)
    top = jnp.pad(bot, ((0, 0), (mb_w, 0)))[:, :L]
    # Right pixel col of each MB: block col nb-1, pixel col 3 ->
    # [nb, 4rows, L] -> [s, L]; left ctx = that, one MB left.
    rgt = blocks[:, nb - 1, :, 3].reshape(s, L)
    left = jnp.pad(rgt, ((0, 0), (1, 0)))[:, :L]
    # Corner: bottom-right pixel of the diagonal MB.
    br = blocks[nb - 1, nb - 1, 3, 3]
    tl = jnp.pad(br, (mb_w + 1, 0))[:L]
    return top, left, tl


def _flags(mb_w, mb_h, B):
    ys = np.tile(np.repeat(np.arange(mb_h), mb_w), B)
    xs = np.tile(np.tile(np.arange(mb_w), mb_h), B)
    return jnp.asarray(ys > 0), jnp.asarray(xs > 0)


def _pred16_m(m, top, left, tl, has_top, has_left):
    """Single I16/UV mode prediction plane [s, s, N] (DC/TM/V/H)."""
    s = top.shape[0]
    shift = 5 if s == 16 else 4
    top_m = jnp.where(has_top[None, :], top, 127)
    left_m = jnp.where(has_left[None, :], left, 129)
    N = top.shape[-1]
    shape = (s, s, N)
    if m == 0:
        sum_t = top_m.sum(axis=0)
        sum_l = left_m.sum(axis=0)
        dc = jnp.where(
            has_top & has_left, (sum_t + sum_l + s) >> shift,
            jnp.where(has_top, (sum_t + (s >> 1)) >> (shift - 1),
                      jnp.where(has_left, (sum_l + (s >> 1)) >> (shift - 1),
                                0x80)))
        return jnp.broadcast_to(dc[None, None, :], shape)
    if m == 1:
        tl_m = jnp.where(has_top & has_left, tl,
                         jnp.where(has_top, 129, 127))
        return jnp.clip(left_m[:, None, :] + top_m[None, :, :]
                        - tl_m[None, None, :], 0, 255)
    if m == 2:
        return jnp.broadcast_to(top_m[None, :, :], shape)
    return jnp.broadcast_to(left_m[:, None, :], shape)


def _luma_score_pipe(src_b, pred_b, qp_t, with_recon):
    """Planar fastpath._luma_pipe(score_only=True): src/pred [16,4,4,L].

    Returns (lv [16,16,L], y2lv [16,L], disto_td [L][, recon])."""
    coeffs = fdct4x4_p(src_b, pred_b)
    flat = coeffs.reshape(16, 16, -1)
    wht = fwht4x4_p(flat[:, 0].reshape(4, 4, -1))
    y2lv, y2dq = quantize_p(wht.reshape(16, -1), *qp_t["y2"])
    rec_dc = wht4x4_p(y2dq.reshape(4, 4, -1)).reshape(16, -1)
    lv, dq = quantize_p(flat, *qp_t["y1"], first=1)
    dq = dq.at[:, 0].set(rec_dc)
    disto_td = ((flat - dq) ** 2).sum(axis=(0, 1))
    if with_recon:
        recon = jnp.clip(pred_b + idct4x4_p(dq.reshape(coeffs.shape)),
                         0, 255)
        return lv, y2lv, disto_td, recon
    return lv, y2lv, disto_td


# ---------------------------------------------------------------------------
# Phase 0: planar alphas -> per-image k-means segment plan.
# ---------------------------------------------------------------------------

def _hist_alpha_p(v, B, n_mb):
    """v uint8 [C, L] (values < 32) -> alpha [L] (fastpath._hist_alpha)."""
    hist = jnp.stack([(v == k).sum(axis=0, dtype=jnp.int32)
                      for k in range(32)], axis=0)           # [32, L]
    max_value = hist.max(axis=0)
    nz = hist > 0
    last_nz = jnp.where(nz.any(axis=0),
                        31 - jnp.argmax(nz[::-1], axis=0), 1)
    last_nz = jnp.maximum(last_nz, 1)
    alpha = jnp.where(max_value > 1,
                      510 * last_nz // jnp.maximum(max_value, 1), 0)
    return jnp.minimum(alpha, 255)


def _alphas_planar2(srcY, srcU, srcV, B, n_mb):
    """Per-MB texture alphas + UV alphas [B, n_mb] (fastpath._mb_alphas
    + the reference's globalUVAlpha input, encode_analysis.go:245)."""
    dc = jnp.round(srcY.mean(axis=(0, 1, 2))).astype(jnp.int32)
    co = fdct4x4_p(srcY, dc[None, None, None, :])
    vy = jnp.minimum(jnp.abs(co) >> 3, 31).astype(jnp.uint8)
    luma = _hist_alpha_p(vy.reshape(256, -1), B, n_mb)
    uvb = jnp.concatenate([srcU, srcV], axis=0)              # [8, 4, 4, L]
    dcu = jnp.round(uvb.mean(axis=(0, 1, 2))).astype(jnp.int32)
    cu = fdct4x4_p(uvb, dcu[None, None, None, :])
    vu = jnp.minimum(jnp.abs(cu) >> 3, 31).astype(jnp.uint8)
    uv = _hist_alpha_p(vu.reshape(128, -1), B, n_mb)
    a = jnp.clip(255 - ((3 * luma + uv + 2) >> 2), 0, 255)
    return a.reshape(B, n_mb), uv.reshape(B, n_mb)


def _alphas_planar(srcY, srcU, srcV, B, n_mb):
    """Per-MB texture alphas [B, n_mb] (fastpath._mb_alphas, planar)."""
    return _alphas_planar2(srcY, srcU, srcV, B, n_mb)[0]


def plan_segments_planar(srcY, srcU, srcV, B, n_mb, quality, sns_strength,
                         num_segs, alphas=None):
    """Planar fastpath._segment_plan_device, batched over B images.

    alphas: optional precomputed ([B, n_mb] alphas, [B, n_mb] uv alphas)
    pair (e.g. from the Pallas kernel, alphas_planar_pallas) — skips the
    jnp alpha pass.
    Returns (seg_map [B, n_mb] i32, seg_q [B, 4] i32, seg_beta [B, 4],
    global_uv [B] i32 — the mean pre-mix UV alpha feeding dq_uv_ac,
    reference setSegmentParams, encode_analysis.go:163)."""
    from .fastpath import _plan_from_histo

    if alphas is None:
        alphas, uv_al = _alphas_planar2(srcY, srcU, srcV, B, n_mb)
    else:
        alphas, uv_al = alphas
    guv = uv_al.sum(axis=1) // n_mb                          # [B] i32
    au8 = alphas.astype(jnp.uint8)
    histo = jnp.stack([(au8 == k).sum(axis=1, dtype=jnp.int32)
                       for k in range(256)], axis=1)         # [B, 256]
    seg_map, seg_q, seg_beta = jax.vmap(
        lambda h, a: _plan_from_histo(h, a, quality, sns_strength,
                                      num_segs))(histo, alphas)
    return seg_map, seg_q, seg_beta, guv


# ---------------------------------------------------------------------------
# Phase 1 (Pallas): data-layout build + kernel dispatch.
# ---------------------------------------------------------------------------

def _pad_lanes(arr, B, n_mb, n_mb_p):
    """[R, B * n_mb] -> [R, B * n_mb_p] (per-image lane padding)."""
    if n_mb_p == n_mb:
        return arr
    R = arr.shape[0]
    return jnp.pad(arr.reshape(R, B, n_mb),
                   ((0, 0), (0, 0), (0, n_mb_p - n_mb))) \
        .reshape(R, B * n_mb_p)


def build_src_pallas(Yb, Ub, Vb, mb_w, mb_h, srcs=None):
    """u8 [N_SRC, B * n_mb_p] block-major source rows (the shared input
    of the Pallas alpha and mode-search kernels), n_mb_p padded to the
    kernel TILE. Returns (src_rows, (srcY, srcU, srcV) planar views,
    n_mb_p)."""
    from . import pallas_p1 as PP

    B = Yb.shape[0]
    n_mb = mb_w * mb_h
    if srcs is not None:
        srcY, srcU, srcV = srcs
    else:
        srcY = _src_planar(Yb, mb_h, mb_w, 16)
        srcU = _src_planar(Ub, mb_h, mb_w, 8)
        srcV = _src_planar(Vb, mb_h, mb_w, 8)
    L0 = B * n_mb
    src = jnp.concatenate([srcY.reshape(256, L0), srcU.reshape(64, L0),
                           srcV.reshape(64, L0)]).astype(jnp.uint8)
    n_mb_p = n_mb + (-n_mb) % PP.TILE
    return (_pad_lanes(src, B, n_mb, n_mb_p), (srcY, srcU, srcV), n_mb_p)


def alphas_planar_pallas(src_rows, B, n_mb, n_mb_p, interpret=False):
    """Per-MB texture alphas + UV alphas ([B, n_mb] i32 each) from the
    shared src rows (Pallas; bit-identical to _alphas_planar2)."""
    from . import pallas_p1 as PP

    a, uv = PP.alphas_pallas(src_rows, interpret=interpret)
    return (a.reshape(B, n_mb_p)[:, :n_mb],
            uv.reshape(B, n_mb_p)[:, :n_mb])


def phase1_planar_pallas(Yb, Ub, Vb, qtabs, lam16_4, lamuv_4, tlsd4,
                         seg_map, rt, mb_w, mb_h, srcs=None,
                         src_rows=None, interpret=False, lam_mode4=None):
    """Pallas-backed phase1_planar (ops/pallas_p1.py): bit-identical
    modes/scores, the whole 8-predictor search fused in VMEM.

    qtabs: i32 [B, 48, 16] quant rows (type*16 + seg*4 + param, zigzag
    cols; types y1/y2/uv). lam16_4/lamuv_4: [B, 4] f32 per-segment
    lambdas; lam_mode4: [B, 4] f32 split-decision lambdas (the emitted
    score is the chosen I16 mode's total rescored at lam_mode — see
    phase1_planar; defaults to lam16_4). tlsd4: [B, 4] f32 or None.
    seg_map: [B, n_mb] i32. src_rows: optional pre-built
    (src u8 [N_SRC, B*n_mb_p], srcs, n_mb_p) from build_src_pallas.

    Returns (modes [B, n_mb] u8, uvmodes [B, n_mb] u8, score [B, n_mb]).
    """
    from . import pallas_p1 as PP

    B = Yb.shape[0]
    n_mb = mb_w * mb_h
    if src_rows is None:
        src, (srcY, srcU, srcV), n_mb_p = build_src_pallas(
            Yb, Ub, Vb, mb_w, mb_h, srcs=srcs)
    else:
        src, (srcY, srcU, srcV), n_mb_p = src_rows
    L0 = B * n_mb
    topY, leftY, tlY = _ctx_planar(Yb, 16, mb_h, mb_w, src=srcY)
    topU, leftU, tlU = _ctx_planar(Ub, 8, mb_h, mb_w, src=srcU)
    topV, leftV, tlV = _ctx_planar(Vb, 8, mb_h, mb_w, src=srcV)
    ht, hl = _flags(mb_w, mb_h, B)

    rows = [topY, leftY, tlY[None], topU, leftU, tlU[None],
            topV, leftV, tlV[None],
            ht[None].astype(jnp.uint8), hl[None].astype(jnp.uint8),
            seg_map.reshape(1, L0)]
    ctx = jnp.concatenate([r.astype(jnp.uint8) for r in rows], axis=0)
    ctx = jnp.pad(ctx, ((0, PP.N_CTX - ctx.shape[0]), (0, 0)))
    ctx = _pad_lanes(ctx, B, n_mb, n_mb_p)
    tpi = n_mb_p // PP.TILE

    lams = jnp.zeros((B, 1, 128), jnp.float32)
    lams = lams.at[:, 0, 0:4].set(jnp.asarray(lam16_4, jnp.float32))
    lams = lams.at[:, 0, 4:8].set(jnp.asarray(lamuv_4, jnp.float32))
    use_td = tlsd4 is not None
    if use_td:
        lams = lams.at[:, 0, 8:12].set(jnp.asarray(tlsd4, jnp.float32))
    lams = lams.at[:, 0, 12:16].set(jnp.asarray(
        lam16_4 if lam_mode4 is None else lam_mode4, jnp.float32))

    mode, uv, score = PP.phase1_scores_pallas(
        src, ctx, qtabs, lams, rt, FC16, FCUV, use_td, tpi,
        interpret=interpret)
    mode = mode.reshape(B, n_mb_p)[:, :n_mb].astype(jnp.uint8)
    uv = uv.reshape(B, n_mb_p)[:, :n_mb].astype(jnp.uint8)
    score = score.reshape(B, n_mb_p)[:, :n_mb]
    return mode, uv, score


# ---------------------------------------------------------------------------
# Phase 1: I16 + UV searches.
# ---------------------------------------------------------------------------

def phase1_planar(Yb, Ub, Vb, qp_rows, lam, rt, mb_w, mb_h, tlsd=None,
                  srcs=None):
    """Batched planar I16 + UV mode search.

    Yb/Ub/Vb: [B, H, W] uint8-ish. qp_rows: {y1/y2/uv: tuple of 4 zigzag
    rows, each [16, 1] (single segment) or [16, L] (per-lane)}. lam:
    {"i16": [L] or scalar f32, "uv": ..., "mode": ...}. tlsd: [L] or
    scalar f32 or None. srcs: optional precomputed (srcY, srcU, srcV)
    planar blocks.

    Returns (modes [B, n_mb] u8, uvmodes [B, n_mb] u8,
             i16_score [B, n_mb] f32) — i16_score is the chosen mode's
    total rescored at lam["mode"], the I4-vs-I16 split lambda (reference
    encode_parallel.go:565; selection itself runs at lam["i16"]).
    """
    B = Yb.shape[0]
    n_mb = mb_w * mb_h
    if srcs is not None:
        srcY, srcU, srcV = srcs
    else:
        srcY = _src_planar(Yb, mb_h, mb_w, 16)
        srcU = _src_planar(Ub, mb_h, mb_w, 8)
        srcV = _src_planar(Vb, mb_h, mb_w, 8)
    has_top, has_left = _flags(mb_w, mb_h, B)

    topY, leftY, tlY = _ctx_planar(Yb, 16, mb_h, mb_w, src=srcY)
    best_score = jnp.full((B * n_mb,), jnp.inf, jnp.float32)
    best_rate = jnp.zeros((B * n_mb,), jnp.float32)
    best_D = jnp.zeros((B * n_mb,), jnp.float32)
    best_mode = jnp.zeros((B * n_mb,), jnp.uint8)
    if tlsd is not None:
        ha_src = _wha(srcY)                                  # [16, L]
    for m in range(4):
        pred_p = _pred16_m(m, topY, leftY, tlY, has_top, has_left)
        pred_b = pred_p.reshape(4, 4, 4, 4, -1).transpose(
            0, 2, 1, 3, 4).reshape(16, 4, 4, -1)
        if tlsd is not None:
            lv, y2lv, disto_td, recon = _luma_score_pipe(
                srcY, pred_b, qp_rows, with_recon=True)
        else:
            lv, y2lv, disto_td = _luma_score_pipe(
                srcY, pred_b, qp_rows, with_recon=False)
        rate = approx_rate_p(lv, 1, 0, rt).sum(axis=0)
        rate = rate + approx_rate_p(y2lv, 0, 1, rt)
        rate = rate + int(FC16[m])
        D = 64.0 * disto_td.astype(jnp.float32)
        if tlsd is not None:
            # Perceptual texture distortion (reference TDisto16x16 +
            # TLambdaSD, encode_analysis.go:1180), same units as
            # fastpath._phase1's tlsd term.
            td = (jnp.abs(_wha(recon) - ha_src) >> 5).sum(axis=0)
            D = D + tlsd * td.astype(jnp.float32)
        score = rate.astype(jnp.float32) * lam["i16"] + D
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_rate = jnp.where(better, rate.astype(jnp.float32), best_rate)
        best_D = jnp.where(better, D, best_D)
        best_mode = jnp.where(better, np.uint8(m), best_mode)
    lam_md = lam.get("mode", lam["i16"])
    best_score = best_rate * lam_md + best_D

    topU, leftU, tlU = _ctx_planar(Ub, 8, mb_h, mb_w, src=srcU)
    topV, leftV, tlV = _ctx_planar(Vb, 8, mb_h, mb_w, src=srcV)
    best_uv_score = jnp.full((B * n_mb,), jnp.inf, jnp.float32)
    best_uv = jnp.zeros((B * n_mb,), jnp.uint8)
    for m in range(4):
        rate = jnp.full((B * n_mb,), int(FCUV[m]), jnp.int32)
        disto = jnp.zeros((B * n_mb,), jnp.int32)
        for src, (tp, lf, tl) in ((srcU, (topU, leftU, tlU)),
                                  (srcV, (topV, leftV, tlV))):
            pred_p = _pred16_m(m, tp, lf, tl, has_top, has_left)
            pred_b = pred_p.reshape(2, 4, 2, 4, -1).transpose(
                0, 2, 1, 3, 4).reshape(4, 4, 4, -1)
            co = fdct4x4_p(src, pred_b)
            flat = co.reshape(4, 16, -1)
            lv, dq = quantize_p(flat, *qp_rows["uv"])
            disto = disto + ((flat - dq) ** 2).sum(axis=(0, 1))
            rate = rate + approx_rate_p(lv, 0, 2, rt).sum(axis=0)
        score = (rate.astype(jnp.float32) * lam["uv"]
                 + 64.0 * disto.astype(jnp.float32))
        better = score < best_uv_score
        best_uv_score = jnp.where(better, score, best_uv_score)
        best_uv = jnp.where(better, np.uint8(m), best_uv)

    return (best_mode.reshape(B, n_mb), best_uv.reshape(B, n_mb),
            best_score.reshape(B, n_mb))
