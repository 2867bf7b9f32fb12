"""Planar (lanes-minor) phase-2 wavefront for the batched device encoder.

The original `fastpath._phase2` carries per-MB tensors shaped
[lanes, 16, 4, 4]: the trailing 4x4 dims occupy only a sliver of the
TPU's (8, 128) vector registers, and every DCT butterfly slice/stack on
those minor axes is a relayout. This module transposes the whole scan to
a planar SoA layout: the wavefront-lane axis (batch x mb_h fused, N
lanes) is the MINOR axis everywhere, and pixel/coefficient indices live
on major axes, so

  * every elementwise op is a full-width [*, N] vector op,
  * every butterfly/zigzag/context slice is a major-axis slice (free),
  * the scan carry is a handful of [16, N] row vectors.

Bit-identical to `fastpath._phase2` (asserted in
tests/test_planar.py); single-band only (the multi-chip mesh path keeps
the original formulation, which carries its halo plumbing).

Reference behavior: /root/reference/internal/lossy/encode_parallel.go:168
(the wavefront being re-laid-out) and transforms.go (exact DCT/WHT math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.encode import FIXED_COSTS_I16 as FC16
from ..lossy.encode import FIXED_COSTS_UV as FCUV
from .quant import QFIX, MAX_LEVEL, _WT

ZIGZAG = np.asarray(T.ZIGZAG)
INV_ZIGZAG = np.argsort(ZIGZAG)

C1 = 20091
C2 = 35468


def _mul1(a):
    return ((a * C1) >> 16) + a


def _mul2(a):
    return (a * C2) >> 16


# ---------------------------------------------------------------------------
# Planar transforms: [..., 4, 4, N] with rows on axis -3, cols on axis -2,
# lanes minor. Same integer math as ops/dct.py.
# ---------------------------------------------------------------------------

def fdct4x4_p(src, ref):
    d = src.astype(jnp.int32) - ref.astype(jnp.int32)
    d0, d1, d2, d3 = (d[..., 0, :], d[..., 1, :], d[..., 2, :], d[..., 3, :])
    a0 = d0 + d3
    a1 = d1 + d2
    a2 = d1 - d2
    a3 = d0 - d3
    t0 = (a0 + a1) * 8
    t1 = (a2 * 2217 + a3 * 5352 + 1812) >> 9
    t2 = (a0 - a1) * 8
    t3 = (a3 * 2217 - a2 * 5352 + 937) >> 9
    tmp = jnp.stack([t0, t1, t2, t3], axis=-2)
    m0, m1, m2, m3 = (tmp[..., 0, :, :], tmp[..., 1, :, :],
                      tmp[..., 2, :, :], tmp[..., 3, :, :])
    a0 = m0 + m3
    a1 = m1 + m2
    a2 = m1 - m2
    a3 = m0 - m3
    o0 = (a0 + a1 + 7) >> 4
    o2 = (a0 - a1 + 7) >> 4
    o1 = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + (a3 != 0).astype(jnp.int32)
    o3 = (a3 * 2217 - a2 * 5352 + 51000) >> 16
    return jnp.stack([o0, o1, o2, o3], axis=-3)


def idct4x4_p(coeffs):
    c = coeffs.astype(jnp.int32)
    i0, i1, i2, i3 = (c[..., 0, :, :], c[..., 1, :, :],
                      c[..., 2, :, :], c[..., 3, :, :])
    a = i0 + i2
    b = i0 - i2
    cc = _mul2(i1) - _mul1(i3)
    d = _mul1(i1) + _mul2(i3)
    tmp = jnp.stack([a + d, b + cc, b - cc, a - d], axis=-3)
    dc = tmp[..., 0, :] + 4
    a = dc + tmp[..., 2, :]
    b = dc - tmp[..., 2, :]
    cc = _mul2(tmp[..., 1, :]) - _mul1(tmp[..., 3, :])
    d = _mul1(tmp[..., 1, :]) + _mul2(tmp[..., 3, :])
    out = jnp.stack([a + d, b + cc, b - cc, a - d], axis=-2) >> 3
    return out


def fwht4x4_p(dcs):
    """Forward WHT over sub-block DCs [..., 4, 4, N]."""
    d = dcs.astype(jnp.int32)
    c0, c1, c2, c3 = (d[..., 0, :], d[..., 1, :], d[..., 2, :], d[..., 3, :])
    a0 = c0 + c2
    a1 = c1 + c3
    a2 = c1 - c3
    a3 = c0 - c2
    tmp = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-2)
    r0, r1, r2, r3 = (tmp[..., 0, :, :], tmp[..., 1, :, :],
                      tmp[..., 2, :, :], tmp[..., 3, :, :])
    a0 = r0 + r2
    a1 = r1 + r3
    a2 = r1 - r3
    a3 = r0 - r2
    out = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=-3) >> 1
    return out


def wht4x4_p(coeffs):
    """Inverse WHT [..., 4, 4, N]."""
    c = coeffs.astype(jnp.int32)
    i0, i1, i2, i3 = (c[..., 0, :, :], c[..., 1, :, :],
                      c[..., 2, :, :], c[..., 3, :, :])
    a0 = i0 + i3
    a1 = i1 + i2
    a2 = i1 - i2
    a3 = i0 - i3
    tmp = jnp.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2], axis=-3)
    dc = tmp[..., 0, :] + 3
    a0 = dc + tmp[..., 3, :]
    a1 = tmp[..., 1, :] + tmp[..., 2, :]
    a2 = tmp[..., 1, :] - tmp[..., 2, :]
    a3 = dc - tmp[..., 3, :]
    out = jnp.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2], axis=-2) >> 3
    return out


def quantize_p(coeffs, q, iq, bias, sharpen, first: int = 0,
               rd_drop: float = 0.0):
    """coeffs int32 [..., 16, N] raster -> (levels_zz, dequant) same shape.

    q/iq/bias/sharpen: int32 [16, 1] (static) or [16, N] (per-lane
    segment rows), zigzag order. Same math as ops/quant.quantize.
    """
    czz = coeffs[..., ZIGZAG, :]
    sign = czz < 0
    mag = jnp.abs(czz) + sharpen
    level = (mag * iq + bias) >> QFIX
    level = jnp.minimum(level, MAX_LEVEL)
    if rd_drop:
        qf = q.astype(jnp.float32)
        c0 = mag.astype(jnp.float32)
        dd = jnp.asarray(_WT)[:, None] * (c0 * c0 - (c0 - qf) * (c0 - qf))
        base = jnp.floor((qf[..., 0:1, :] + 15.0 * qf[..., 1:2, :] + 8.0)
                         * (1.0 / 16.0))
        tlam = base * base * 0.25
        level = jnp.where((level == 1) & (256.0 * dd < rd_drop * tlam),
                          0, level)
    level = jnp.where(sign, -level, level)
    if first:
        level = level.at[..., 0, :].set(0)
    dq_zz = level * q
    dequant = dq_zz[..., INV_ZIGZAG, :]
    return level, dequant


# ---------------------------------------------------------------------------
# Planar block <-> plane views (all major-axis reshapes; no data movement
# along the lane axis).
# ---------------------------------------------------------------------------

def plane_to_blocks_p(x, size):
    """[..., S, S, N] -> [..., (S/4)^2, 4, 4, N] raster 4x4 blocks."""
    *lead, S, _, N = x.shape
    b = size // 4
    x = x.reshape(*lead, b, 4, b, 4, N)
    x = jnp.moveaxis(x, -3, -4)
    return x.reshape(*lead, b * b, 4, 4, N)


def blocks_to_plane_p(x, size):
    *lead, nb, _, _, N = x.shape
    b = size // 4
    x = x.reshape(*lead, b, b, 4, 4, N)
    x = jnp.moveaxis(x, -3, -4)
    return x.reshape(*lead, size, size, N)


# ---------------------------------------------------------------------------
# Planar predictors.
# ---------------------------------------------------------------------------

def preds4_p(size, top, left, tl, has_top, has_left):
    """top/left [s, N], tl/has_* [N] -> [4, s, s, N] preds (DC/TM/V/H)."""
    shift = 5 if size == 16 else 4
    ht = has_top[None, :]
    hl = has_left[None, :]
    top_m = jnp.where(ht, top, 127)
    left_m = jnp.where(hl, left, 129)
    tl_m = jnp.where(has_top & has_left, tl,
                     jnp.where(has_top, 129, 127))
    sum_t = top_m.sum(axis=0)
    sum_l = left_m.sum(axis=0)
    dc = jnp.where(
        has_top & has_left, (sum_t + sum_l + size) >> shift,
        jnp.where(has_top, (sum_t + (size >> 1)) >> (shift - 1),
                  jnp.where(has_left, (sum_l + (size >> 1)) >> (shift - 1),
                            0x80)))
    N = top.shape[-1]
    shape = (size, size, N)
    pred_dc = jnp.broadcast_to(dc[None, None, :], shape)
    pred_v = jnp.broadcast_to(top_m[None, :, :], shape)
    pred_h = jnp.broadcast_to(left_m[:, None, :], shape)
    pred_tm = jnp.clip(
        left_m[:, None, :] + top_m[None, :, :] - tl_m[None, None, :], 0, 255)
    return jnp.stack([pred_dc, pred_tm, pred_v, pred_h], axis=0)


def _a2(a, b):
    return (a + b + 1) >> 1


def _a3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _rows_p(*rows):
    """Stack 4 [..., 4, N] rows into [..., 4, 4, N]."""
    return jnp.stack(rows, axis=-3)


def pred4_all_p(t, l, tl, tr):
    """Planar 10 B-mode predictions (same strips as ops/i4.pred4_all).

    t/l/tr: [..., 4, N]; tl: [..., N]. Returns list of 10 [..., 4, 4, N].
    """
    ctx = jnp.concatenate(
        [l[..., ::-1, :], tl[..., None, :], t, tr], axis=-2)   # [..., 13, N]
    s3 = _a3(ctx[..., :-2, :], ctx[..., 1:-1, :], ctx[..., 2:, :])
    s2 = _a2(ctx[..., :-1, :], ctx[..., 1:, :])
    lr = jnp.concatenate([ctx[..., 4:5, :], l, l[..., 3:4, :]], axis=-2)
    s3h = _a3(lr[..., :-2, :], lr[..., 1:-1, :], lr[..., 2:, :])   # [..., 4, N]
    s2h = _a2(lr[..., :-1, :], lr[..., 1:, :])                     # [..., 5, N]
    l3 = l[..., 3, :]

    shape44 = t.shape[:-2] + (4, 4) + t.shape[-1:]
    dc = (t.sum(axis=-2) + l.sum(axis=-2) + 4) >> 3
    p_dc = jnp.broadcast_to(dc[..., None, None, :], shape44)
    p_tm = jnp.clip(l[..., :, None, :] + t[..., None, :, :]
                    - tl[..., None, None, :], 0, 255)
    p_ve = jnp.broadcast_to(s3[..., None, 4:8, :], shape44)
    p_he = jnp.broadcast_to(s3h[..., :, None, :], shape44)
    p_rd = _rows_p(s3[..., 3:7, :], s3[..., 2:6, :], s3[..., 1:5, :],
                   s3[..., 0:4, :])
    c2 = s2[..., 4:8, :]
    d3 = s3[..., 3:7, :]
    p_vr = _rows_p(c2, d3,
                   jnp.concatenate([s3[..., 2:3, :], c2[..., 0:3, :]],
                                   axis=-2),
                   jnp.concatenate([s3[..., 1:2, :], d3[..., 0:3, :]],
                                   axis=-2))
    f = jnp.concatenate(
        [s3[..., 5:11, :],
         _a3(tr[..., 2, :], tr[..., 3, :], tr[..., 3, :])[..., None, :]],
        axis=-2)
    p_ld = _rows_p(f[..., 0:4, :], f[..., 1:5, :], f[..., 2:6, :],
                   f[..., 3:7, :])
    g2 = s2[..., 5:9, :]
    g3 = s3[..., 5:9, :]
    p_vl = _rows_p(g2, g3,
                   jnp.concatenate([g2[..., 1:4, :], s3[..., 9:10, :]],
                                   axis=-2),
                   jnp.concatenate([g3[..., 1:4, :], s3[..., 10:11, :]],
                                   axis=-2))
    hd0 = jnp.concatenate([s2h[..., 0:1, :], s3[..., 3:6, :]], axis=-2)
    hd1 = jnp.concatenate([s2h[..., 1:2, :], s3h[..., 0:1, :],
                           hd0[..., 0:2, :]], axis=-2)
    hd2 = jnp.concatenate([s2h[..., 2:3, :], s3h[..., 1:2, :],
                           hd1[..., 0:2, :]], axis=-2)
    hd3 = jnp.concatenate([s2h[..., 3:4, :], s3h[..., 2:3, :],
                           hd2[..., 0:2, :]], axis=-2)
    p_hd = _rows_p(hd0, hd1, hd2, hd3)
    l3b = jnp.broadcast_to(l3[..., None, :], l3.shape[:-1] + (4,)
                           + l3.shape[-1:])
    hu0 = jnp.stack([s2h[..., 1, :], s3h[..., 1, :], s2h[..., 2, :],
                     s3h[..., 2, :]], axis=-2)
    hu1 = jnp.concatenate([hu0[..., 2:4, :], s2h[..., 3:4, :],
                           s3h[..., 3:4, :]], axis=-2)
    hu2 = jnp.concatenate([hu1[..., 2:4, :], l3b[..., 0:2, :]], axis=-2)
    p_hu = _rows_p(hu0, hu1, hu2, l3b)

    return [p_dc, p_tm, p_ve, p_he, p_rd, p_vr, p_ld, p_vl, p_hd, p_hu]


def _exact_rate_tables():
    """Static tables for exact_rate_p, built once from the default probas
    (the same source as the host cost tables, lossy/cost.py)."""
    from ..lossy.cost import (ENTROPY_COST, LEVEL_FIXED_COSTS,
                              compute_level_cost_tables)

    proba = np.asarray(T.COEFFS_PROBA0)
    ct = compute_level_cost_tables(proba)                  # [4, 8, 3, 68]
    bands = np.asarray(T.BANDS[:16])
    # Per-position flat gather table: G[pt, n*204 + ctx*68 + vv].
    g = ct[:, bands].reshape(4, 16 * 3 * 68).astype(np.int32)
    p0 = proba[..., 0].astype(np.int64)                    # [4, 8, 3]
    ec = np.asarray(ENTROPY_COST, np.int64)
    eob0 = ec[p0][:, bands].astype(np.int32)               # [4,16,3] bit0 @ n
    # Band of position n+1 for the trailing EOB term (n+1 <= 15).
    bands_next = np.asarray(T.BANDS[1:17])[:16]
    eob_next = ec[p0][:, bands_next].astype(np.int32)      # [4,16,3]
    first_bit = ec[255 - p0][:, bands, 0].astype(np.int32)  # [4,16] bit1@ctx0
    lf = np.asarray(LEVEL_FIXED_COSTS, np.int32)
    return g, eob0, eob_next, first_bit, lf


_ERT = _exact_rate_tables()


def exact_rate_p(levels, first: int, pt: int, ctx0):
    """Exact residual rate of zigzag level blocks (host parity with
    lossy/cost.py residual_cost / vp8_enc_loop.cc ResidualCost, default
    probas). levels: [..., 16, N] int; ctx0: broadcastable [..., N] int32
    in {0,1,2}. Returns int32 [..., N].

    The band/context chain is non-recursive (ctx_n = min(|lv[n-1]|, 2)),
    so the whole cost is one fused gather over a static [16*204] table
    plus elementwise masking — unlike approx_rate_p this charges the true
    per-(band, ctx) prices, which the I4 search and the I16/I4 split are
    sensitive to."""
    g, eob0, eob_next, first_bit, lf = _ERT
    v = jnp.abs(levels.astype(jnp.int32))                  # [..., 16, N]
    pos = jnp.arange(16)[:, None]
    nzv = (v != 0) & (pos >= first)
    has = nzv.any(axis=-2)                                 # [..., N]
    last = 15 - jnp.argmax(nzv[..., ::-1, :], axis=-2)     # [..., N]
    last = jnp.where(has, last, first)
    vv = jnp.minimum(v, 67)
    vf = jnp.minimum(v, 2047)
    ctx = jnp.minimum(jnp.roll(v, 1, axis=-2), 2)
    ctx = ctx.at[..., first, :].set(jnp.broadcast_to(ctx0, ctx.shape[:-2]
                                                     + ctx.shape[-1:]))
    idx = pos * 204 + ctx * 68 + vv
    cost_n = (jnp.asarray(g[pt])[idx]
              + jnp.asarray(lf)[vf])                       # [..., 16, N]
    in_run = (pos >= first) & (pos <= last[..., None, :])
    total = jnp.where(in_run, cost_n, 0).sum(axis=-2)
    # Trailing not-EOB -> EOB bit at band(last+1), ctx from the last level.
    v_last = jnp.take_along_axis(v, last[..., None, :], axis=-2)[..., 0, :]
    eob_ctx = jnp.where(v_last == 1, 1, 2)
    eob_term = jnp.where(
        last < 15, jnp.asarray(eob_next[pt])[last, eob_ctx], 0)
    fb = jnp.where(jnp.asarray(ctx0) == 0, int(first_bit[pt, first]), 0)
    empty = jnp.asarray(eob0[pt, first])[ctx0]
    return jnp.where(has, fb + total + eob_term, empty).astype(jnp.int32)


def luma_rate16_p(lv, tnz, lnz):
    """Exact I16 luma AC rate with the intra-MB nonzero chain
    (vp8_enc_loop.cc LumaRate): lv [16, 16, N] zigzag (first=1, pt=0),
    tnz/lnz [N] 4-bit masks from the above/left MBs."""
    nz = (lv[:, 1:] != 0).any(axis=1)                      # [16, N] bool
    rate = jnp.zeros(lv.shape[-1:], jnp.int32)
    t = [(tnz >> c) & 1 for c in range(4)]
    l = [(lnz >> r) & 1 for r in range(4)]
    for r in range(4):
        for c in range(4):
            bi = r * 4 + c
            ctx0 = t[c] + l[r]
            rate = rate + exact_rate_p(lv[bi], 1, 0, ctx0)
            b = nz[bi].astype(jnp.int32)
            t[c] = b
            l[r] = b
    return rate


def uv_rate4_p(lv, tnz, lnz):
    """Exact one-plane chroma rate with the intra-MB nonzero chain
    (vp8_enc_loop.cc UVRate): lv [4, 16, N] zigzag (first=0, pt=2),
    tnz/lnz [N] 2-bit masks from the above/left MBs. Returns
    (rate [N] i32, t2 [N], l2 [N]) where t2/l2 are the outgoing 2-bit
    chains (bottom-row / right-column block nonzeros)."""
    nz = (lv != 0).any(axis=1)                             # [4, N] bool
    t = [(tnz >> c) & 1 for c in range(2)]
    l = [(lnz >> r) & 1 for r in range(2)]
    rate = jnp.zeros(lv.shape[-1:], jnp.int32)
    for r in range(2):
        for c in range(2):
            bi = r * 2 + c
            rate = rate + exact_rate_p(lv[bi], 0, 2, t[c] + l[r])
            b = nz[bi].astype(jnp.int32)
            t[c] = b
            l[r] = b
    return rate, t[0] | (t[1] << 1), l[0] | (l[1] << 1)


def approx_rate_p(levels, first, pt, rt):
    """Planar fastpath.approx_block_rate: levels [..., 16, N] zigzag ->
    rate [..., N]. Same fused select-chains (band-exact per-position
    constants + per-band EOB), coefficient axis at -2."""
    v = jnp.abs(levels)
    idx = jnp.arange(16).reshape(16, 1)
    nzv = (v != 0) & (idx >= first)
    has_any = nzv.any(axis=-2)
    last = 15 - jnp.argmax(nzv[..., ::-1, :], axis=-2)
    last = jnp.where(has_any, last, 0)
    vc = jnp.minimum(v, 7)
    cost = jnp.zeros(v.shape, jnp.int32)
    for k in range(8):
        cost = cost + jnp.where(vc == k,
                                jnp.asarray(rt.lvlp[pt, :, k])[:, None], 0)
    for b, (lo, hi) in enumerate(((8, 11), (11, 19), (19, 35),
                                  (35, 1 << 30))):
        cost = cost + jnp.where((v >= lo) & (v < hi),
                                jnp.asarray(rt.tailp[pt, :, b])[:, None], 0)
    in_run = (idx >= first) & (idx <= last[..., None, :])
    total = jnp.where(in_run, cost, 0).sum(axis=-2)
    e_pos = jnp.where(v == 1, jnp.asarray(rt.eob1p[pt])[:, None],
                      jnp.asarray(rt.eob2p[pt])[:, None])
    eob = jnp.where(idx == last[..., None, :], e_pos, 0).sum(axis=-2)
    return jnp.where(has_any, total + eob, int(rt.emptyp[pt, first]))


# ---------------------------------------------------------------------------
# Planar transform pipelines.
# ---------------------------------------------------------------------------

def luma_pipe_p(src_b, pred_b, qp, rd_drop: float = 0.0):
    """src/pred: [16, 4, 4, N] int32; qp: dict of (q, iq, bias, sharpen)
    with [16, 1|N] rows. Returns (lv [16, 16, N], y2lv [16, N],
    recon [16, 4, 4, N])."""
    coeffs = fdct4x4_p(src_b, pred_b)
    flat = coeffs.reshape(16, 16, *coeffs.shape[3:])
    wht = fwht4x4_p(flat[:, 0].reshape(4, 4, -1))
    y2lv, y2dq = quantize_p(wht.reshape(16, -1), *qp["y2"])
    rec_dc = wht4x4_p(y2dq.reshape(4, 4, -1)).reshape(16, -1)
    lv, dq = quantize_p(flat, *qp["y1"], first=1, rd_drop=rd_drop)
    dq = dq.at[:, 0].set(rec_dc)
    recon = jnp.clip(pred_b + idct4x4_p(dq.reshape(coeffs.shape)), 0, 255)
    return lv, y2lv, recon


def chroma_pipe_p(src_b, pred_b, qp):
    """[4, 4, 4, N] blocks -> (lv [4, 16, N], recon [4, 4, 4, N])."""
    co = fdct4x4_p(src_b, pred_b)
    flat = co.reshape(4, 16, *co.shape[3:])
    lv, dq = quantize_p(flat, *qp["uv"])
    recon = jnp.clip(pred_b + idct4x4_p(dq.reshape(co.shape)), 0, 255)
    return lv, recon


def i4_reconstruct_p(src_b, modes, topY, leftY, tlY, trs, has_top, has_left,
                     qp_y1, rd_drop: float = 0.0, trellis=False, tlam=None,
                     tnz=None, lnz=None, search=False, lam=None, rt=None,
                     tbm=None, lbm=None):
    """Planar closed-loop I4 walk (same schedule as ops/i4.i4_reconstruct).

    src_b: [16, 4, 4, N] int32 raster subblocks; modes: [16, N];
    topY/leftY: [16, N]; tlY: [N]; trs: [4, N]; has_*: [N].
    qp_y1: (q, iq, bias, sharpen) [16, 1|N].
    With trellis=True each subblock's levels are re-quantized by the
    planar Viterbi trellis (ops/trellis.py, host parity with
    encode.py:428 / encode_trellis.go): tlam [1|N] is the trellis
    lambda, tnz/lnz [N] int32 are 4-bit nonzero masks of the above/left
    MB's border subblocks (already masked by has_top/has_left).
    With search=True the walk re-runs the 10-mode RD search per subblock
    against the TRUE reconstructed context (host parity with the
    closed-loop PickBestIntra4, encode.go; rates from approx_rate_p,
    pixel-domain SSE x 256): lam [1|N] is the I4 lambda, rt the
    RateTables; `modes` is ignored. Requires the skew-2 above-right
    strip (full mode set — no TR ban).
    Returns (lv [16, 16, N] zigzag, recon plane [16, 16, N],
    t4 [N], l4 [N], modes_out [16, N]) where t4/l4 are this MB's
    bottom-row/right-col nonzero masks for the neighbor context chain
    and modes_out the chosen (or passed-through) modes."""
    N = src_b.shape[-1]
    if trellis:
        from .trellis import trellis_p
        t4 = tnz if tnz is not None else jnp.zeros((N,), jnp.int32)
        l4 = lnz if lnz is not None else jnp.zeros((N,), jnp.int32)
    else:
        t4 = l4 = jnp.zeros((N,), jnp.int32)
    if search:
        # Mode-context chain for exact header costs (encode.go
        # fixedCostsI4[top][left][mode]); 0 (DC) at image borders.
        z = jnp.zeros((N,), jnp.int32)
        tmv = [tbm[c] if tbm is not None else z for c in range(4)]
        lmv = [lbm[r] if lbm is not None else z for r in range(4)]
        rd_rate = jnp.zeros((N,), jnp.int32)     # chosen-mode rate sum
        rd_disto = jnp.zeros((N,), jnp.int32)    # chosen-mode pixel SSE sum
    top_row = jnp.where(has_top[None, :], topY, 127)
    left_col = jnp.where(has_left[None, :], leftY, 129)
    tl0 = jnp.where(has_top & has_left, tlY,
                    jnp.where(has_top, 129, 127))
    tr_strip = jnp.where(has_top[None, :], trs, 127)

    groups = [[(0, 0)], [(0, 1)], [(0, 2), (1, 0)], [(0, 3), (1, 1)],
              [(1, 2), (2, 0)], [(1, 3), (2, 1)], [(2, 2), (3, 0)],
              [(2, 3), (3, 1)], [(3, 2)], [(3, 3)]]

    def ctx_of(work, r, c):
        t = top_row[c * 4:c * 4 + 4] if r == 0 \
            else work[r * 4 - 1, c * 4:c * 4 + 4]
        l = left_col[r * 4:r * 4 + 4] if c == 0 \
            else work[r * 4:r * 4 + 4, c * 4 - 1]
        if r == 0 and c == 0:
            tl = tl0
        elif r == 0:
            tl = top_row[c * 4 - 1]
        elif c == 0:
            tl = left_col[r * 4 - 1]
        else:
            tl = work[r * 4 - 1, c * 4 - 1]
        if c == 3:
            tr = tr_strip
        elif r == 0:
            tr = top_row[c * 4 + 4:c * 4 + 8]
        else:
            tr = work[r * 4 - 1, c * 4 + 4:c * 4 + 8]
        return t, l, tl, tr

    work = jnp.zeros((16, 16, N), jnp.int32)
    lv_by_n = [None] * 16
    mode_by_n = [None] * 16
    for group in groups:
        g = len(group)
        ctxs = [ctx_of(work, r, c) for (r, c) in group]
        t = jnp.stack([cx[0] for cx in ctxs], axis=0)       # [g, 4, N]
        l = jnp.stack([cx[1] for cx in ctxs], axis=0)
        tl = jnp.stack([cx[2] for cx in ctxs], axis=0)      # [g, N]
        tr = jnp.stack([cx[3] for cx in ctxs], axis=0)
        preds = pred4_all_p(t, l, tl, tr)                   # 10 x [g, 4, 4, N]
        src = jnp.stack([src_b[r * 4 + c] for (r, c) in group], axis=0)
        if search:
            from ..lossy.cost import FIXED_COSTS_I4
            pall = jnp.stack(preds, axis=0)                 # [10, g, 4, 4, N]
            co_all = fdct4x4_p(jnp.broadcast_to(src, pall.shape), pall)
            lv_s, dq_s = quantize_p(co_all.reshape(10, g, 16, N), *qp_y1)
            rec_s = jnp.clip(pall + idct4x4_p(dq_s.reshape(10, g, 4, 4, N)),
                             0, 255)
            disto = ((src[None] - rec_s) ** 2).sum(axis=(-3, -2))  # [10,g,N]
            tmode = jnp.stack([tmv[c] for (_, c) in group], axis=0)  # [g, N]
            lmode = jnp.stack([lmv[r] for (r, _) in group], axis=0)
            idx10 = ((tmode * 10 + lmode)[..., None] * 10
                     + np.arange(10))                       # [g, N, 10]
            hdr = jnp.asarray(np.asarray(FIXED_COSTS_I4).reshape(-1),
                              jnp.int32)[idx10]
            # Exact chained residual rates against the live nonzero-
            # context chain (t4/l4 pre-update, like vp8_enc_loop.cc's
            # `int ctx = ((l4 >> r) & 1) + ((t4 >> c) & 1)`).
            ctx0_g = jnp.stack([((l4 >> r) & 1) + ((t4 >> c) & 1)
                                for (r, c) in group], axis=0)   # [g, N]
            rate = (exact_rate_p(lv_s, 0, 3, ctx0_g)
                    + jnp.moveaxis(hdr, -1, 0))
            score = (rate.astype(jnp.float32) * lam
                     + 256.0 * disto.astype(jnp.float32))
            mode_sel = jnp.argmin(score, axis=0)            # [g, N]
            msk = jnp.arange(10)[:, None, None] == mode_sel[None]  # [10,g,N]
            rd_rate = rd_rate + jnp.where(msk, rate, 0).sum(axis=(0, 1))
            rd_disto = rd_disto + jnp.where(msk, disto, 0).sum(axis=(0, 1))
            for i, (r, c) in enumerate(group):
                tmv[c] = mode_sel[i]
                lmv[r] = mode_sel[i]
            m4 = mode_sel[:, None, None, :]                 # [g, 1, 1, N]
            m3 = mode_sel[:, None, :]                       # [g, 1, N]
            pred = pall[0]
            co = co_all[0].reshape(g, 16, N)
            for m in range(1, 10):
                pred = jnp.where(m4 == m, pall[m], pred)
                co = jnp.where(m3 == m, co_all[m].reshape(g, 16, N), co)
            mode_grp = mode_sel
        else:
            mode = jnp.stack([modes[r * 4 + c] for (r, c) in group],
                             axis=0).astype(jnp.int32)[:, None, None, :]
            pred = preds[0]
            for m in range(1, 10):
                pred = jnp.where(mode == m, preds[m], pred)
            co = fdct4x4_p(src, pred).reshape(g, 16, N)
            mode_grp = mode[:, 0, 0, :]
        if trellis:
            ctx0 = jnp.stack([((l4 >> r) & 1) + ((t4 >> c) & 1)
                              for (r, c) in group], axis=0)     # [g, N]
            q, iq, _, sharpen = qp_y1
            lv, dq = trellis_p(co, q, iq, sharpen, tlam, ctx0)
            nzb = (lv != 0).any(axis=1).astype(jnp.int32)       # [g, N]
            for i, (r, c) in enumerate(group):
                t4 = (t4 & ~(1 << c)) | (nzb[i] << c)
                l4 = (l4 & ~(1 << r)) | (nzb[i] << r)
        else:
            lv, dq = quantize_p(co, *qp_y1, rd_drop=rd_drop * 3.5)
        rec = jnp.clip(pred + idct4x4_p(dq.reshape(g, 4, 4, N)), 0, 255)
        for i, (r, c) in enumerate(group):
            lv_by_n[r * 4 + c] = lv[i]
            mode_by_n[r * 4 + c] = mode_grp[i]
            work = work.at[r * 4:r * 4 + 4, c * 4:c * 4 + 4].set(rec[i])
    if search:
        bm_out = (jnp.stack(tmv, axis=0), jnp.stack(lmv, axis=0))  # [4, N]
        rd_out = (rd_rate, rd_disto)
    else:
        bm_out = (None, None)
        rd_out = (None, None)
    return (jnp.stack(lv_by_n, axis=0), work, t4, l4,
            jnp.stack(mode_by_n, axis=0).astype(jnp.uint8), bm_out, rd_out)


# ---------------------------------------------------------------------------
# Batched planar phase 2.
# ---------------------------------------------------------------------------

def _skew_b(a, mb_w, mb_h, n_steps, sk):
    """[B, mb_h, mb_w, K...] -> [n_steps, K..., B * mb_h] via the pad +
    reshape shear (no gather), then one transpose to lanes-minor."""
    B = a.shape[0]
    tail = a.shape[3:]
    P = n_steps + sk
    pad_w = [(0, 0)] * a.ndim
    pad_w[2] = (0, P - mb_w)
    b = jnp.pad(a, pad_w)
    flat = b.reshape(B, mb_h * P, *tail)[:, : mb_h * n_steps]
    c = flat.reshape(B, mb_h, n_steps, *tail)
    # [B, mb_h, T, K...] -> [T, K..., B, mb_h] -> [T, K..., N]
    nk = len(tail)
    perm = (2,) + tuple(range(3, 3 + nk)) + (0, 1)
    return c.transpose(perm).reshape(n_steps, *tail, B * mb_h)


def _unskew_b(c_sk, B, mb_w, mb_h, n_steps, sk):
    """[n_steps, K..., N] -> [B, mb_h * mb_w, K...] (inverse shear)."""
    tail = c_sk.shape[1:-1]
    nk = len(tail)
    # [T, K..., B, mb_h] -> [B, mb_h, T, K...]
    c = c_sk.reshape(n_steps, *tail, B, mb_h)
    perm = (1 + nk, 2 + nk, 0) + tuple(range(1, 1 + nk))
    c = c.transpose(perm)                         # [B, mb_h, T, K...]
    flat = c.reshape(B, mb_h * n_steps, *tail)
    pad_w = [(0, 0)] * flat.ndim
    pad_w[1] = (0, mb_h * sk)
    flat = jnp.pad(flat, pad_w)
    out = flat.reshape(B, mb_h, n_steps + sk, *tail)[:, :, :mb_w]
    return out.reshape(B, mb_h * mb_w, *tail)


def _valid_mask_np(B, mb_w, mb_h, n_steps, sk):
    """[T, N] bool: lane (b, y) holds a real MB at step t iff
    0 <= t - sk*y < mb_w."""
    t = np.arange(n_steps)[:, None]
    y = np.tile(np.arange(mb_h), B)[None, :]
    x = t - sk * y
    return jnp.asarray((x >= 0) & (x < mb_w))


def pack_wire_planar(lv_sk, y2_sk, B, mb_w, mb_h, n_steps, sk, esc_cap):
    """Wire-format packing straight off the skewed scan outputs.

    The unskewed [B, n_mb, 24, 16] i16 level tensor tiles the TPU's
    (sublane, lane) grid at 1/8 lane occupancy, so packing from it pays
    ~8x its logical traffic in relayouts. This packs nibbles, escape
    compaction and skip flags in the scan's own [.., N]-minor layout
    (every op full-width) and unskews only the final u8 bytes.

    lv_sk: [T, 24, 16, N] i16; y2_sk: [T, 16, N] i16.
    Returns dict(packed [B, n_mb, 24, 8] u8, esc_idx [B, esc_cap] i32
    (block ids, same semantics as fastpath._pack_levels), esc_val
    [B, esc_cap, 16] i16, esc_cnt [B] i32, y2 [B, n_mb, 16] i16,
    skip [B, n_mb] bool).
    """
    T = n_steps
    N = B * mb_h
    n_mb = mb_w * mb_h
    valid = _valid_mask_np(B, mb_w, mb_h, n_steps, sk)        # [T, N]

    v = lv_sk.astype(jnp.int32)
    esc = jnp.abs(v) > 7
    nib = jnp.where(esc, 0, jnp.clip(v, -7, 7) + 8).astype(jnp.uint8)
    packed_sk = nib[:, :, 0::2, :] | (nib[:, :, 1::2, :] << 4)
    packed = _unskew_b(packed_sk, B, mb_w, mb_h, n_steps, sk)

    blk_z = (v == 0).all(axis=2)                              # [T, 24, N]
    mb_skip = blk_z.all(axis=1) & (y2_sk == 0).all(axis=1)    # [T, N]
    skip = _unskew_b(mb_skip, B, mb_w, mb_h, n_steps, sk)     # [B, n_mb]

    escb = esc.any(axis=2) & valid[:, None, :]                # [T, 24, N]
    # Per-image local planar id lid = (t*24 + c)*mb_h + y.
    fl = escb.reshape(T, 24, B, mb_h).transpose(2, 0, 1, 3) \
        .reshape(B, T * 24 * mb_h)
    n_lid = T * 24 * mb_h
    lids = jnp.arange(n_lid, dtype=jnp.int32)
    keys = jnp.where(fl, lids[None, :], jnp.int32(n_lid))
    idx = jax.lax.sort(keys, dimension=1, is_stable=False)[:, :esc_cap]
    idx = jnp.where(idx >= n_lid, 0, idx)
    esc_cnt = fl.sum(axis=1).astype(jnp.int32)

    t_of = idx // (24 * mb_h)
    c_of = (idx // mb_h) % 24
    y_of = idx % mb_h
    x_of = t_of - sk * y_of
    esc_idx = (y_of * mb_w + x_of) * 24 + c_of                # block ids

    lv_flat = lv_sk.reshape(-1)
    j16 = (jnp.arange(16, dtype=jnp.int32) * N)[None, :]

    def gather_one(b, tt, cc, yy):
        base = ((tt * 24 + cc) * 16) * N + b * mb_h + yy
        return lv_flat[base[:, None] + j16]

    esc_val = jax.vmap(gather_one)(
        jnp.arange(B, dtype=jnp.int32), t_of, c_of, y_of)     # [B, cap, 16]

    y2 = _unskew_b(y2_sk, B, mb_w, mb_h, n_steps, sk)         # [B, n_mb, 16]
    return {"packed": packed, "esc_idx": esc_idx, "esc_val": esc_val,
            "esc_cnt": esc_cnt, "y2": y2, "skip": skip}


def _mb_planar(plane, mb_h, mb_w, s):
    """[B, H, W] -> [B, mb_h, mb_w, (s/4)^2 * 16] u8, block-major pixel
    index (block raster b = br*(s/4)+bc, pixel p = r*4+c)."""
    B = plane.shape[0]
    nb = s // 4
    g = plane.reshape(B, mb_h, nb, 4, mb_w, nb, 4)
    g = g.transpose(0, 1, 4, 2, 5, 3, 6)          # [B, mbh, mbw, br, bc, r, c]
    return g.reshape(B, mb_h, mb_w, nb * nb * 16)


def _shift1_p(a):
    """Planar lane shift: a[..., l] <- a[..., l-1] (lane 0 zeros). Lanes
    fuse batch x mb_h; the value leaked across an image boundary lands on
    a y == 0 lane whose has_top is False, so every consumer masks it."""
    pad = [(0, 0)] * (a.ndim - 1) + [(1, 0)]
    return jnp.pad(a, pad)[..., :-1]


def _seg_rows_planar(seg_rows_k, B, mb_h):
    """[B, 4segs, 4param, 16] -> [4segs, 4param, 16, N] lane-broadcast."""
    N = B * mb_h
    r = seg_rows_k.transpose(1, 2, 3, 0)          # [4, 4, 16, B]
    r = jnp.broadcast_to(r[..., None], r.shape + (mb_h,))
    return r.reshape(4, 4, 16, N)


def _seg_select_p(rows4, seg):
    """rows4 [4, ...par..., N], seg [N] -> [...par..., N]."""
    return jnp.where(seg == 0, rows4[0],
                     jnp.where(seg == 1, rows4[1],
                               jnp.where(seg == 2, rows4[2], rows4[3])))


def phase2_planar(Y, U, V, modes, uvmodes, qp, mb_w, mb_h, rd_drop=0.0,
                  seg=None, i4=None, sk=1, trellis=False, i4_search=None,
                  wire_pack=None):
    """Batched planar re-layout of fastpath._phase2 (single band).

    Y/U/V: [B, H, W] (any int dtype); modes/uvmodes: [B, n_mb];
    qp: quant_params() dict ([16] rows) when seg is None;
    seg: (seg_map [B, n_mb] i32, seg_rows {y1/y2/uv: [B, 4, 4, 16]});
    i4: (is_i4 [B, n_mb] bool, i4_modes [B, n_mb, 16] u8) or None.
    trellis: Viterbi-requantize each I4 subblock in the closed loop
    (ops/trellis.py; host parity method >= 4 I4 trellis). Adds three
    nonzero-context masks to the scan carry so the trellis rates see
    the true neighbor contexts.
    i4_search: (rt, lam_i4, lam_i16[, lam_uv]) to re-run the 10-mode RD
    search per subblock inside the closed loop against true recon context
    (device method 6; host parity PickBestIntra4), including the
    closed-loop I16-vs-I4 split decision. Lambdas are python scalars (no
    segments) or [B, 4] per-segment arrays; requires sk == 2. The
    phase-1 i4 modes/split are then ignored. When a 4th element lam_uv
    is present, the 4-mode UV search also runs inside the closed loop
    with exact chained chroma rates against true recon context
    (vp8_enc_loop.cc's UV loop); phase-1 uvmodes are then ignored.

    Returns (lv24 [B, n_mb, 24, 16] i16, y2 [B, n_mb, 16] i16,
    bottom [B, n_mb, 16], right [B, n_mb, 16][, i4_modes
    [B, n_mb, 16] u8, is_i4 [B, n_mb] bool when i4_search][, uvmodes
    [B, n_mb] u8 when i4_search has lam_uv]).
    """
    B = Y.shape[0]
    n_mb = mb_w * mb_h
    N = B * mb_h
    n_steps = mb_w + sk * (mb_h - 1)
    if i4 is None:
        i4_search = None

    yy = jnp.asarray(np.tile(np.arange(mb_h), B), jnp.int32)   # [N]

    def skew(a):
        return _skew_b(a, mb_w, mb_h, n_steps, sk)

    xs = {
        "y": skew(_mb_planar(Y.astype(jnp.uint8), mb_h, mb_w, 16)),
        "u": skew(_mb_planar(U.astype(jnp.uint8), mb_h, mb_w, 8)),
        "v": skew(_mb_planar(V.astype(jnp.uint8), mb_h, mb_w, 8)),
        "m": skew(modes.reshape(B, mb_h, mb_w)),
        "uvm": skew(uvmodes.reshape(B, mb_h, mb_w)),
        "t": jnp.arange(n_steps, dtype=jnp.int32),
    }
    if seg is not None:
        seg_map, seg_rows = seg
        xs["seg"] = skew(seg_map.reshape(B, mb_h, mb_w).astype(jnp.int32))
        rows4 = {k: _seg_rows_planar(seg_rows[k].astype(jnp.int32), B, mb_h)
                 for k in ("y1", "y2", "uv")}
    else:
        qp_p = {k: tuple(jnp.asarray(a, jnp.int32).reshape(16, 1)
                         for a in qp[k]) for k in ("y1", "y2", "uv")}
    if i4 is not None:
        xs["i4"] = skew(i4[0].reshape(B, mb_h, mb_w))
        xs["i4m"] = skew(i4[1].reshape(B, mb_h, mb_w, 16))
    uv_search = i4_search is not None and len(i4_search) >= 4
    if i4_search is not None and seg is not None:
        # per-image [B, 4] segment lambdas -> lane-broadcast [4, N]
        def _lane_lam(lam_b):
            return jnp.broadcast_to(
                jnp.asarray(lam_b, jnp.float32).T[:, :, None],
                (4, B, mb_h)).reshape(4, N)

        lam4N = _lane_lam(i4_search[1])
        lam16N = _lane_lam(i4_search[2])
        if uv_search:
            lamuvN = _lane_lam(i4_search[3])
        lammdN = (_lane_lam(i4_search[4]) if len(i4_search) >= 5
                  else lam4N)

    def sel_mode(preds, mode):
        """preds [4, s, s, N]; mode [N] -> [s, s, N]."""
        m = mode.astype(jnp.int32)[None, None, :]
        return jnp.where(
            m == 0, preds[0],
            jnp.where(m == 1, preds[1],
                      jnp.where(m == 2, preds[2], preds[3])))

    use_tr = trellis and i4 is not None

    def step(carry, x):
        base, extra = carry[:18], carry[18:]
        (By1, By2, Ry, Cy1, Cy2, Cy3,
         Bu1, Bu2, Ru, Cu1, Cu2, Cu3,
         Bv1, Bv2, Rv, Cv1, Cv2, Cv3) = base
        ei = 0
        if use_tr:
            Nt1, Nt2, Nl = extra[:3]
            ei = 3
        if i4_search is not None:
            Dt1, Dt2, Dl = extra[ei:ei + 3]   # y2 DC nonzero-context chain
            Bm1, Bm2, Bml = extra[ei + 3:ei + 6]
            ei += 6
        if uv_search:
            # 2-bit chroma nonzero chains per plane (UVRate's tnz/lnz).
            Ut1, Ut2, Ul, Vt1, Vt2, Vl = extra[ei:ei + 6]
        xcol = x["t"] - sk * yy                                # [N]
        valid = (xcol >= 0) & (xcol < mb_w)
        has_left = valid & (xcol > 0)
        has_top = valid & (yy > 0)

        if seg is not None:
            st = x["seg"]
            qp_t = {k: tuple(_seg_select_p(rows4[k][:, i], st)
                             for i in range(4)) for k in ("y1", "y2", "uv")}
        else:
            qp_t = qp_p

        topY = _shift1_p(By2 if sk == 2 else By1)
        leftY, tlY = Ry, _shift1_p(Cy3 if sk == 2 else Cy2)
        predsY = preds4_p(16, topY, leftY, tlY, has_top, has_left)
        predY_b = plane_to_blocks_p(sel_mode(predsY, x["m"]), 16)
        src_y = x["y"].astype(jnp.int32).reshape(16, 4, 4, N)
        lv, y2lv, reconY = luma_pipe_p(src_y, predY_b, qp_t, rd_drop=rd_drop)
        rYp = blocks_to_plane_p(reconY, 16)
        if i4 is not None:
            if sk == 2:
                trs = _shift1_p(By1)[0:4]
                edge = jnp.broadcast_to(topY[15:16], (4, N))
                trs = jnp.where((xcol + 1 >= mb_w)[None, :], edge, trs)
            else:
                trs = jnp.broadcast_to(topY[15:16], (4, N))
            if i4_search is not None:
                lam_t = (_seg_select_p(lam4N, x["seg"])
                         if seg is not None else jnp.float32(i4_search[1]))
                tbm = jnp.where(has_top,
                                _shift1_p(Bm2 if sk == 2 else Bm1), 0)
                lbm = jnp.where(has_left, Bml, 0)
                s_kw = dict(search=True, lam=lam_t, rt=i4_search[0],
                            tbm=tbm, lbm=lbm)
            else:
                s_kw = {}
            if use_tr:
                from .trellis import tlam_i4 as _tlam_i4
                tnz = jnp.where(has_top,
                                _shift1_p(Nt2 if sk == 2 else Nt1), 0)
                lnz = jnp.where(has_left, Nl, 0)
                tlam = _tlam_i4(qp_t["y1"][0])      # [1] or [N]
                lv_i4, work, t4, l4, i4m_out, bm_out, rd4 = \
                    i4_reconstruct_p(
                        src_y, x["i4m"], topY, leftY, tlY, trs, has_top,
                        has_left, qp_t["y1"], trellis=True, tlam=tlam,
                        tnz=tnz, lnz=lnz, **s_kw)
            else:
                lv_i4, work, _, _, i4m_out, bm_out, rd4 = i4_reconstruct_p(
                    src_y, x["i4m"], topY, leftY, tlY, trs, has_top,
                    has_left, qp_t["y1"], rd_drop=rd_drop, **s_kw)
            if i4_search is not None:
                # Closed-loop I16-vs-I4 split (vp8_enc_loop.cc use_i4
                # comparison): both reconstructions are in hand, so score
                # them against true context instead of trusting phase 1.
                disto16 = ((reconY - src_y) ** 2).sum(axis=(0, 1, 2))
                # Exact I16 rate: AC chain across the 16 subblocks plus
                # the y2 DC block under its own carried dc-nz context
                # (vp8_enc_loop.cc's rate = ResidualCost(y2) + LumaRate).
                z1 = jnp.zeros((N,), jnp.int32)
                tnz16 = tnz if use_tr else z1
                lnz16 = lnz if use_tr else z1
                tdc = jnp.where(has_top,
                                _shift1_p(Dt2 if sk == 2 else Dt1), 0)
                ldc = jnp.where(has_left, Dl, 0)
                rate16 = (luma_rate16_p(lv, tnz16, lnz16)
                          + exact_rate_p(y2lv, 0, 1, tdc + ldc))
                m = x["m"].astype(jnp.int32)
                fc16 = jnp.where(m == 0, int(FC16[0]),
                                 jnp.where(m == 1, int(FC16[1]),
                                           jnp.where(m == 2, int(FC16[2]),
                                                     int(FC16[3]))))
                # Both totals rescored at lambda_mode for the split
                # (reference pickBestModeParallel / tryI4ModesRDParallel,
                # encode_parallel.go:565,808; the per-candidate searches
                # above keep lambda_i16 / lambda_i4).
                lammd_t = (_seg_select_p(lammdN, x["seg"])
                           if seg is not None
                           else jnp.float32(i4_search[4]
                                            if len(i4_search) >= 5
                                            else i4_search[1]))
                score16 = ((rate16 + fc16).astype(jnp.float32) * lammd_t
                           + 256.0 * disto16.astype(jnp.float32))
                score4 = ((rd4[0] + 211).astype(jnp.float32) * lammd_t
                          + 256.0 * rd4[1].astype(jnp.float32))
                ii_mb = score4 < score16
            else:
                ii_mb = x["i4"]
            sel = ii_mb[None, None, :]
            lv = jnp.where(sel, lv_i4, lv)
            y2lv = jnp.where(ii_mb[None, :], 0, y2lv)
            rYp = jnp.where(sel, work, rYp)
        else:
            ii_mb = jnp.zeros((N,), bool)

        topU = _shift1_p(Bu2 if sk == 2 else Bu1)
        leftU, tlU = Ru, _shift1_p(Cu3 if sk == 2 else Cu2)
        topV = _shift1_p(Bv2 if sk == 2 else Bv1)
        leftV, tlV = Rv, _shift1_p(Cv3 if sk == 2 else Cv2)
        predsU = preds4_p(8, topU, leftU, tlU, has_top, has_left)
        predsV = preds4_p(8, topV, leftV, tlV, has_top, has_left)
        src_u = x["u"].astype(jnp.int32).reshape(4, 4, 4, N)
        src_v = x["v"].astype(jnp.int32).reshape(4, 4, 4, N)
        if uv_search:
            # Closed-loop 4-mode UV search with exact chained rates
            # (vp8_enc_loop.cc's UV loop: rate = kFixedCostsUV[m] +
            # UVRate(U) + UVRate(V); score = rate*lam_uv + 256*SSE).
            lamuv_t = (_seg_select_p(lamuvN, x["seg"])
                       if seg is not None else jnp.float32(i4_search[3]))
            t2u = jnp.where(has_top, _shift1_p(Ut2 if sk == 2 else Ut1), 0)
            l2u = jnp.where(has_left, Ul, 0)
            t2v = jnp.where(has_top, _shift1_p(Vt2 if sk == 2 else Vt1), 0)
            l2v = jnp.where(has_left, Vl, 0)
            cand = []
            for m in range(4):
                lvu_m, recU_m = chroma_pipe_p(
                    src_u, plane_to_blocks_p(predsU[m], 8), qp_t)
                lvv_m, recV_m = chroma_pipe_p(
                    src_v, plane_to_blocks_p(predsV[m], 8), qp_t)
                ru, t2u_m, l2u_m = uv_rate4_p(lvu_m, t2u, l2u)
                rv, t2v_m, l2v_m = uv_rate4_p(lvv_m, t2v, l2v)
                disto = (((recU_m - src_u) ** 2).sum(axis=(0, 1, 2))
                         + ((recV_m - src_v) ** 2).sum(axis=(0, 1, 2)))
                score = ((ru + rv + int(FCUV[m])).astype(jnp.float32)
                         * lamuv_t + 256.0 * disto.astype(jnp.float32))
                cand.append((score, lvu_m, lvv_m, recU_m, recV_m,
                             t2u_m, l2u_m, t2v_m, l2v_m))
            best = cand[0]
            uvm_out = jnp.zeros((N,), jnp.uint8)
            for m in range(1, 4):
                # lane axis is last everywhere: [N] broadcasts vs [..., N]
                better = cand[m][0] < best[0]
                uvm_out = jnp.where(better, np.uint8(m), uvm_out)
                best = tuple(jnp.where(better, c, b)
                             for b, c in zip(best, cand[m]))
            (_, lvu, lvv, reconU, reconV,
             ut2_new, ul2_new, vt2_new, vl2_new) = best
        else:
            lvu, reconU = chroma_pipe_p(
                src_u, plane_to_blocks_p(sel_mode(predsU, x["uvm"]), 8), qp_t)
            lvv, reconV = chroma_pipe_p(
                src_v, plane_to_blocks_p(sel_mode(predsV, x["uvm"]), 8), qp_t)

        rU = blocks_to_plane_p(reconU, 8)
        rV = blocks_to_plane_p(reconV, 8)
        new = (rYp[15], By1, rYp[:, 15], rYp[15, 15], Cy1, Cy2,
               rU[7], Bu1, rU[:, 7], rU[7, 7], Cu1, Cu2,
               rV[7], Bv1, rV[:, 7], rV[7, 7], Cv1, Cv2)
        if use_tr:
            # Border-subblock nonzero masks for the neighbor ctx chain:
            # I16 blocks count AC only (first=1), I4 the trellis masks.
            nz16 = (lv[:, 1:] != 0).any(axis=1).astype(jnp.int32)  # [16, N]
            t4_16 = (nz16[12] | (nz16[13] << 1) | (nz16[14] << 2)
                     | (nz16[15] << 3))
            l4_16 = (nz16[3] | (nz16[7] << 1) | (nz16[11] << 2)
                     | (nz16[15] << 3))
            new = new + (jnp.where(ii_mb, t4, t4_16), Nt1,
                         jnp.where(ii_mb, l4, l4_16))
        if i4_search is not None:
            # y2 DC nonzero chain: I16 MBs record any(y2); I4 MBs keep
            # the stale value, like vp8_enc_loop.cc's top_dc/left_dc
            # which update only in the !is_i4 branch.
            y2nz = (y2lv != 0).any(axis=0).astype(jnp.int32)
            new = new + (jnp.where(ii_mb, tdc, y2nz), Dt1,
                         jnp.where(ii_mb, ldc, y2nz))
            # bmode context chain: I16 MBs propagate their mode value
            # (vp8_enc_loop.cc top_bmodes update for non-I4 MBs).
            m16 = jnp.broadcast_to(x["m"].astype(jnp.int32)[None, :], (4, N))
            new = new + (jnp.where(ii_mb, bm_out[0], m16), Bm1,
                         jnp.where(ii_mb, bm_out[1], m16))
        if uv_search:
            new = new + (ut2_new, Ut1, ul2_new, vt2_new, Vt1, vl2_new)
        lv24 = jnp.concatenate([lv, lvu, lvv], axis=0).astype(jnp.int16)
        ys = (lv24, y2lv.astype(jnp.int16), rYp[15], rYp[:, 15])
        if i4_search is not None:
            ys = ys + (i4m_out, ii_mb)
        if uv_search:
            ys = ys + (uvm_out,)
        return new, ys

    zero16 = jnp.zeros((16, N), jnp.int32)
    zero8 = jnp.zeros((8, N), jnp.int32)
    zero1 = jnp.zeros((N,), jnp.int32)
    carry0 = (zero16, zero16, zero16, zero1, zero1, zero1,
              zero8, zero8, zero8, zero1, zero1, zero1,
              zero8, zero8, zero8, zero1, zero1, zero1)
    if use_tr:
        carry0 = carry0 + (zero1, zero1, zero1)
    if i4_search is not None:
        zero4 = jnp.zeros((4, N), jnp.int32)
        carry0 = carry0 + (zero1, zero1, zero1) + (zero4, zero4, zero4)
    if uv_search:
        carry0 = carry0 + (zero1,) * 6
    # (scan unroll=2 measured: -2% throughput and 6x the compile time —
    # the per-step bookkeeping does not amortize; keep unroll=1.)
    _, outs = jax.lax.scan(step, carry0, xs)

    def unskew(c_sk):
        return _unskew_b(c_sk, B, mb_w, mb_h, n_steps, sk)

    if wire_pack is not None:
        # Wire-format tail: pack in the scan's planar layout, never
        # materialize the unskewed [B, n_mb, 24, 16] i16 tensor.
        wire = pack_wire_planar(outs[0], outs[1], B, mb_w, mb_h,
                                n_steps, sk, wire_pack)
        head = (wire, unskew(outs[2]), unskew(outs[3]))
        if uv_search:
            return head + (unskew(outs[4]), unskew(outs[5]),
                           unskew(outs[6]))
        if i4_search is not None:
            return head + (unskew(outs[4]), unskew(outs[5]))
        return head

    lv24 = unskew(outs[0])                     # [B, n_mb, 24, 16]
    y2 = unskew(outs[1])
    bottom = unskew(outs[2])
    right = unskew(outs[3])
    if uv_search:
        return (lv24, y2, bottom, right, unskew(outs[4]), unskew(outs[5]),
                unskew(outs[6]))
    if i4_search is not None:
        return lv24, y2, bottom, right, unskew(outs[4]), unskew(outs[5])
    return lv24, y2, bottom, right
