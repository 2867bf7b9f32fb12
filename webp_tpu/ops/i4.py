"""Device I4 (4x4 intra) mode search + reconstruction for the fast path.

The 10 B-mode predictors (RFC 6386 ¶12.3; formulas identical to
webp_tpu/lossy/dsp.py pred_luma4 and the reference predict_lossy.go) are
built as diagonal-strip slices over batched context vectors — every mode
is a handful of avg2/avg3 expressions on [L]-lane tensors, no scatters.

Phase 1 scores all 10 modes for every 4x4 subblock at once against
source-pixel context (the same open-loop approximation as the I16
search); the mode-signalling cost uses the context-averaged
FIXED_COSTS_I4 marginals. Phase 2 reconstructs chosen-I4 macroblocks
fully closed-loop with a 16-substep subblock walk inside the wavefront
step; the scan runs at skew 2 there, so the above-right strip of
rightmost subblocks is the exact reconstruction of the macroblock
above-right (computed one step earlier).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.cost import FIXED_COSTS_I4
from . import dct
from .quant import quantize

ZIGZAG = np.asarray(T.ZIGZAG)
# Static per-mode signalling cost for the open-loop selection. The real
# coder's cost is conditioned on the neighbor B-modes (FIXED_COSTS_I4
# [top][left][mode]); the DC,DC row is the dominant context by far and —
# unlike the all-context mean — prices non-DC modes at their typical
# (expensive) cost, matching the reference's DC-heavy mode statistics.
# The split decision corrects to true in-MB contexts via
# ctx_mode_rate_delta below.
I4_MODE_COST = np.asarray(FIXED_COSTS_I4)[0, 0].astype(np.int32)
I4_OVERHEAD = 211  # i4 signalling overhead (libwebp constant)

# Modes whose prediction reads the above-right strip (VE via its smoothing
# tap, LD, VL). The device path forbids them on the MB's rightmost subblock
# column (c == 3, where the strip comes from the above-right MACROBLOCK):
# with no above-right dependency the wavefront runs at skew 1 instead of 2
# — ~30% fewer scan steps — at a sub-0.1% size cost. The decoder computes
# those predictors with the real strip but never selects them, so the
# bitstream stays exactly closed-loop.
TR_MODES = (2, 6, 7)


def ctx_mode_rate_delta(i4_modes, mb_w, mb_h):
    """Contextual I4 mode-signalling correction per MB.

    The per-subblock searches price each mode with the context-averaged
    FIXED_COSTS_I4 marginal; the real coder's cost is conditioned on the
    top/left neighbor B-modes (reference tryI4ModesRDParallel,
    encode_parallel.go:801: VP8FixedCostsI4[topMode][leftMode][mode]).
    This recomputes the signalling rate of the CHOSEN mode pattern with
    in-MB contexts exact and cross-MB context approximated as DC(0) —
    the cross-MB approximation keeps the computation independent per MB,
    so band-sharded (multi-chip) and batched paths agree bit-for-bit.

    i4_modes: [..., n_mb, 16] int. Returns delta rate [..., n_mb] f32
    (contextual minus flat), to be added to the i4 side of the split
    decision as lambda_mode * delta.
    """
    lead = i4_modes.shape[:-2]
    n_mb = i4_modes.shape[-2]
    g = i4_modes.reshape(lead + (n_mb, 4, 4)).astype(jnp.int32)
    zero = jnp.zeros(lead + (n_mb, 1, 4), jnp.int32)
    t_ctx = jnp.concatenate([zero, g[..., :3, :]], axis=-2)
    zero_c = jnp.zeros(lead + (n_mb, 4, 1), jnp.int32)
    l_ctx = jnp.concatenate([zero_c, g[..., :, :3]], axis=-1)
    fc = jnp.asarray(np.asarray(FIXED_COSTS_I4, np.float32)
                     .reshape(10, 100))                       # [t, l*10+m]
    oh_lm = jax.nn.one_hot(l_ctx * 10 + g, 100, dtype=jnp.float32)
    m1 = jnp.einsum("...k,tk->...t", oh_lm, fc)               # [..., 10]
    oh_t = jax.nn.one_hot(t_ctx, 10, dtype=jnp.float32)
    cost = (m1 * oh_t).sum(axis=-1)                           # [..., 4, 4]
    flat = jnp.einsum(
        "...m,m->...", jax.nn.one_hot(g, 10, dtype=jnp.float32),
        jnp.asarray(I4_MODE_COST, jnp.float32))
    return (cost - flat).sum(axis=(-2, -1))


def _a2(a, b):
    return (a + b + 1) >> 1


def _a3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _rows(*rows):
    """Stack 4 [..., 4] rows into [..., 4, 4]."""
    return jnp.stack(rows, axis=-2)


def _cols(c):
    """[..., 4] -> broadcast down columns [..., 4, 4]."""
    return jnp.broadcast_to(c[..., :, None], c.shape + (4,))


def pred4_all(t, l, tl, tr):
    """All 10 B-mode predictions.

    t: [..., 4] top row; l: [..., 4] left col; tl: [...]; tr: [..., 4]
    above-right. Returns list of 10 [..., 4, 4] int32 arrays in mode order
    DC, TM, VE, HE, RD, VR, LD, VL, HD, HU.

    Built from three filtered strips over the 13-pixel context contour
    ctx = [l3 l2 l1 l0 tl t0..t7] (one avg op per strip, then slices),
    keeping the op count low enough to live inside the wavefront scan.
    """
    ctx = jnp.concatenate(
        [l[..., ::-1], tl[..., None], t, tr], axis=-1)     # [..., 13]
    s3 = _a3(ctx[..., :-2], ctx[..., 1:-1], ctx[..., 2:])  # [..., 11]
    s2 = _a2(ctx[..., :-1], ctx[..., 1:])                  # [..., 12]
    # Reversed-left contour [tl l0 l1 l2 l3 l3] for the horizontal modes.
    lr = jnp.concatenate([ctx[..., 4:5], l, l[..., 3:4]], axis=-1)
    s3h = _a3(lr[..., :-2], lr[..., 1:-1], lr[..., 2:])    # [..., 4]
    s2h = _a2(lr[..., :-1], lr[..., 1:])                   # [..., 5]
    l3 = l[..., 3]

    dc = (t.sum(axis=-1) + l.sum(axis=-1) + 4) >> 3
    p_dc = jnp.broadcast_to(dc[..., None, None], dc.shape + (4, 4))
    p_tm = jnp.clip(l[..., :, None] + t[..., None, :] - tl[..., None, None],
                    0, 255)
    p_ve = jnp.broadcast_to(s3[..., None, 4:8],
                            s3.shape[:-1] + (4, 4))
    p_he = _cols(s3h)
    # RD: o[r, c] = e[3 - r + c], e = s3 strips centered l2..t2.
    p_rd = _rows(s3[..., 3:7], s3[..., 2:6], s3[..., 1:5], s3[..., 0:4])
    c2 = s2[..., 4:8]
    d3 = s3[..., 3:7]
    p_vr = _rows(c2, d3,
                 jnp.concatenate([s3[..., 2:3], c2[..., 0:3]], axis=-1),
                 jnp.concatenate([s3[..., 1:2], d3[..., 0:3]], axis=-1))
    # LD: f = s3 centered t1..t6 plus the a3(t6,t7,t7) tail.
    f = jnp.concatenate([s3[..., 5:11],
                         _a3(tr[..., 2], tr[..., 3], tr[..., 3])[..., None]],
                        axis=-1)
    p_ld = _rows(f[..., 0:4], f[..., 1:5], f[..., 2:6], f[..., 3:7])
    g2 = s2[..., 5:9]
    g3 = s3[..., 5:9]
    p_vl = _rows(g2, g3,
                 jnp.concatenate([g2[..., 1:4], s3[..., 9:10]], axis=-1),
                 jnp.concatenate([g3[..., 1:4], s3[..., 10:11]], axis=-1))
    hd0 = jnp.concatenate([s2h[..., 0:1], s3[..., 3:6]], axis=-1)
    hd1 = jnp.concatenate([s2h[..., 1:2], s3h[..., 0:1], hd0[..., 0:2]],
                          axis=-1)
    hd2 = jnp.concatenate([s2h[..., 2:3], s3h[..., 1:2], hd1[..., 0:2]],
                          axis=-1)
    hd3 = jnp.concatenate([s2h[..., 3:4], s3h[..., 2:3], hd2[..., 0:2]],
                          axis=-1)
    p_hd = _rows(hd0, hd1, hd2, hd3)
    l3b = jnp.broadcast_to(l3[..., None], l3.shape + (4,))
    hu0 = jnp.stack([s2h[..., 1], s3h[..., 1], s2h[..., 2], s3h[..., 2]],
                    axis=-1)
    hu1 = jnp.concatenate([hu0[..., 2:4], s2h[..., 3:4], s3h[..., 3:4]],
                          axis=-1)
    hu2 = jnp.concatenate([hu1[..., 2:4], l3b[..., 0:2]], axis=-1)
    p_hu = _rows(hu0, hu1, hu2, l3b)

    return [p_dc, p_tm, p_ve, p_he, p_rd, p_vr, p_ld, p_vl, p_hd, p_hu]


def _sb_contexts(Y, mb_w, mb_h):
    """Source-pixel contexts for every 4x4 subblock.

    Returns (top [n_sb, 4], left [n_sb, 4], tl [n_sb], tr [n_sb, 4]) in
    MB-major subblock raster order (n_sb = n_mb * 16, sb index = r*4+c),
    with the reference halo rules: missing top row = 127, missing left
    col = 129, missing corner follows the top rule, rightmost-column
    subblocks take the MB-level above-right strip (replicated at the
    image edge).
    """
    H, W = Y.shape
    n_mb = mb_w * mb_h
    pad = jnp.full((H + 1, W + 1), 129, jnp.int32)
    pad = pad.at[0, :].set(127)
    pad = pad.at[1:, 1:].set(Y)
    # top rows at pixel rows r*4-1 -> pad rows r*4 sampled every 4.
    tops = pad[0:H:4, 1:]                                  # [SBH, W]
    top = tops.reshape(H // 4, mb_w * 4, 4)                # [SBH, SBX, 4]
    lefts = pad[1:, 0:W:4]                                 # [H, SBX]
    left = lefts.reshape(mb_h * 4, 4, W // 4).transpose(0, 2, 1)  # [SBY,SBX,4]
    tl = pad[0:H:4, 0:W:4]                                 # [SBY, SBX]

    # Inner above-right: the next subblock's top strip; for c == 3 the
    # MB-level strip (row above the MB, cols +16..+20), edge-replicated.
    tr_next = jnp.concatenate([top[:, 1:], top[:, -1:]], axis=1)
    mb_tops = pad[0:H:16, 1:]                              # [mbH, W]
    edge = jnp.broadcast_to(mb_tops[:, -1:, None], (mb_h, 1, 4))
    # Strip above-right of MB x starts at pixel col x*16 + 16.
    inner = mb_tops[:, 16:].reshape(mb_h, -1, 4)[:, 0::4]
    mbtr = jnp.concatenate([inner, edge], axis=1)          # [mbH, mbW, 4]

    def to_mb_order(a):
        # [SBY, SBX, ...] -> [n_mb, 16, ...] with sb = r*4+c.
        x = a.reshape(mb_h, 4, mb_w, 4, *a.shape[2:])
        x = jnp.moveaxis(x, 2, 1)                          # [mbH, mbW, 4r, 4c]
        return x.reshape(n_mb, 16, *a.shape[2:])

    top_mb = to_mb_order(top)
    left_mb = to_mb_order(left)
    tl_mb = to_mb_order(tl[..., None])[..., 0]
    tr_mb = to_mb_order(tr_next)
    # Override c == 3 subblocks with the MB strip.
    mbtr_rep = jnp.broadcast_to(mbtr.reshape(n_mb, 1, 4), (n_mb, 16, 4))
    is_c3 = (jnp.arange(16) % 4 == 3)[None, :, None]
    tr_mb = jnp.where(is_c3, mbtr_rep, tr_mb)
    return top_mb, left_mb, tl_mb, tr_mb


def i4_search(Y, src_b, qp_y1, lam_i4, rt, mb_w, mb_h, i16_score,
              approx_block_rate, tlsd=None, allow_tr=False, lam_mode=None):
    """Open-loop I4 search. Returns (is_i4 [n_mb] bool, modes [n_mb,16] u8,
    i4_score [n_mb] f32).

    allow_tr: permit the above-right-reading modes (TR_MODES) on the
    rightmost subblock column — valid only when the closed-loop scan runs
    at skew 2 and supplies the real above-right MB strip (method >= 5).

    Per-subblock mode selection runs at lam_i4; the returned i4_score —
    and the is_i4 comparison against the (lam_mode-scored) i16_score —
    are the chosen modes' totals rescored at lam_mode, mirroring the
    reference's final split decision (encode_parallel.go:808:
    RDScore(totalDisto, totalRate+211, seg.LambdaMode)).

    src_b: [n_mb, 16, 4, 4] source luma blocks; qp_y1: quant tuple
    (broadcastable per MB); lam_i4/lam_mode: scalar or [n_mb] float32.
    """
    if lam_mode is None:
        lam_mode = lam_i4
    n_mb = mb_w * mb_h
    top, left, tl, tr = _sb_contexts(Y, mb_w, mb_h)
    preds = pred4_all(top, left, tl, tr)                   # 10 x [n,16,4,4]
    best_score = jnp.full((n_mb, 16), jnp.inf, jnp.float32)
    best_rate = jnp.zeros((n_mb, 16), jnp.float32)
    best_D = jnp.zeros((n_mb, 16), jnp.float32)
    best_mode = jnp.zeros((n_mb, 16), jnp.uint8)
    is_c3 = jnp.asarray((np.arange(16) % 4) == 3)[None, :]
    if tlsd is not None:
        from . import metrics as M

        wt = jnp.asarray(M.WEIGHT_Y)
        sb44 = src_b.reshape(n_mb, 16, 4, 4)
        ha_src = jnp.sum(wt * jnp.abs(M._hadamard4(sb44)), axis=(-2, -1))
    for m, pred in enumerate(preds):
        co = dct.fdct4x4(src_b, pred)
        flat = co.reshape(n_mb, 16, 16)
        lv, dq = quantize(flat, *qp_y1, ZIGZAG)
        disto_td = ((flat - dq) ** 2).sum(axis=-1)
        rate = approx_block_rate(lv, 0, 3, rt) + int(I4_MODE_COST[m])
        D = 64.0 * disto_td.astype(jnp.float32)
        if tlsd is not None:
            # Perceptual SD term (reference PickBestI4ModeRD,
            # encode_analysis.go:1243).
            rec = jnp.clip(pred.reshape(n_mb, 16, 4, 4)
                           + dct.idct4x4(dq.reshape(n_mb, 16, 4, 4)),
                           0, 255)
            ha_rec = jnp.sum(wt * jnp.abs(M._hadamard4(rec)),
                             axis=(-2, -1))
            td = jnp.abs(ha_rec - ha_src) >> 5
            D = D + tlsd_col(tlsd) * td.astype(jnp.float32)
        score = rate.astype(jnp.float32) * lam_i4_col(lam_i4) + D
        if m in TR_MODES and not allow_tr:
            # Forbid above-right-reading modes on the rightmost subblock
            # column so the skew-1 wavefront needs no above-right MB.
            score = jnp.where(is_c3, jnp.inf, score)
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_rate = jnp.where(better, rate.astype(jnp.float32), best_rate)
        best_D = jnp.where(better, D, best_D)
        best_mode = jnp.where(better, np.uint8(m), best_mode)
    # Same float association as the Pallas kernel path (per-subblock
    # rescore, then sum): keeps jnp and kernel scores bit-identical.
    score_md = best_rate * lam_i4_col(lam_mode) + best_D
    i4_score = (score_md.sum(axis=1)
                + I4_OVERHEAD * lam_i4_flat(lam_mode))
    i4_score = i4_score + (ctx_mode_rate_delta(best_mode, mb_w, mb_h)
                           * lam_i4_flat(lam_mode))
    return i4_score < i16_score, best_mode, i4_score


def lam_i4_col(lam):
    return lam[:, None] if hasattr(lam, "ndim") and lam.ndim == 1 else lam


def tlsd_col(t):
    return t[:, None] if hasattr(t, "ndim") and t.ndim == 1 else t


def lam_i4_flat(lam):
    return lam if hasattr(lam, "ndim") and lam.ndim == 1 else lam


def i4_reconstruct(src_b, modes, topY, leftY, tlY, trs, has_top, has_left,
                   qp_y1, rd_drop: float = 0.0):
    """Fully closed-loop I4 reconstruction for one wavefront step.

    16 serial substeps over the MB's subblocks; every context pixel is
    exact reconstruction (the skew-2 scan supplies the above-right MB's
    bottom row). The strip-built predictors keep the per-substep op count
    small enough to live inside the scan.

    src_b: [L, 16, 4, 4] int32 (raster subblocks); modes: [L, 16];
    topY/leftY: [L, 16] border rows; tlY: [L]; trs: [L, 4] above-right
    strip; has_top/has_left: [L] bool.
    Returns (lv [L, 16, 16] zigzag, recon [L, 16, 16] plane).
    """
    L = src_b.shape[0]
    top_row = jnp.where(has_top[:, None], topY, 127)       # [L, 16]
    left_col = jnp.where(has_left[:, None], leftY, 129)
    tl0 = jnp.where(has_top & has_left, tlY,
                    jnp.where(has_top, 129, 127))
    tr_strip = jnp.where(has_top[:, None], trs, 127)
    q = tuple(a[:, 0] if (hasattr(a, "ndim") and a.ndim == 3) else a
              for a in qp_y1)

    # Anti-diagonal subblock schedule: (r, c) at substep s = c + 2r (deps
    # (r-1,c) at s-2, (r,c-1) and (r-1,c+1) at s-1) — 10 sequential
    # substeps instead of 16, pairs stacked into the lane axis. The c == 3
    # above-right strip is the MB-level strip (TR modes there are
    # forbidden by i4_search, so the scan itself needs no above-right MB).
    groups = [[(0, 0)], [(0, 1)], [(0, 2), (1, 0)], [(0, 3), (1, 1)],
              [(1, 2), (2, 0)], [(1, 3), (2, 1)], [(2, 2), (3, 0)],
              [(2, 3), (3, 1)], [(3, 2)], [(3, 3)]]

    def ctx_of(work, r, c):
        t = top_row[:, c * 4:c * 4 + 4] if r == 0 \
            else work[:, r * 4 - 1, c * 4:c * 4 + 4]
        l = left_col[:, r * 4:r * 4 + 4] if c == 0 \
            else work[:, r * 4:r * 4 + 4, c * 4 - 1]
        if r == 0 and c == 0:
            tl = tl0
        elif r == 0:
            tl = top_row[:, c * 4 - 1]
        elif c == 0:
            tl = left_col[:, r * 4 - 1]
        else:
            tl = work[:, r * 4 - 1, c * 4 - 1]
        if c == 3:
            tr = tr_strip
        elif r == 0:
            tr = top_row[:, c * 4 + 4:c * 4 + 8]
        else:
            tr = work[:, r * 4 - 1, c * 4 + 4:c * 4 + 8]
        return t, l, tl, tr

    def stackq(a, g):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == L:
            return jnp.concatenate([a] * g, axis=0)
        return a

    work = jnp.zeros((L, 16, 16), jnp.int32)
    lv_by_n = [None] * 16
    for group in groups:
        g = len(group)
        ctxs = [ctx_of(work, r, c) for (r, c) in group]
        t = jnp.concatenate([cx[0] for cx in ctxs], axis=0)
        l = jnp.concatenate([cx[1] for cx in ctxs], axis=0)
        tl = jnp.concatenate([cx[2] for cx in ctxs], axis=0)
        tr = jnp.concatenate([cx[3] for cx in ctxs], axis=0)
        preds = pred4_all(t, l, tl, tr)                    # 10 x [gL, 4, 4]
        mode = jnp.concatenate(
            [modes[:, r * 4 + c] for (r, c) in group],
            axis=0).astype(jnp.int32)[:, None, None]
        pred = preds[0]
        for m in range(1, 10):
            pred = jnp.where(mode == m, preds[m], pred)
        src = jnp.concatenate([src_b[:, r * 4 + c] for (r, c) in group],
                              axis=0)
        co = dct.fdct4x4(src, pred).reshape(g * L, 16)
        # TLambdaI4 = 3.5x TLambdaI16 (lossy/encode.py:411).
        qg = tuple(stackq(a, g) for a in q)
        lv, dq = quantize(co, *qg, ZIGZAG, rd_drop=rd_drop * 3.5)
        rec = jnp.clip(pred + dct.idct4x4(dq.reshape(g * L, 4, 4)), 0, 255)
        for i, (r, c) in enumerate(group):
            lv_by_n[r * 4 + c] = lv[i * L:(i + 1) * L]
            work = jax.lax.dynamic_update_slice(
                work, rec[i * L:(i + 1) * L], (0, r * 4, c * 4))
    return jnp.stack(lv_by_n, axis=1), work


def _planar_inputs(Y, seg_map, mb_w, mb_h):
    """Builds the Pallas kernel's planar [16, n_sb] src/ctx arrays in
    subblock GRID order (sb = sy * SBX + sx).

    After the one src16 relayout, every context row is a LANE SHIFT of a
    major-axis slice of src16 itself (left neighbor = sb-1, above =
    sb-SBX, above-left = sb-SBX-1, above-right = sb-SBX+1), with 127/129
    edge fills by static iota masks — the previous subblock-space
    formulation's strided slices of the pixel grid were among the
    costliest layout ops of the whole encoder (XLA cost model)."""
    SBY, SBX = mb_h * 4, mb_w * 4
    n_sb = SBY * SBX
    g = Y.astype(jnp.uint8).reshape(SBY, 4, SBX, 4)  # [sy, r, sx, c]
    src16 = g.transpose(1, 3, 0, 2).reshape(16, n_sb)

    s4 = src16.reshape(4, 4, n_sb)
    bot = s4[3]                                     # [4c, n_sb] pixel row 3
    rgt = s4[:, 3]                                  # [4r, n_sb] pixel col 3
    br = src16[15]                                  # [n_sb]

    sb = np.arange(n_sb)
    sx = jnp.asarray((sb % SBX).astype(np.int32))
    top_row0 = jnp.asarray(sb < SBX)                # sy == 0
    left_col0 = sx == 0
    last_col = sx == SBX - 1
    c127 = jnp.uint8(127)
    c129 = jnp.uint8(129)

    def sh(a, k):
        """Lane shift right by k: out[..., l] = a[..., l - k]."""
        pad = [(0, 0)] * (a.ndim - 1) + [(k, 0)]
        return jnp.pad(a, pad)[..., :n_sb]

    lrows = [jnp.where(left_col0, c129, sh(rgt[i], 1)) for i in (3, 2, 1, 0)]
    tl_f = jnp.where(top_row0, c127,
                     jnp.where(left_col0, c129, sh(br, SBX + 1)))
    trows = [jnp.where(top_row0, c127, sh(bot[j], SBX)) for j in range(4)]
    # Above-right. Non-c3 subblocks: the right neighbor's top (one up,
    # one right). c3 subblocks: the next MB's strip from the row above
    # the whole MB ROW (the true above-right is unreconstructed), whose
    # lane shift depends on the subblock row within the MB; at the last
    # MB column it degenerates to the row-above's rightmost pixel.
    sy4 = jnp.asarray(((sb // SBX) % 4).astype(np.int32))
    mbrow0 = jnp.asarray(sb < 4 * SBX)
    c3_mask = (sb % 4) == 3

    def sel_by_sy4(mk):
        v = mk(0)
        for k in range(1, 4):
            v = jnp.where(sy4 == k, mk(k), v)
        return v

    trrows = []
    for j in range(4):
        interior = sh(bot[j], SBX - 1)
        mb_int = sel_by_sy4(lambda k, j=j: sh(bot[j], (k + 1) * SBX - 1))
        mb_edge = sel_by_sy4(lambda k: sh(bot[3], (k + 1) * SBX))
        c3row = jnp.where(mbrow0, c127,
                          jnp.where(last_col, mb_edge, mb_int))
        trrows.append(jnp.where(jnp.asarray(c3_mask), c3row,
                                jnp.where(top_row0, c127, interior)))

    is_c3 = jnp.asarray(c3_mask.astype(np.uint8))
    seg_grid = jnp.broadcast_to(
        seg_map.reshape(mb_h, 1, mb_w, 1).astype(jnp.uint8),
        (mb_h, 4, mb_w, 4)).reshape(n_sb)
    rows = (lrows + [tl_f] + trows + trrows
            + [is_c3, seg_grid, jnp.zeros((n_sb,), jnp.uint8)])
    ctx = jnp.stack([r.astype(jnp.uint8) for r in rows], axis=0)
    return src16, ctx


def i4_search_pallas(Y, src_b, seg_map, qtab16, lam4, rt, mb_w, mb_h,
                     i16_score, interpret=False, tlsd4=None,
                     lam_mode4=None):
    """Pallas-backed i4_search (ops/pallas_i4.py): same contexts, same
    quantizer/rate math, the whole 10-mode scoring fused in VMEM.

    seg_map: [n_mb] i32; qtab16: [16, 16] i32 ((seg*4+param) x zigzag);
    lam4: [4] f32 per-segment I4 lambdas; lam_mode4: [4] f32 per-segment
    split-decision lambdas (the kernel selects at lam4 and emits each
    chosen subblock's lam_mode-rescored contribution — see i4_search).
    Returns the i4_search triple. (src_b is accepted for API parity but
    the kernel rebuilds the source in its planar grid layout.)
    """
    from . import pallas_i4 as P

    if lam_mode4 is None:
        lam_mode4 = lam4
    n_mb = mb_w * mb_h
    n_sb = n_mb * 16
    src16, ctx = _planar_inputs(Y.astype(jnp.int32), seg_map, mb_w, mb_h)
    mode_g, score_g = P.i4_scores_planar(
        src16, ctx, qtab16, lam4,
        rt.lvlp[3], rt.tailp[3], rt.eob1p[3], rt.eob2p[3],
        rt.emptyp[3][0], I4_MODE_COST, TR_MODES,
        interpret=interpret, tlsd4=tlsd4, lam_mode4=lam_mode4)
    # Grid order -> mb order (small outputs).
    SBX = mb_w * 4

    def to_mb(a):
        return (a.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)
                .reshape(n_mb, 16))

    best_mode = to_mb(mode_g.reshape(mb_h * 4, SBX)).astype(jnp.uint8)
    score = to_mb(score_g.reshape(mb_h * 4, SBX))
    lam_mb = lam_mode4[0] * jnp.ones((n_mb,), jnp.float32)
    for s in range(1, 4):
        lam_mb = jnp.where(seg_map == s, lam_mode4[s], lam_mb)
    i4_score = score.sum(axis=1) + I4_OVERHEAD * lam_mb
    i4_score = i4_score + ctx_mode_rate_delta(best_mode, mb_w, mb_h) * lam_mb
    return i4_score < i16_score, best_mode, i4_score
