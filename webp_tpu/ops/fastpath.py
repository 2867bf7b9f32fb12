"""Fast two-phase device VP8 encoder (the production TPU path).

The exact wavefront kernel (ops/wavefront.py) reproduces the host encoder
bit-for-bit but pays for it: every one of the ~mbW+2*mbH diagonal steps
re-runs the full 4-mode RD search, so almost all FLOPs sit on the serial
critical path. This module splits the work the TPU-native way:

  Phase 1 — mode search, fully parallel. RD-scores all 4 I16 modes and all
    4 UV modes for every macroblock at once, using *source* pixels as the
    prediction context (the decoder never sees the encoder's search
    context, so this only perturbs near-tie mode choices; the reference
    encoder itself approximates mode search below method 4,
    encode_analysis.go:1075). One huge batched tensor program: predictions,
    FDCT/WHT, quantization, reconstruction, distortion and a fused
    elementwise rate model all map straight onto the VPU/MXU.

  Phase 2 — closed-loop reconstruction, light wavefront. With modes fixed,
    a lax.scan over skewed anti-diagonals computes exact levels and
    reconstructed context: skew 1 (t = x + y) for I16-only, skew 2
    (t = x + 2y, the reference's rowSync.waitFor(y-1, x+2)) when I4 needs
    the above-right macroblock. Sources and modes are pre-skewed into
    [n_steps, mbH, ...] arrays outside the scan, so every step is pure
    static slices + shifted carries: no gathers, no scatters.

  Phase 0 (segments) and the I4 subblock search run fully parallel like
  phase 1. The emitted bitstream is fully closed-loop: levels are
  quantized against predictions built from true reconstructed neighbors,
  exactly what the decoder reconstructs. Only the *choice* of mode used
  source-pixel context.

Output packing: levels are nibble-packed on device (4 bits/coefficient,
block-granular escape list for |level| > 7, y2 as int16) because the host
link, not the chip, is the scarce resource.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.cost import (
    ENTROPY_COST,
    LEVEL_FIXED_COSTS,
    compute_level_cost_tables,
)
from ..lossy.encode import FIXED_COSTS_I16, FIXED_COSTS_UV, quality_to_qindex
from . import dct
from .quant import quantize

ZIGZAG = np.asarray(T.ZIGZAG)
BANDS = np.asarray(T.BANDS[:16])

# Escape capacity per image, in BLOCKS: a block holding any |level| > 7
# travels as raw int16[16] on the side (the nibble plane cannot carry it).
# At practical qualities ~5% of blocks escape (the y2 block, where large
# levels are common, always travels int16); overflow falls back to the
# exact host path. Block-granular escapes keep the device-side compaction
# cheap: the nonzero/cumsum runs over n_mb*24 block flags, not n_mb*384
# coefficients.
ESC_BLOCKS_PER_MB = 2


@functools.lru_cache(maxsize=4)
def all_q_tables():
    """Quantizer matrices + RD lambdas for every quant index 0..127
    (device constants; per-segment rows are selected with one-hot matmuls).

    Mirrors VP8Encoder.__init__'s per-segment setup (reference
    setupSegment, lossy/encode.go:1084) with zero UV deltas.
    """
    from ..lossy.quant import SegmentQuant

    dc_t, ac_t, ac2_t = T.DC_TABLE, T.AC_TABLE, T.AC_TABLE2
    clip = lambda v, m: max(0, min(m, v))
    out = {k: [] for k in ("y1", "y2", "uv")}
    lam_i16 = np.zeros(128, np.int64)
    lam_uv = np.zeros(128, np.int64)
    lam_i4 = np.zeros(128, np.int64)
    qi4 = np.zeros(128, np.int32)
    for q in range(128):
        y1dc, y1ac = int(dc_t[q]), int(ac_t[q])
        y2dc = max(8, y1dc * 2)
        sqs = {
            "y1": SegmentQuant.make(y1dc, y1ac, 0, sharpen=True),
            "y2": SegmentQuant.make(y2dc, int(ac2_t[q]), 1),
            "uv": SegmentQuant.make(int(dc_t[clip(q, 117)]), y1ac, 2),
        }
        for k, sq in sqs.items():
            out[k].append(np.stack([sq.q, sq.iq, sq.bias, sq.sharpen]))
        q_i16 = (y2dc + 15 * int(ac2_t[q]) + 8) >> 4
        q_uv = (int(dc_t[clip(q, 117)]) + 15 * y1ac + 8) >> 4
        lam_i16[q] = max(3 * q_i16 * q_i16, 1)
        lam_uv[q] = max((3 * q_uv * q_uv) >> 6, 1)
        q_i4 = (y1dc + 15 * y1ac + 8) >> 4
        lam_i4[q] = max((3 * q_i4 * q_i4) >> 7, 1)
        qi4[q] = q_i4
    tabs = {k: np.stack(v).astype(np.int32) for k, v in out.items()}
    # tabs[k]: [128, 4(q/iq/bias/sharpen), 16]
    return (tabs, lam_i16.astype(np.float32), lam_uv.astype(np.float32),
            lam_i4.astype(np.float32), qi4)


def _lam_mode_table(qi4):
    """LambdaMode per quant index: max((q_i4^2)>>7, 1) — the I4-vs-I16
    split lambda (reference setupSegment, encode.go:1122)."""
    return np.maximum((qi4.astype(np.int64) ** 2) >> 7, 1) \
        .astype(np.float32)


def rd_params(quality: int):
    """Quantizers + RD lambdas, identical to VP8Encoder.__init__."""
    from .pipeline import quant_params

    qp = quant_params(quality)
    q = quality_to_qindex(quality)
    dc_t, ac_t, ac2_t = T.DC_TABLE, T.AC_TABLE, T.AC_TABLE2
    clip = lambda v, m: max(0, min(m, v))
    y1dc, y1ac = int(dc_t[q]), int(ac_t[q])
    y2dc = max(8, y1dc * 2)
    q_i4 = (y1dc + 15 * y1ac + 8) >> 4
    q_i16 = (y2dc + 15 * int(ac2_t[q]) + 8) >> 4
    q_uv = (int(dc_t[clip(q, 117)]) + 15 * int(ac_t[q]) + 8) >> 4
    lambdas = {
        "i16": max(3 * q_i16 * q_i16, 1),
        "uv": max((3 * q_uv * q_uv) >> 6, 1),
        "mode": max((1 * q_i4 * q_i4) >> 7, 1),
        "i4": max((3 * q_i4 * q_i4) >> 7, 1),
        "q_i4": q_i4,
    }
    return qp, lambdas


# ---------------------------------------------------------------------------
# Fused elementwise rate model (phase 1 only; emission rates stay exact on
# the host). Exact for |level| <= 7 per (band, ctx); piecewise-constant tail
# above, anchored to LEVEL_FIXED_COSTS — plenty for ranking 4 modes.
# ---------------------------------------------------------------------------

class RateTables:
    """Scalar per-level cost tables for the phase-1 search.

    Derived from the exact per-(type, band, ctx) tables by averaging over
    band and context: the search only ranks 4 candidate modes, and the
    band/ctx terms are nearly mode-independent — measured impact of the
    collapse is < 0.05% bitstream size at Q75 while removing ~70% of the
    phase-1 elementwise work (each per-position table select became a
    scalar constant). Emission rates on the host stay exact.
    """

    def __init__(self, proba: np.ndarray):
        lc = compute_level_cost_tables(proba)          # [4, 8, 3, 68]
        fl = np.asarray(LEVEL_FIXED_COSTS)
        ec = np.asarray(ENTROPY_COST)
        p0 = proba[..., 0].astype(np.int64)
        cost0_p0 = ec[p0]                              # [4, 8, 3]
        comb = lc[:, BANDS] + fl[None, None, None, :68]  # [4,16,3,68]
        # cost(v) for v <= 7, ctx=1, averaged over positions: [4, 8].
        self.lvl = comb[:, :, 1, :8].mean(axis=1).astype(np.int32)
        base = self.lvl[:, 7:8]
        self.tail = np.stack([
            comb[:, :, 1, 8:11].mean(axis=(1, 2)),
            comb[:, :, 1, 11:19].mean(axis=(1, 2)),
            comb[:, :, 1, 19:35].mean(axis=(1, 2)),
            comb[:, :, 1, 35:68].mean(axis=(1, 2)),
        ], axis=-1).astype(np.int32) - base            # [4, 4]
        self.eob = cost0_p0[:, 2, 1].astype(np.int32)  # [4] scalar EOB cost
        # Position-resolved variant (band-exact at ctx=1 — the zigzag
        # walk in every consumer is a static loop, so per-position
        # constants cost the same as the collapsed ones; only the split
        # decision's absolute-rate accuracy needed them):
        c16 = comb[:, :16]                             # [4, 16, 3, 68]
        self.lvlp = c16[:, :, 1, :8].astype(np.int32)  # [4, 16, 8]
        basep = self.lvlp[:, :, 7:8]
        self.tailp = (np.stack([
            c16[:, :, 1, 8:11].mean(axis=-1),
            c16[:, :, 1, 11:19].mean(axis=-1),
            c16[:, :, 1, 19:35].mean(axis=-1),
            c16[:, :, 1, 35:68].mean(axis=-1),
        ], axis=-1) - basep).astype(np.int32)          # [4, 16, 4]
        # EOB bit cost when the last nonzero sits at position p (the bit
        # is coded at band[p+1] with ctx from the last level: 1 if v==1
        # else 2 — GetResidualCost_C); p==15 emits no EOB bit.
        nb = np.asarray(T.BANDS)[1:17]                 # band of p+1
        e1 = np.array(cost0_p0[:, nb, 1])              # [4, 16]
        e2 = np.array(cost0_p0[:, nb, 2])
        e1[:, 15] = 0
        e2[:, 15] = 0
        self.eob1p = e1.astype(np.int32)
        self.eob2p = e2.astype(np.int32)
        # Empty-block cost by first position (EOB at band[first], ctx=1).
        self.emptyp = cost0_p0[:, BANDS, 1].astype(np.int32)   # [4, 16]


def approx_block_rate(levels, first, pt, rt: RateTables):
    """Approximate rate of zigzag level blocks [..., 16] -> int32 [...].

    Fused elementwise select-chains over per-position (band-exact,
    ctx=1-anchored) constants plus the exact per-band EOB bit; no
    gathers, no one-hot matmuls, no cross-block context threading.
    """
    v = jnp.abs(levels)
    idx = jnp.arange(16)
    nzv = (v != 0) & (idx >= first)
    has_any = nzv.any(axis=-1)
    last = 15 - jnp.argmax(nzv[..., ::-1], axis=-1)
    last = jnp.where(has_any, last, 0)

    vc = jnp.minimum(v, 7)
    cost = jnp.zeros(v.shape, jnp.int32)
    for k in range(8):
        cost = cost + jnp.where(vc == k,
                                jnp.asarray(rt.lvlp[pt, :, k]), 0)
    for b, (lo, hi) in enumerate(((8, 11), (11, 19), (19, 35), (35, 1 << 30))):
        cost = cost + jnp.where((v >= lo) & (v < hi),
                                jnp.asarray(rt.tailp[pt, :, b]), 0)

    in_run = (idx >= first) & (idx <= last[..., None])
    total = jnp.where(in_run, cost, 0).sum(axis=-1)
    e_pos = jnp.where(v == 1, jnp.asarray(rt.eob1p[pt]),
                      jnp.asarray(rt.eob2p[pt]))
    eob = jnp.where(idx == last[..., None], e_pos, 0).sum(axis=-1)
    return jnp.where(has_any, total + eob, int(rt.emptyp[pt, first]))


# ---------------------------------------------------------------------------
# Shared prediction math. All mode builders take [..., S] context rows.
# ---------------------------------------------------------------------------

def _preds4(size, top, left, tl, has_top, has_left):
    """[..., size] contexts -> [..., 4, size, size] preds (DC/TM/V/H)."""
    shift = 5 if size == 16 else 4
    ht = has_top[..., None]
    hl = has_left[..., None]
    top_m = jnp.where(ht, top, 127)
    left_m = jnp.where(hl, left, 129)
    tl_m = jnp.where(has_top & has_left, tl,
                     jnp.where(has_top, 129, 127))
    sum_t = top_m.sum(axis=-1)
    sum_l = left_m.sum(axis=-1)
    dc = jnp.where(
        has_top & has_left, (sum_t + sum_l + size) >> shift,
        jnp.where(has_top, (sum_t + (size >> 1)) >> (shift - 1),
                  jnp.where(has_left, (sum_l + (size >> 1)) >> (shift - 1),
                            0x80)))
    shape = dc.shape + (size, size)
    pred_dc = jnp.broadcast_to(dc[..., None, None], shape)
    pred_v = jnp.broadcast_to(top_m[..., None, :], shape)
    pred_h = jnp.broadcast_to(left_m[..., :, None], shape)
    pred_tm = jnp.clip(
        left_m[..., :, None] + top_m[..., None, :] - tl_m[..., None, None],
        0, 255)
    return jnp.stack([pred_dc, pred_tm, pred_v, pred_h], axis=-3)


def _block(x, size):
    """[..., S, S] -> [..., (S/4)^2, 4, 4] raster 4x4 blocks."""
    *lead, S, _ = x.shape
    b = S // 4
    x = x.reshape(*lead, b, 4, b, 4)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, b * b, 4, 4)


def _unblock(x, size):
    *lead, nb, _, _ = x.shape
    b = size // 4
    x = x.reshape(*lead, b, b, 4, 4)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, size, size)


def _luma_pipe(src_b, pred_b, qp, score_only=False, rd_drop: float = 0.0,
               with_recon=False):
    """I16 transform pipeline. src/pred: [..., 16, 4, 4] int32.

    Returns (lv [..., 16, 16], y2lv [..., 16], recon [..., 16, 4, 4]); with
    score_only the third element is the transform-domain distortion
    sum((coeff - dequant)^2) instead (no IDCT/reconstruction) — the VP8
    FDCT has an L2 gain of 4.0, so callers weight it by 64 instead of 256.
    """
    coeffs = dct.fdct4x4(src_b, pred_b)
    flat = coeffs.reshape(*coeffs.shape[:-2], 16)
    lead = flat.shape[:-2]
    wht = dct.fwht4x4(flat[..., 0].reshape(*lead, 4, 4))
    # Per-MB quant rows arrive as [n, 1, 16]; the y2 block is [n, 16].
    y2q = tuple(a[:, 0] if a.ndim == 3 else a for a in qp["y2"])
    y2lv, y2dq = quantize(wht.reshape(*lead, 16), *y2q, ZIGZAG)
    rec_dc = dct.wht4x4(y2dq.reshape(*lead, 4, 4)).reshape(*lead, 16)
    lv, dq = quantize(flat, *qp["y1"], ZIGZAG, first=1, rd_drop=rd_drop)
    dq = dq.at[..., 0].set(rec_dc)
    if score_only:
        disto_td = ((flat - dq) ** 2).sum(axis=(-2, -1))
        if with_recon:
            recon = jnp.clip(pred_b + dct.idct4x4(dq.reshape(coeffs.shape)),
                             0, 255)
            return lv, y2lv, disto_td, recon
        return lv, y2lv, disto_td
    recon = jnp.clip(pred_b + dct.idct4x4(dq.reshape(coeffs.shape)), 0, 255)
    return lv, y2lv, recon


def _chroma_pipe(src_b, pred_b, qp, score_only=False):
    """[..., 4, 4, 4] blocks -> (lv [..., 4, 16], recon | disto_td)."""
    co = dct.fdct4x4(src_b, pred_b)
    flat = co.reshape(*co.shape[:-2], 16)
    lv, dq = quantize(flat, *qp["uv"], ZIGZAG)
    if score_only:
        disto_td = ((flat - dq) ** 2).sum(axis=(-2, -1))
        return lv, disto_td
    recon = jnp.clip(pred_b + dct.idct4x4(dq.reshape(co.shape)), 0, 255)
    return lv, recon


# ---------------------------------------------------------------------------
# Phase 0 — segment analysis on device (alphas -> k-means -> SNS quants).
# Mirrors lossy/analysis.py compute_alphas/assign_segments/plan_segments
# (reference encode_analysis.go:29,737 + setSegmentParams).
# ---------------------------------------------------------------------------

def _hist_alpha(coeffs):
    """coeffs int32 [n, nb, 16] -> alpha [n] (DCT histogram complexity)."""
    v = jnp.minimum(jnp.abs(coeffs) >> 3, 31)
    n = v.shape[0]
    flat = v.reshape(n, -1)
    hist = jnp.stack([(flat == k).sum(axis=1) for k in range(32)], axis=1)
    max_value = hist.max(axis=1)
    nz = hist > 0
    last_nz = jnp.where(nz.any(axis=1),
                        31 - jnp.argmax(nz[:, ::-1], axis=1), 1)
    last_nz = jnp.maximum(last_nz, 1)
    alpha = jnp.where(max_value > 1,
                      510 * last_nz // jnp.maximum(max_value, 1), 0)
    return jnp.minimum(alpha, 255)


def _mb_alphas2(Y, U, V, mb_w, mb_h):
    """Per-MB (texture alpha, pre-mix UV alpha) [n_mb] each
    (compute_alphas analog; the UV component feeds dq_uv_ac)."""
    n_mb = mb_w * mb_h
    yb = _block(Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3)
                .reshape(n_mb, 16, 16), 16)
    dc = jnp.round(yb.mean(axis=(1, 2, 3))).astype(jnp.int32)
    luma = _hist_alpha(dct.fdct4x4(yb, dc[:, None, None, None])
                       .reshape(n_mb, 16, 16))
    ub = _block(U.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                .reshape(n_mb, 8, 8), 8)
    vb = _block(V.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                .reshape(n_mb, 8, 8), 8)
    uvb = jnp.concatenate([ub, vb], axis=1)
    dcu = jnp.round(uvb.mean(axis=(1, 2, 3))).astype(jnp.int32)
    uv = _hist_alpha(dct.fdct4x4(uvb, dcu[:, None, None, None])
                     .reshape(n_mb, 8, 16))
    return jnp.clip(255 - ((3 * luma + uv + 2) >> 2), 0, 255), uv


def _mb_alphas(Y, U, V, mb_w, mb_h):
    """Per-MB texture alphas [n_mb] (compute_alphas analog)."""
    return _mb_alphas2(Y, U, V, mb_w, mb_h)[0]


def _uv_deltas(guv, sns):
    """UV quantizer deltas (reference setSegmentParams,
    encode_analysis.go:163-170): DC boosted from SNS strength (static),
    AC following the image's mean pre-mix UV alpha (traced).

    The mid-point is 94, not the reference's 64: our UV alpha comes from
    DC-of-source prediction histograms (one joint U+V histogram), which
    reads ~30 higher than the reference's best-mode per-plane alpha on
    the same content — calibrated so the emitted dq_uv_ac matches
    libwebp's on the benchmark corpus.
    Returns (dq_uv_dc int, dq_uv_ac int32 array like guv)."""
    dq_dc = max(-15, min(15, -4 * sns // 100))
    if not os.environ.get("WEBPTPU_DQUV_AC"):
        # The AC delta is off by default: measured on the benchmark
        # corpus, the coarser chroma AC it buys trades ~0.06 dB for
        # ~0.8% size — below the encoder's RD slope (the reference's
        # uv-alpha estimate does not transfer cleanly to our DC-pred
        # alpha proxy). The DC boost is a clean win and stays.
        return dq_dc, jnp.zeros_like(jnp.asarray(guv))
    dq_ac = (guv - 94) * (6 - (-4)) // (100 - 30)
    dq_ac = jnp.clip(dq_ac * sns // 100, -4, 6)
    return dq_dc, dq_ac


def _uv_rows_delta(q_idx, dq_dc, dq_ac):
    """UV quant rows [..., 4seg, 4param, 16] honoring the dc/ac deltas.

    Stitched per zigzag position from the single-index uv table (whose
    position 0 carries the DC quant with the 117 clip baked in, 1..15
    the AC quant): position 0 selected at q+dq_dc, the rest at q+dq_ac.
    q_idx: [..., 4] i32; dq_ac broadcasts over the segment axis.
    """
    tabs, *_ = all_q_tables()
    tab_uv = jnp.asarray(tabs["uv"].reshape(128, 64), jnp.int32)
    oh_dc = jax.nn.one_hot(jnp.clip(q_idx + dq_dc, 0, 127), 128,
                           dtype=jnp.int32)
    oh_ac = jax.nn.one_hot(jnp.clip(q_idx + dq_ac[..., None], 0, 127), 128,
                           dtype=jnp.int32)
    rows_dc = jnp.einsum("...q,qf->...f", oh_dc, tab_uv)
    rows_ac = jnp.einsum("...q,qf->...f", oh_ac, tab_uv)
    shape = q_idx.shape + (4, 16)
    rows_dc = rows_dc.reshape(shape)
    rows_ac = rows_ac.reshape(shape)
    pos0 = jnp.asarray(np.arange(16) == 0)
    return jnp.where(pos0, rows_dc, rows_ac)


def _lam_uv_of(uv_rows):
    """Per-segment UV lambda from (possibly delta-stitched) uv quant rows
    [..., 4seg, 4param, 16]: lam = max((3*q_uv^2)>>6, 1), q_uv from the
    row's actual dc/ac steps (reference setupSegment, encode.go:1118)."""
    uvdc = uv_rows[..., 0, 0]
    uvac = uv_rows[..., 0, 1]
    q_uv = (uvdc + 15 * uvac + 8) >> 4
    return jnp.maximum((3 * q_uv * q_uv) >> 6, 1).astype(jnp.float32)


def _plan_from_histo(histo, alphas, quality, sns_strength, num_segs=4):
    """k-means over a 256-bin alpha histogram -> (seg_map, q_idx, beta).

    On a multi-chip mesh the histogram is psum'd over row-band shards
    before this runs, so every shard derives identical centers (the
    segmentation header is image-global)."""
    from ..lossy.analysis import _quality_to_compression

    bins = jnp.arange(256)
    nzm = histo > 0
    min_a = jnp.argmax(nzm)
    max_a = 255 - jnp.argmax(nzm[::-1])
    rng_a = max_a - min_a
    ks = jnp.arange(num_segs)
    centers = (min_a + ((2 * ks + 1) * rng_a) // (2 * num_segs)).astype(
        jnp.int32)

    def assign(centers):
        d = jnp.abs(bins[:, None] - centers[None, :])          # [256, S]
        # Nearest center with ties to the LOWER index (host while-loop).
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    def iterate(centers, _):
        seg_of = assign(centers)
        oh = (seg_of[:, None] == ks[None, :]).astype(jnp.int32)  # [256, S]
        accum = (histo[:, None] * oh).sum(axis=0)
        dist = ((histo * bins)[:, None] * oh).sum(axis=0)
        new_c = jnp.where(accum > 0,
                          (dist + accum // 2) // jnp.maximum(accum, 1),
                          centers).astype(jnp.int32)
        return new_c, None

    centers, _ = jax.lax.scan(iterate, centers, None, length=6)
    seg_of_alpha = assign(centers)
    seg_map = seg_of_alpha[alphas]


    oh = (seg_of_alpha[:, None] == ks[None, :]).astype(jnp.int32)
    accum = (histo[:, None] * oh).sum(axis=0)
    total_w = jnp.maximum(accum.sum(), 1)
    weighted_avg = ((centers * accum).sum() + total_w // 2) // total_w
    min_c, max_c = centers.min(), centers.max()
    range_c = jnp.maximum(max_c - min_c, 1)
    alpha_n = jnp.clip(255 * (centers - weighted_avg) // range_c, -127, 127)
    beta_n = jnp.clip(255 * (centers - min_c) // range_c, 0, 255)

    sns = max(0, int(sns_strength))
    amp = 0.9 * sns / 100.0 / 128.0
    c_base = float(_quality_to_compression(quality))
    expn = 1.0 - amp * alpha_n.astype(jnp.float32)
    c = jnp.power(jnp.float32(c_base), expn)
    q_idx = jnp.clip((127.0 * (1.0 - c)).astype(jnp.int32), 0, 127)
    beta = beta_n.astype(jnp.int32)
    if num_segs < 4:
        # _mb_quant / finalize_device_plan expect 4 segment rows; pad by
        # repeating the last segment (equivalent segments are merged away
        # again in finalize_device_plan's simplifySegments pass).
        pad = 4 - num_segs
        q_idx = jnp.concatenate([q_idx, jnp.repeat(q_idx[-1:], pad)])
        beta = jnp.concatenate([beta, jnp.repeat(beta[-1:], pad)])
    return seg_map, q_idx, beta


def _segment_plan_device(Y, U, V, mb_w, mb_h, quality, sns_strength,
                         num_segs=4):
    """Returns (seg_map [n_mb] i32, q_idx [4] i32, beta [4] i32,
    global_uv i32 scalar — mean pre-mix UV alpha)."""
    alphas, uv = _mb_alphas2(Y, U, V, mb_w, mb_h)
    guv = uv.sum() // (mb_w * mb_h)
    histo = (alphas[None, :] == jnp.arange(256)[:, None]).sum(axis=1)
    return _plan_from_histo(histo, alphas, quality, sns_strength,
                            num_segs) + (guv,)


def _seg_select(rows, seg_map):
    """rows [4, ...], seg_map [n] -> [n, ...] via fused 4-way select."""
    s = seg_map.reshape(seg_map.shape + (1,) * (rows.ndim - 1))
    return jnp.where(s == 0, rows[0],
                     jnp.where(s == 1, rows[1],
                               jnp.where(s == 2, rows[2], rows[3])))


def _mb_quant(seg_map, q_idx, n_mb, dq_uv=None):
    """Expands per-segment quant indices to per-MB quantizer rows.

    Returns dict like quant_params() but with [n_mb, 1, 16] arrays, plus
    per-MB lambda vectors (float32 [n_mb]). All int32 selects — the only
    128-wide operation is the tiny one-hot over the 4 segment q indices.
    dq_uv: optional (dq_uv_dc int, dq_uv_ac i32 scalar) UV quant deltas
    (reference setupSegment's q+dq clip, encode.go:1104-1108).
    """
    tabs, lam_i16, lam_uv, lam_i4, qi4 = all_q_tables()
    oh_q = jax.nn.one_hot(q_idx, 128, dtype=jnp.int32)          # [4, 128]
    qp = {}
    seg_rows = {}
    for k in ("y1", "y2", "uv"):
        tab = jnp.asarray(tabs[k].reshape(128, 64), jnp.int32)
        rows = (oh_q[:, :, None] * tab[None]).sum(axis=1)       # [4, 64]
        seg_rows[k] = rows.reshape(4, 4, 16)
        if k == "uv" and dq_uv is not None:
            seg_rows[k] = _uv_rows_delta(q_idx, dq_uv[0],
                                         jnp.asarray(dq_uv[1]))
        mb = _seg_select(seg_rows[k], seg_map)                  # [n, 4, 16]
        qp[k] = tuple(mb[:, i][:, None, :] for i in range(4))
    lam16_s = (oh_q * jnp.asarray(lam_i16, jnp.float32)).sum(axis=1)  # [4]
    if dq_uv is not None:
        lamuv_s = _lam_uv_of(seg_rows["uv"])
    else:
        lamuv_s = (oh_q * jnp.asarray(lam_uv, jnp.float32)).sum(axis=1)
    lami4_s = (oh_q * jnp.asarray(lam_i4, jnp.float32)).sum(axis=1)
    lammd_s = (oh_q * jnp.asarray(_lam_mode_table(qi4),
                                  jnp.float32)).sum(axis=1)
    lam16 = _seg_select(lam16_s, seg_map)
    lamuv = _seg_select(lamuv_s, seg_map)
    lami4 = _seg_select(lami4_s, seg_map)
    lammd = _seg_select(lammd_s, seg_map)
    return (qp, {"i16": lam16, "uv": lamuv, "i4": lami4, "mode": lammd,
                 "i4_seg": lami4_s, "i16_seg": lam16_s,
                 "uv_seg": lamuv_s, "mode_seg": lammd_s}, seg_rows)


def _tlsd_static(sns: int, q_i4: int, n_mb: int):
    """(tlsd4 [4] f32 | None, tlsd scalar | None): TLambdaSD for the
    single-segment path (reference encode.go:1137 — SNS path only)."""
    v = (int(sns) * int(q_i4)) >> 5
    if sns <= 0 or v <= 0:
        return None, None
    return jnp.full((4,), v, jnp.float32), jnp.float32(v)


def _tlsd_from_seg(sns: int, seg_q, seg_map):
    """Per-segment TLambdaSD from traced segment quant indices."""
    if sns <= 0:
        return None, None
    _, _, _, _, qi4 = all_q_tables()
    qi4_seg = jnp.take(jnp.asarray(qi4, jnp.int32), seg_q)
    tlsd4 = ((sns * qi4_seg) >> 5).astype(jnp.float32)
    return tlsd4, _seg_select(tlsd4, seg_map)


def _pallas_enabled() -> bool:
    """The Pallas I4-search kernel runs on real TPU backends; the jnp
    formulation remains the CPU/fallback path (bit-identical scores)."""
    import os

    if os.environ.get("WEBPTPU_NO_PALLAS"):
        return False
    try:
        # Mosaic/pltpu kernels lower only on TPU; any other accelerator
        # (e.g. GPU) must take the jnp fallback path.
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _i4_dispatch(Y, src_b, qp_i, lam_i, seg, rt, mb_w, mb_h, i16_score,
                 tlsd=None, tlsd4=None, allow_tr=False):
    """Routes the I4 search to the Pallas kernel (TPU) or the jnp path.
    tlsd (scalar | [n_mb]) and tlsd4 ([4] per-segment) enable the
    perceptual SD term. allow_tr (skew-2 quality mode) uses the jnp path
    — the Pallas kernel bakes the rightmost-column TR ban."""
    from . import i4 as I4

    if _pallas_enabled() and not allow_tr:
        n_mb = mb_w * mb_h
        if seg is not None:
            seg_map, seg_rows = seg
            qtab = seg_rows["y1"].reshape(16, 16).astype(jnp.int32)
            lam4 = lam_i["i4_seg"]
            lam_mode4 = lam_i.get("mode_seg", lam4)
        else:
            seg_map = jnp.zeros((n_mb,), jnp.int32)
            one = jnp.stack([jnp.asarray(a, jnp.int32).reshape(16)
                             for a in qp_i["y1"]])              # [4, 16]
            qtab = jnp.tile(one, (4, 1))
            lam4 = jnp.full((4,), lam_i["i4"], jnp.float32)
            lam_mode4 = jnp.full((4,), lam_i.get("mode", lam_i["i4"]),
                                 jnp.float32)
        try:
            return I4.i4_search_pallas(Y, src_b, seg_map, qtab, lam4, rt,
                                       mb_w, mb_h, i16_score, tlsd4=tlsd4,
                                       lam_mode4=lam_mode4)
        except Exception:
            pass
    return I4.i4_search(Y, src_b, qp_i["y1"], lam_i["i4"], rt, mb_w, mb_h,
                        i16_score, approx_block_rate, tlsd=tlsd,
                        allow_tr=allow_tr,
                        lam_mode=lam_i.get("mode", lam_i["i4"]))


# ---------------------------------------------------------------------------
# Phase 1 — fully parallel mode search with source-pixel context.
# ---------------------------------------------------------------------------

def _mb_contexts(plane, s, halo, above):
    """Source-pixel top/left/corner context per MB for an S-sized grid."""
    gh, gw = plane.shape[0] // s, plane.shape[1] // s
    g = plane.reshape(gh, s, gw, s)
    bottom = g[:, s - 1]                                        # [gh,gw,s]
    right = g[..., s - 1].transpose(0, 2, 1)                    # [gh,gw,s]
    if halo is None:
        row0 = jnp.zeros((1, gw, s), jnp.int32)
        tl0 = jnp.zeros((1, gw), jnp.int32)
    else:
        row0 = jnp.where(above, halo, 0).reshape(1, gw, s)
        # tl of MB (x, 0) = halo[x*s - 1].
        tl0 = jnp.where(above, jnp.concatenate(
            [jnp.zeros(1, jnp.int32), halo[s - 1::s][:gw - 1]]), 0)[None]
    top = jnp.concatenate([row0, bottom[:-1]], axis=0)
    pad_c = jnp.zeros((gh, 1, s), jnp.int32)
    left = jnp.concatenate([pad_c, right[:, :-1]], axis=1)
    br = g[:, s - 1, :, s - 1]                                  # [gh,gw]
    tl = jnp.concatenate(
        [tl0, jnp.pad(br[:-1, :-1], ((0, 0), (1, 0)))], axis=0)
    return (top.reshape(-1, s), left.reshape(-1, s), tl.reshape(-1))


def _phase1(Y, U, V, qp, lambdas, rt: RateTables, mb_w, mb_h,
            halos=None, has_above=False, tlsd=None):
    """Y: [H, W] int32 etc. Returns (modes [n_mb] u8, uvmodes [n_mb] u8).

    halos: optional (hy [W], hu [W/2], hv [W/2]) int32 source-pixel rows
    from the band above (multi-chip row-band sharding); has_above is a
    traced bool scalar gating them (False on the top band).
    """
    n_mb = mb_w * mb_h
    above = jnp.asarray(has_above if halos is not None else False)

    def contexts(plane, s, halo):
        return _mb_contexts(plane, s, halo, above)

    ys = np.repeat(np.arange(mb_h), mb_w)
    xs = np.tile(np.arange(mb_w), mb_h)
    has_top = jnp.asarray(ys > 0) | (above & jnp.asarray(ys == 0))
    has_left = jnp.asarray(xs > 0)
    hy, hu, hv = halos if halos is not None else (None, None, None)

    # --- Luma.
    topY, leftY, tlY = contexts(Y, 16, hy)
    src_b = _block(Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3)
                   .reshape(n_mb, 16, 16), 16)                      # [n,16,4,4]
    best_score = jnp.full((n_mb,), jnp.inf, jnp.float32)
    best_rate = jnp.zeros((n_mb,), jnp.float32)
    best_D = jnp.zeros((n_mb,), jnp.float32)
    best_mode = jnp.zeros((n_mb,), jnp.uint8)
    preds = _preds4(16, topY, leftY, tlY, has_top, has_left)        # [n,4,16,16]
    if tlsd is not None:
        from . import metrics as M

        wt = jnp.asarray(M.WEIGHT_Y)
        ha_src = jnp.sum(wt * jnp.abs(M._hadamard4(src_b)), axis=(-2, -1))
    for m in range(4):
        pred_b = _block(preds[:, m], 16)
        if tlsd is not None:
            lv, y2lv, disto_td, recon = _luma_pipe(src_b, pred_b, qp,
                                                   score_only=True,
                                                   with_recon=True)
        else:
            lv, y2lv, disto_td = _luma_pipe(src_b, pred_b, qp,
                                            score_only=True)
        rate = approx_block_rate(lv, 1, 0, rt).sum(axis=-1)
        rate = rate + approx_block_rate(y2lv, 0, 1, rt)
        rate = rate + FIXED_COSTS_I16[m]
        D = 64.0 * disto_td.astype(jnp.float32)
        if tlsd is not None:
            # Perceptual texture distortion (reference TDisto16x16 +
            # TLambdaSD, encode_analysis.go:1180): SD ~= tlsd * td in the
            # device score's <<8 distortion units.
            ha_rec = jnp.sum(wt * jnp.abs(M._hadamard4(recon)),
                             axis=(-2, -1))
            td = (jnp.abs(ha_rec - ha_src) >> 5).sum(axis=-1)
            D = D + tlsd * td.astype(jnp.float32)
        score = rate.astype(jnp.float32) * lambdas["i16"] + D
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_rate = jnp.where(better, rate.astype(jnp.float32), best_rate)
        best_D = jnp.where(better, D, best_D)
        best_mode = jnp.where(better, np.uint8(m), best_mode)
    # The returned score is the winner's total rescored at lambda_mode —
    # the I4-vs-I16 split comparison scale (reference
    # encode_parallel.go:565; selection above runs at lambda_i16).
    best_score = best_rate * lambdas.get("mode", lambdas["i16"]) + best_D

    # --- Chroma (joint U+V score).
    topU, leftU, tlU = contexts(U, 8, hu)
    topV, leftV, tlV = contexts(V, 8, hv)
    srcU_b = _block(U.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                    .reshape(n_mb, 8, 8), 8)
    srcV_b = _block(V.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                    .reshape(n_mb, 8, 8), 8)
    predsU = _preds4(8, topU, leftU, tlU, has_top, has_left)
    predsV = _preds4(8, topV, leftV, tlV, has_top, has_left)
    best_uv_score = jnp.full((n_mb,), jnp.inf, jnp.float32)
    best_uv = jnp.zeros((n_mb,), jnp.uint8)
    for m in range(4):
        rate = jnp.full((n_mb,), FIXED_COSTS_UV[m], jnp.int32)
        disto = jnp.zeros((n_mb,), jnp.int32)
        for src, preds_c in ((srcU_b, predsU), (srcV_b, predsV)):
            lv, disto_td = _chroma_pipe(src, _block(preds_c[:, m], 8), qp,
                                        score_only=True)
            disto = disto + disto_td
            rate = rate + approx_block_rate(lv, 0, 2, rt).sum(axis=-1)
        score = (rate.astype(jnp.float32) * lambdas["uv"]
                 + 64.0 * disto.astype(jnp.float32))
        better = score < best_uv_score
        best_uv_score = jnp.where(better, score, best_uv_score)
        best_uv = jnp.where(better, np.uint8(m), best_uv)

    return best_mode, best_uv, best_score


# ---------------------------------------------------------------------------
# Phase 2 — closed-loop reconstruction wavefront (modes fixed, skew 1).
# ---------------------------------------------------------------------------

def _phase2(Y, U, V, modes, uvmodes, qp, mb_w, mb_h, rd_drop=0.0,
            halos=None, has_above=False, seg=None, i4=None, sk=1):
    """Exact levels under true reconstructed context.

    Returns (lv24 [n_mb, 24, 16] i16, y2 [n_mb, 16] i16).

    With halos (multi-chip row bands) the band's first MB row predicts
    from the *source* pixel row above (the decoder uses its reconstruction
    of that row, so the boundary row's prediction differs by quantization
    noise — a one-row quality approximation, not a validity issue; every
    other row is exact closed loop).

    seg: optional (seg_map [n_mb] i32, seg_rows {y1/y2/uv: [4, 64] f32})
    for per-MB segment quantization; qp is then ignored.

    Returns (lv24 [n_mb,24,16] i16, y2 [n_mb,16] i16, bottom [n_mb,16],
    right [n_mb,16]) — the reconstructed MB borders feed the I4 phase 3.
    """
    n_mb = mb_w * mb_h
    # The default scan runs at skew 1 (t = x + y): I16 needs no top-right
    # neighbor, and I4's only above-right consumer — the rightmost
    # subblock column's strip — is closed off by forbidding the three
    # strip-reading modes there (ops/i4.py TR_MODES), so no macroblock
    # ever waits on its above-right. sk=2 (t = x + 2y, the reference's
    # wavefront, encode_parallel.go:168) doubles the step count but makes
    # the above-right MB's reconstruction available one step early, so
    # the full I4 mode set is legal everywhere (method >= 5).
    assert sk == 1 or halos is None, "skew-2 is single-band only"
    n_steps = mb_w + sk * (mb_h - 1)
    above = jnp.asarray(has_above if halos is not None else False)

    # Static skew maps (numpy): step t, lane y -> MB (x = t - sk*y, y).
    tt = np.arange(n_steps)[:, None]
    yy = np.arange(mb_h)[None, :]
    xx = tt - sk * yy
    valid_np = (xx >= 0) & (xx < mb_w)

    def skew(a):
        # Shear via pad+reshape (no gather — gathers of the whole skewed
        # tensor both cost HBM time and blow the VMEM budget at batch>16):
        # row y shifted right by sk*y is flat index y*(P-sk) + t with
        # P = n_steps + sk, so padding rows to width P and re-viewing the
        # flat buffer as [mb_h, n_steps] lands every (t - sk*y) in place.
        b = a.reshape(mb_h, mb_w, *a.shape[1:])
        P = n_steps + sk
        pad_w = [(0, 0)] * b.ndim
        pad_w[1] = (0, P - mb_w)
        b = jnp.pad(b, pad_w)
        flat = b.reshape(mb_h * P, *a.shape[1:])[: mb_h * n_steps]
        c = flat.reshape(mb_h, n_steps, *a.shape[1:])
        return jnp.swapaxes(c, 0, 1)

    src_y = _block(Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3)
                   .reshape(n_mb, 16, 16), 16).astype(jnp.int16)
    src_u = _block(U.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                   .reshape(n_mb, 8, 8), 8).astype(jnp.int16)
    src_v = _block(V.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3)
                   .reshape(n_mb, 8, 8), 8).astype(jnp.int16)
    xs = {
        "y": skew(src_y), "u": skew(src_u), "v": skew(src_v),
        "m": skew(modes), "uvm": skew(uvmodes),
        "x": jnp.asarray(xx.clip(0, mb_w - 1), jnp.int32),
        "valid": jnp.asarray(valid_np),
    }
    if seg is not None:
        xs["seg"] = skew(seg[0])
    if i4 is not None:
        xs["i4"] = skew(i4[0])
        xs["i4m"] = skew(i4[1])
    if halos is not None:
        # Halo segments per step for lane 0 (y=0, x=t): top row + corner.
        hy, hu, hv = (h.astype(jnp.int32) for h in halos)
        def halo_seg(h, s):
            v = h.reshape(-1, s)
            pad = jnp.zeros((n_steps - v.shape[0], s), jnp.int32)
            return jnp.concatenate([v, pad], axis=0)
        def tlseg(h, s):
            t = jnp.concatenate([jnp.zeros(1, jnp.int32), h[s - 1::s][:-1]])
            return jnp.concatenate(
                [t, jnp.zeros(n_steps - t.shape[0], jnp.int32)])
        xs["hy"], xs["hty"] = halo_seg(hy, 16), tlseg(hy, 16)
        xs["hu"], xs["htu"] = halo_seg(hu, 8), tlseg(hu, 8)
        xs["hv"], xs["htv"] = halo_seg(hv, 8), tlseg(hv, 8)

    lanes_y = jnp.arange(mb_h)

    def shift1(a):
        """a[l] <- a[l-1] (lane 0 gets zeros)."""
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    def sel_mode(preds, mode):
        """preds: [L, 4, s, s]; mode: [L] -> [L, s, s]."""
        m = mode.astype(jnp.int32)[:, None, None]
        return jnp.where(
            m == 0, preds[:, 0],
            jnp.where(m == 1, preds[:, 1],
                      jnp.where(m == 2, preds[:, 2], preds[:, 3])))

    def step(carry, x):
        # Per plane: bottoms from t-1 and t-2, right cols from t-1,
        # corners from t-1..t-3 (which history entries feed the contexts
        # depends on the skew).
        (By1, By2, Ry, Cy1, Cy2, Cy3,
         Bu1, Bu2, Ru, Cu1, Cu2, Cu3,
         Bv1, Bv2, Rv, Cv1, Cv2, Cv3) = carry
        has_left = x["valid"] & (x["x"] > 0)
        has_top = x["valid"] & ((lanes_y > 0) | above)

        if seg is not None:
            # 4-way select of per-segment quant rows (no in-scan matmuls).
            qp_t = {k: tuple(
                _seg_select(seg[1][k][:, i], x["seg"])[:, None, :]
                for i in range(4)) for k in ("y1", "y2", "uv")}
        else:
            qp_t = qp

        topY = shift1(By2 if sk == 2 else By1)
        leftY, tlY = Ry, shift1(Cy3 if sk == 2 else Cy2)
        if halos is not None:
            topY = topY.at[0].set(jnp.where(above, x["hy"], topY[0]))
            tlY = tlY.at[0].set(jnp.where(above, x["hty"], tlY[0]))
        predsY = _preds4(16, topY, leftY, tlY, has_top, has_left)
        predY_b = _block(sel_mode(predsY, x["m"]), 16)
        lv, y2lv, reconY = _luma_pipe(x["y"].astype(jnp.int32), predY_b,
                                      qp_t, rd_drop=rd_drop)
        rYp = _unblock(reconY, 16)
        if i4 is not None:
            from . import i4 as I4

            if sk == 2:
                # Real above-right strip: bottom row [0:4] of MB
                # (x+1, y-1), reconstructed at step t-1 (same rule as the
                # decoder scan, ops/decode.py); right-edge replicated.
                trs = shift1(By1)[:, 0:4]
                edge = jnp.broadcast_to(topY[:, 15:16], (mb_h, 4))
                trs = jnp.where((x["x"] + 1 >= mb_w)[:, None], edge, trs)
            else:
                # Above-right placeholder: at skew 1 the above-right MB's
                # reconstruction is not yet available, and never needed —
                # the rightmost subblock column cannot select a
                # strip-reading mode (i4_search forbids TR_MODES). The
                # edge-replicated value keeps the computation
                # deterministic.
                trs = jnp.broadcast_to(topY[:, 15:16], (mb_h, 4))
            lv_i4, work = I4.i4_reconstruct(
                x["y"].astype(jnp.int32), x["i4m"], topY, leftY, tlY,
                trs, has_top, has_left, qp_t["y1"], rd_drop=rd_drop)
            sel = x["i4"][:, None, None]
            lv = jnp.where(sel, lv_i4, lv)
            y2lv = jnp.where(x["i4"][:, None], 0, y2lv)
            rYp = jnp.where(sel, work, rYp)

        topU = shift1(Bu2 if sk == 2 else Bu1)
        leftU, tlU = Ru, shift1(Cu3 if sk == 2 else Cu2)
        topV = shift1(Bv2 if sk == 2 else Bv1)
        leftV, tlV = Rv, shift1(Cv3 if sk == 2 else Cv2)
        if halos is not None:
            topU = topU.at[0].set(jnp.where(above, x["hu"], topU[0]))
            tlU = tlU.at[0].set(jnp.where(above, x["htu"], tlU[0]))
            topV = topV.at[0].set(jnp.where(above, x["hv"], topV[0]))
            tlV = tlV.at[0].set(jnp.where(above, x["htv"], tlV[0]))
        predsU = _preds4(8, topU, leftU, tlU, has_top, has_left)
        predsV = _preds4(8, topV, leftV, tlV, has_top, has_left)
        lvu, reconU = _chroma_pipe(x["u"].astype(jnp.int32),
                                   _block(sel_mode(predsU, x["uvm"]), 8), qp_t)
        lvv, reconV = _chroma_pipe(x["v"].astype(jnp.int32),
                                   _block(sel_mode(predsV, x["uvm"]), 8), qp_t)

        rY = rYp
        rU = _unblock(reconU, 8)
        rV = _unblock(reconV, 8)
        new = (rY[:, 15, :], By1, rY[:, :, 15],
               rY[:, 15, 15], Cy1, Cy2,
               rU[:, 7, :], Bu1, rU[:, :, 7], rU[:, 7, 7], Cu1, Cu2,
               rV[:, 7, :], Bv1, rV[:, :, 7], rV[:, 7, 7], Cv1, Cv2)
        lv24 = jnp.concatenate([lv, lvu, lvv], axis=1).astype(jnp.int16)
        return new, (lv24, y2lv.astype(jnp.int16), rY[:, 15, :], rY[:, :, 15],
                     rU[:, 7, :], rV[:, 7, :])

    # Derive the zero carry from the input so its mesh-varying type matches
    # the step outputs under shard_map (scan requires equal carry types).
    z = Y[0, 0] * 0
    zero16 = jnp.zeros((mb_h, 16), jnp.int32) + z
    zero8 = jnp.zeros((mb_h, 8), jnp.int32) + z
    zero1 = jnp.zeros((mb_h,), jnp.int32) + z
    carry0 = (zero16, zero16, zero16, zero1, zero1, zero1,
              zero8, zero8, zero8, zero1, zero1, zero1,
              zero8, zero8, zero8, zero1, zero1, zero1)
    _, (lv_sk, y2_sk, bot_sk, rgt_sk, botu_sk, botv_sk) = jax.lax.scan(
        step, carry0, xs)

    def unskew(c_sk):
        # Inverse shear: out[y, x] = skewed[x + sk*y, y] — transpose to
        # [mb_h, n_steps], pad sk trailing rows' worth of elements, and
        # re-view as [mb_h, n_steps + sk] so column x of row y is flat
        # index y*(n_steps+sk) + x. No gather.
        tail = c_sk.shape[2:]
        c = jnp.swapaxes(c_sk, 0, 1)                   # [mb_h, n_steps, ...]
        flat = c.reshape(mb_h * n_steps, *tail)
        pad_w = [(0, 0)] * flat.ndim
        pad_w[0] = (0, mb_h * sk)
        flat = jnp.pad(flat, pad_w)
        out = flat.reshape(mb_h, n_steps + sk, *tail)[:, :mb_w]
        return out.reshape(mb_h * mb_w, *tail)

    lv24 = unskew(lv_sk)
    y2 = unskew(y2_sk)
    bottom = unskew(bot_sk)
    right = unskew(rgt_sk)
    bottom_u = unskew(botu_sk)
    bottom_v = unskew(botv_sk)
    return lv24, y2, bottom, right, bottom_u, bottom_v


# ---------------------------------------------------------------------------
# Device-side nibble packing (D2H is the scarce resource).
# ---------------------------------------------------------------------------

def _pack_levels(lv24, esc_cap):
    """lv24: int16 [n_mb, 24, 16] -> (packed u8 [n_mb, 24, 8],
    esc_idx i32 [K] block indices, esc_blk i16 [K, 16], esc_cnt i32)."""
    v = lv24.astype(jnp.int32)
    esc = jnp.abs(v) > 7
    nib = jnp.where(esc, 0, jnp.clip(v, -7, 7) + 8).astype(jnp.uint8)
    packed = nib[..., 0::2] | (nib[..., 1::2] << 4)
    blk = esc.any(axis=-1).reshape(-1)                       # [n_mb*24]
    # Stream compaction via sort, not jnp.nonzero: nonzero lowers to
    # cumsum + scatter, and TPU scatters over the 147k-block domain cost
    # ~5x a plain sort of the same keys. Flagged blocks keep their index,
    # unflagged ones get a big sentinel, so the ascending sort moves all
    # escape indices to the front in order (exactly nonzero's output).
    n_blk = blk.shape[0]
    keys = jnp.where(blk, jnp.arange(n_blk, dtype=jnp.int32),
                     jnp.int32(n_blk))
    idx = jax.lax.sort(keys, is_stable=False)[:esc_cap]
    idx = jnp.where(idx >= n_blk, 0, idx)                    # fill_value=0
    blocks = lv24.reshape(-1, 16)[idx]
    return packed, idx, blocks, blk.sum().astype(jnp.int32)


def unpack_levels(packed, esc_idx, esc_blk, esc_cnt, n_mb):
    """Host-side (numpy) inverse of _pack_levels -> int16 [n_mb, 24, 16]."""
    lo = (packed & 0x0F).astype(np.int16)
    hi = (packed >> 4).astype(np.int16)
    nib = np.empty((n_mb, 24, 16), np.int16)
    nib[..., 0::2] = lo
    nib[..., 1::2] = hi
    out = np.where(nib == 0, 0, nib - 8).astype(np.int16)
    cnt = int(esc_cnt)
    if cnt:
        out.reshape(-1, 16)[esc_idx[:cnt]] = esc_blk[:cnt]
    return out


# Field order inside the fetched output blob (see fast_encode_fn's blob
# variants). Fixed so host offsets are static per geometry.
BLOB_ORDER = ("packed", "esc_idx", "esc_val", "esc_cnt", "y2", "modes",
              "uvmodes", "skip", "is_i4", "imodes", "seg_map", "seg_q",
              "seg_beta", "dq_uv")
BLOB_CHUNKS = 4  # parallel fetch streams (the tunnel caps per-stream)


def _u8flat(x):
    """Flat little-endian byte view of a device array (bool stored as u8)."""
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    if x.dtype != jnp.uint8:
        x = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return x.reshape(-1)


def unpack_output_blob(chunks, spec):
    """Host inverse of the device blob packing.

    chunks: the blob-program outputs — BLOB_CHUNKS arrays
    [B, L/BLOB_CHUNKS] u8, plus a trailing esc_cnt [B] i32 that is
    ignored here (the blob already carries it); spec: fn.blob_spec
    {key: (dtype, shape, offset, nbytes)}.
    Returns the same field dict fn()/fn.rgb() would, as numpy [B, ...].
    """
    flat = np.concatenate([np.asarray(c) for c in chunks[:BLOB_CHUNKS]],
                          axis=1)
    B = flat.shape[0]
    out = {}
    for k, (dt, shape, off, nb) in spec.items():
        raw = np.ascontiguousarray(flat[:, off:off + nb])
        out[k] = raw.view(dt).reshape((B,) + shape)
    return out


# ---------------------------------------------------------------------------
# Entry: jitted batched encoder for a fixed geometry.
# ---------------------------------------------------------------------------

def encode_band(Y, U, V, hy, hu, hv, has_above, rt, mb_w, mb_h, esc_cap,
                quality, segments=4, sns_strength=50, i4_blocks=True,
                psum_axis=None, rd_drop=1024.0):
    """One row band of the flagship encoder with cross-band source halos
    (the multi-chip sharding unit): device segmentation (alpha histogram
    all-reduced over `psum_axis` so every band derives the same global
    plan — the ProbaStats-merge analog, reference encode_proba.go:171),
    I16+I4 search and the closed-loop wavefront. Returns the packed
    output dict plus a level histogram (also mesh-reduced by callers)."""
    Y = Y.astype(jnp.int32)
    U = U.astype(jnp.int32)
    V = V.astype(jnp.int32)
    n_mb = mb_w * mb_h
    halos = (hy.astype(jnp.int32), hu.astype(jnp.int32),
             hv.astype(jnp.int32))
    sns = max(0, int(sns_strength))
    if segments > 1:
        alphas, uv_al = _mb_alphas2(Y, U, V, mb_w, mb_h)
        histo = (alphas[None, :] == jnp.arange(256)[:, None]).sum(axis=1)
        uv_sum = uv_al.sum()
        tot_mb = jnp.int32(n_mb)
        if psum_axis is not None:
            histo = jax.lax.psum(histo, psum_axis)
            uv_sum = jax.lax.psum(uv_sum, psum_axis)
            tot_mb = jax.lax.psum(tot_mb, psum_axis)
        seg_map, seg_q, seg_beta = _plan_from_histo(
            histo, alphas, quality, sns_strength, segments)
        guv = uv_sum // tot_mb
        dq = _uv_deltas(guv, sns)
        dq_uv = jnp.stack([jnp.int32(dq[0]), dq[1].astype(jnp.int32)])
        qp_i, lam_i, seg_rows = _mb_quant(seg_map, seg_q, n_mb, dq_uv=dq)
        seg = (seg_map, seg_rows)
        tlsd4, tlsd = _tlsd_from_seg(sns, seg_q, seg_map)
    else:
        qp_i, lam_i = rd_params(quality)
        tlsd4, tlsd = _tlsd_static(sns, lam_i["q_i4"], n_mb)
        lam_i = {k: jnp.float32(v) for k, v in lam_i.items()}
        seg_map = jnp.zeros((n_mb,), jnp.int32)
        seg_q = jnp.zeros((4,), jnp.int32)
        seg_beta = jnp.zeros((4,), jnp.int32)
        dq_uv = jnp.zeros((2,), jnp.int32)
        seg = None
    modes, uvmodes, i16_score = _phase1(Y, U, V, qp_i, lam_i, rt, mb_w, mb_h,
                                        halos=halos, has_above=has_above,
                                        tlsd=tlsd)
    if i4_blocks:
        src_b = _block(Y.reshape(mb_h, 16, mb_w, 16)
                       .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16), 16)
        is_i4, i4_modes, _ = _i4_dispatch(
            Y, src_b, qp_i, lam_i, seg, rt, mb_w, mb_h, i16_score,
            tlsd=tlsd, tlsd4=tlsd4)
        # The band's first MB row predicts from the *source* halo; I4's
        # 4x4 modes lean too hard on exact context there (multi-dB local
        # drift), so the boundary row stays I16 (one row per band).
        boundary = (jnp.arange(n_mb) < mb_w) & jnp.asarray(has_above)
        is_i4 = is_i4 & ~boundary
        i4_ctx = (is_i4, i4_modes)
    else:
        is_i4 = jnp.zeros((n_mb,), bool)
        i4_modes = jnp.zeros((n_mb, 16), jnp.uint8)
        i4_ctx = None
    lv24, y2, _, _, _, _ = _phase2(Y, U, V, modes, uvmodes, qp_i, mb_w,
                                   mb_h, rd_drop=rd_drop, halos=halos,
                                   has_above=has_above, seg=seg, i4=i4_ctx)
    packed, esc_idx, esc_val, esc_cnt = _pack_levels(lv24, esc_cap)
    skip = (lv24 == 0).all(axis=(-2, -1)) & (y2 == 0).all(axis=-1)
    imodes = jnp.where(is_i4[:, None], i4_modes,
                       jnp.concatenate([modes[:, None],
                                        jnp.zeros((n_mb, 15), jnp.uint8)],
                                       axis=1))
    hist = jnp.histogram(jnp.abs(lv24).astype(jnp.int32), bins=16,
                         range=(0, 16))[0]
    return {"packed": packed, "esc_idx": esc_idx, "esc_val": esc_val,
            "esc_cnt": esc_cnt, "y2": y2, "modes": modes,
            "uvmodes": uvmodes, "skip": skip, "is_i4": is_i4,
            "imodes": imodes, "seg_map": seg_map.astype(jnp.uint8),
            "seg_q": seg_q, "seg_beta": seg_beta, "dq_uv": dq_uv,
            "hist": hist}


def fast_encode_fn(mb_w: int, mb_h: int, quality: int, segments: int = 1,
                   sns_strength: int = 0, i4_blocks: bool = True,
                   sharp_yuv: bool = False, rd_drop: float = None,
                   sk: int = 1, trellis: bool = False,
                   i4_mode_search: bool = False):
    if rd_drop is None:  # WEBPTPU_RD_DROP: tuning knob for evals
        rd_drop = float(os.environ.get("WEBPTPU_RD_DROP", 1024.0))
    return _fast_encode_fn(mb_w, mb_h, quality, segments, sns_strength,
                           i4_blocks, sharp_yuv, float(rd_drop), sk,
                           trellis, i4_mode_search)


@functools.lru_cache(maxsize=8)
def _fast_encode_fn(mb_w: int, mb_h: int, quality: int, segments: int = 1,
                    sns_strength: int = 0, i4_blocks: bool = True,
                    sharp_yuv: bool = False, rd_drop: float = 1024.0,
                    sk: int = 1, trellis: bool = False,
                    i4_mode_search: bool = False):
    """Batched two-phase device encoder.

    Returns fn with:
      fn.yuv(Y [B,H,W] u8, U, V) and fn.rgb(rgb [B,H,W,3] u8)
      -> dict(packed, esc_idx, esc_val, esc_cnt, modes, uvmodes, skip,
              seg_map, seg_q, seg_beta)
    With segments > 1 the device also runs the analysis pass (alphas ->
    k-means -> SNS quant modulation) and quantizes per MB segment.
    With sharp_yuv the RGB entry point runs the device SharpYUV refinement
    (ops/sharpyuv.py) instead of the plain 4:2:0 import.
    sk=2 runs the closed loop at the reference's 2-column skew
    (encode_parallel.go:168): ~2x the scan steps, but the full I4 mode
    set is legal on the rightmost subblock column (method >= 5).
    rd_drop enables the trellis-lite RD dropout inside the closed loop
    (ops/quant.py): zero marginal |level|==1 coefficients when their rate
    exceeds the weighted distortion increase. The default 1024 measured
    -2.5% size at -0.06 dB on the benchmark photo (~the host I4 trellis
    trade) for ~3% scan time; 0 disables.
    """
    qp, lambdas = rd_params(quality)
    q_i4_static = lambdas["q_i4"]
    lambdas = {k: jnp.float32(v) for k, v in lambdas.items()}
    rt = RateTables(np.asarray(T.COEFFS_PROBA0))
    n_mb = mb_w * mb_h
    esc_cap = max(1024, ESC_BLOCKS_PER_MB * n_mb)
    use_segments = segments > 1 and n_mb >= 4
    use_planar = not os.environ.get("WEBPTPU_NO_PLANAR")

    def part1(Y, U, V):
        """Per-image phase 0/1/I4 search (vmapped in the batch path)."""
        Y = Y.astype(jnp.int32)
        U = U.astype(jnp.int32)
        V = V.astype(jnp.int32)
        sns = max(0, int(sns_strength))
        if use_segments:
            seg_map, seg_q, seg_beta, guv = _segment_plan_device(
                Y, U, V, mb_w, mb_h, quality, sns_strength, segments)
            dq = _uv_deltas(guv, sns)
            dq_uv = jnp.stack([jnp.int32(dq[0]), dq[1].astype(jnp.int32)])
            qp_i, lam_i, seg_rows = _mb_quant(seg_map, seg_q, n_mb,
                                              dq_uv=dq)
            seg = (seg_map, seg_rows)
            tlsd4, tlsd = _tlsd_from_seg(sns, seg_q, seg_map)
            lam4 = lam_i["i4_seg"]
            lam16_4 = lam_i["i16_seg"]
            lamuv_4 = lam_i["uv_seg"]
        else:
            seg_map = jnp.zeros((n_mb,), jnp.int32)
            seg_q = jnp.zeros((4,), jnp.int32)
            seg_beta = jnp.zeros((4,), jnp.int32)
            dq_uv = jnp.zeros((2,), jnp.int32)
            qp_i, lam_i, seg, seg_rows = qp, lambdas, None, None
            tlsd4, tlsd = _tlsd_static(sns, q_i4_static, n_mb)
            lam4 = lam16_4 = lamuv_4 = jnp.zeros((4,), jnp.float32)
        modes, uvmodes, i16_score = _phase1(Y, U, V, qp_i, lam_i, rt,
                                            mb_w, mb_h, tlsd=tlsd)
        if i4_blocks:
            src_b = _block(Y.reshape(mb_h, 16, mb_w, 16)
                           .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16), 16)
            is_i4, i4_modes, _ = _i4_dispatch(
                Y, src_b, qp_i, lam_i, seg, rt, mb_w, mb_h, i16_score,
                tlsd=tlsd, tlsd4=tlsd4, allow_tr=(sk == 2))
        else:
            is_i4 = jnp.zeros((n_mb,), bool)
            i4_modes = jnp.zeros((n_mb, 16), jnp.uint8)
        return (modes, uvmodes, is_i4, i4_modes,
                seg_map, seg_q, seg_beta, seg_rows, lam4, lam16_4, lamuv_4)

    def part3(lv24, y2, modes, uvmodes, is_i4, i4_modes,
              seg_map, seg_q, seg_beta):
        """Per-image packing of the phase-2 levels (vmapped)."""
        packed, esc_idx, esc_val, esc_cnt = _pack_levels(lv24, esc_cap)
        skip = (lv24 == 0).all(axis=(-2, -1)) & (y2 == 0).all(axis=-1)
        imodes = jnp.where(is_i4[:, None], i4_modes,
                           jnp.concatenate(
                               [modes[:, None],
                                jnp.zeros((n_mb, 15), jnp.uint8)], axis=1))
        return {"packed": packed, "esc_idx": esc_idx, "esc_val": esc_val,
                "esc_cnt": esc_cnt, "y2": y2, "modes": modes,
                "uvmodes": uvmodes, "skip": skip, "is_i4": is_i4,
                "imodes": imodes,
                "seg_map": seg_map.astype(jnp.uint8), "seg_q": seg_q,
                "seg_beta": seg_beta}

    def part1_batched(Yb, Ub, Vb):
        """Planar phase 0/1 over the fused batch x MB lane axis.

        On TPU the I16/UV search runs as the fused Pallas kernel
        (ops/pallas_p1.py — bit-identical to phase1p.phase1_planar,
        which remains the CPU/fallback path); the expensive per-lane
        quant-row/lambda broadcasts exist only for the fallback. The
        Pallas I4 search stays per-image (it consumes the natural-layout
        luma plane)."""
        from . import phase1p as P1

        B = Yb.shape[0]
        L = B * n_mb
        sns = max(0, int(sns_strength))
        tabs, lam_i16_t, lam_uv_t, lam_i4_t, qi4_t = all_q_tables()
        p1_kernel = _pallas_enabled() and not os.environ.get(
            "WEBPTPU_NO_P1K")
        if p1_kernel:
            # Build the kernel's shared src rows once; the alpha kernel
            # and the mode-search kernel both stream them from HBM.
            src_rows = P1.build_src_pallas(Yb, Ub, Vb, mb_w, mb_h)
            srcY, srcU, srcV = src_rows[1]
        else:
            srcY = P1._src_planar(Yb, mb_h, mb_w, 16)
            srcU = P1._src_planar(Ub, mb_h, mb_w, 8)
            srcV = P1._src_planar(Vb, mb_h, mb_w, 8)
            src_rows = None
        if use_segments:
            alphas_k = (P1.alphas_planar_pallas(src_rows[0], B, n_mb,
                                                src_rows[2])
                        if p1_kernel else None)
            seg_map, seg_q, seg_beta, guv = P1.plan_segments_planar(
                srcY, srcU, srcV, B, n_mb, quality, sns_strength, segments,
                alphas=alphas_k)
            dq_dc, dq_ac = _uv_deltas(guv, sns)                 # [B]
            seg_lane = seg_map.reshape(L)
            # Per-image [4seg, 4param, 16] quant rows via one-hot over the
            # 128 quant indices (tiny).
            oh_q = jax.nn.one_hot(seg_q, 128, dtype=jnp.int32)  # [B, 4, 128]
            seg_rows = {}
            qp_rows = {}
            for k in ("y1", "y2", "uv"):
                tab = jnp.asarray(tabs[k].reshape(128, 64), jnp.int32)
                rows = jnp.einsum("bsq,qf->bsf", oh_q, tab)     # [B, 4, 64]
                seg_rows[k] = rows.reshape(B, 4, 4, 16)
                if k == "uv":
                    # UV rows honor the dc/ac deltas (header-signalled;
                    # reference setupSegment, encode.go:1104-1108).
                    seg_rows[k] = _uv_rows_delta(seg_q, dq_dc, dq_ac)
                if p1_kernel:
                    continue
                # [B,4seg,4par,16] -> [4seg,4par,16,L] lane broadcast
                # (fallback only: the kernel selects rows in VMEM).
                r4 = jnp.broadcast_to(
                    seg_rows[k].transpose(1, 2, 3, 0)[..., None],
                    (4, 4, 16, B, n_mb)).reshape(4, 4, 16, L)
                from .planar import _seg_select_p

                qp_rows[k] = tuple(_seg_select_p(r4[:, i], seg_lane)
                                   for i in range(4))

            def lane_of(tab_t):
                segv = (oh_q * jnp.asarray(tab_t, jnp.float32)).sum(axis=2)
                if p1_kernel:
                    return segv, None
                r = jnp.broadcast_to(segv.T[..., None],
                                     (4, B, n_mb)).reshape(4, L)
                from .planar import _seg_select_p

                return segv, _seg_select_p(r, seg_lane)

            lam16_4b, lam16_l = lane_of(lam_i16_t)
            # lam_uv follows the delta-stitched uv quant steps.
            lamuv_4b = _lam_uv_of(seg_rows["uv"])               # [B, 4]
            if p1_kernel:
                lamuv_l = None
            else:
                from .planar import _seg_select_p

                lamuv_l = _seg_select_p(
                    jnp.broadcast_to(lamuv_4b.T[..., None],
                                     (4, B, n_mb)).reshape(4, L), seg_lane)
            lam4_4b, lam4_l = lane_of(lam_i4_t)
            lammd_4b, lammd_l = lane_of(_lam_mode_table(qi4_t))
            lam_l = {"i16": lam16_l, "uv": lamuv_l, "mode": lammd_l}
            if sns > 0:
                qi4_seg = jnp.take(jnp.asarray(qi4_t, jnp.int32), seg_q)
                tlsd4 = ((sns * qi4_seg) >> 5).astype(jnp.float32)  # [B, 4]
                if p1_kernel:
                    tlsd_l = None
                else:
                    from .planar import _seg_select_p

                    tlsd_l = _seg_select_p(
                        jnp.broadcast_to(tlsd4.T[..., None],
                                         (4, B, n_mb)).reshape(4, L),
                        seg_lane)
            else:
                tlsd4, tlsd_l = None, None
            dq_uv_b = jnp.stack([jnp.full((B,), dq_dc, jnp.int32),
                                 dq_ac.astype(jnp.int32)], axis=1)
        else:
            dq_uv_b = jnp.zeros((B, 2), jnp.int32)
            seg_map = jnp.zeros((B, n_mb), jnp.int32)
            seg_q = jnp.zeros((B, 4), jnp.int32)
            seg_beta = jnp.zeros((B, 4), jnp.int32)
            seg_rows = None
            qp_rows = {k: tuple(jnp.asarray(a, jnp.int32).reshape(16, 1)
                                for a in qp[k]) for k in ("y1", "y2", "uv")}
            lam_l = {"i16": lambdas["i16"], "uv": lambdas["uv"],
                     "mode": lambdas["mode"]}
            tlsd4_s, tlsd_s = _tlsd_static(sns, q_i4_static, n_mb)
            tlsd4 = (jnp.broadcast_to(tlsd4_s, (B, 4))
                     if tlsd4_s is not None else None)
            tlsd_l = tlsd_s
            lam4_4b = jnp.broadcast_to(
                jnp.full((4,), lambdas["i4"], jnp.float32), (B, 4))
            lam16_4b = jnp.broadcast_to(
                jnp.full((4,), lambdas["i16"], jnp.float32), (B, 4))
            lamuv_4b = jnp.broadcast_to(
                jnp.full((4,), lambdas["uv"], jnp.float32), (B, 4))
            lammd_4b = jnp.broadcast_to(
                jnp.full((4,), lambdas["mode"], jnp.float32), (B, 4))
        if p1_kernel:
            if use_segments:
                qtabs = jnp.stack([seg_rows[k] for k in ("y1", "y2", "uv")],
                                  axis=1).reshape(B, 48, 16)
            else:
                one = np.stack([np.stack([np.asarray(qp[k][i], np.int32)
                                          .reshape(16) for i in range(4)])
                                for k in ("y1", "y2", "uv")])
                qtabs = jnp.broadcast_to(
                    jnp.asarray(np.repeat(one[:, None], 4, axis=1)
                                .reshape(48, 16)), (B, 48, 16))
            modes, uvmodes, i16_score = P1.phase1_planar_pallas(
                Yb, Ub, Vb, qtabs, lam16_4b, lamuv_4b, tlsd4, seg_map,
                rt, mb_w, mb_h, src_rows=src_rows, lam_mode4=lammd_4b)
        else:
            modes, uvmodes, i16_score = P1.phase1_planar(
                Yb, Ub, Vb, qp_rows, lam_l, rt, mb_w, mb_h, tlsd=tlsd_l,
                srcs=(srcY, srcU, srcV))
        if i4_blocks:
            pallas_on = _pallas_enabled() and sk != 2

            def i4_one(Y, i16s, seg_m, seg_q_i, seg_r, lam4_b, lammd_b,
                       tlsd4_b):
                Y = Y.astype(jnp.int32)
                src_b = _block(Y.reshape(mb_h, 16, mb_w, 16)
                               .transpose(0, 2, 1, 3)
                               .reshape(n_mb, 16, 16), 16)
                t4 = tlsd4_b if sns > 0 else None
                if use_segments and pallas_on:
                    seg_i = (seg_m, {"y1": seg_r})
                    lam_i = {"i4_seg": lam4_b, "mode_seg": lammd_b}
                    qp_i, tl = None, None
                elif use_segments:
                    # jnp fallback (CPU / skew-2): per-MB quant rows.
                    qp_i, lam_i, srows = _mb_quant(seg_m, seg_q_i, n_mb)
                    seg_i = (seg_m, srows)
                    tl = (_seg_select(tlsd4_b, seg_m) if sns > 0 else None)
                else:
                    seg_i, qp_i, lam_i = None, qp, lambdas
                    tl = (jnp.float32(tlsd4_b[0]) if sns > 0 else None)
                return _i4_dispatch(Y, src_b, qp_i, lam_i, seg_i, rt, mb_w,
                                    mb_h, i16s, tlsd=tl, tlsd4=t4,
                                    allow_tr=(sk == 2))[:2]
            is_i4, i4_modes = jax.vmap(i4_one)(
                Yb, i16_score, seg_map, seg_q,
                (seg_rows["y1"] if use_segments
                 else jnp.zeros((B, 4, 4, 16), jnp.int32)),
                lam4_4b, lammd_4b,
                (tlsd4 if tlsd4 is not None
                 else jnp.zeros((B, 4), jnp.float32)))
        else:
            is_i4 = jnp.zeros((B, n_mb), bool)
            i4_modes = jnp.zeros((B, n_mb, 16), jnp.uint8)
        return (modes, uvmodes, is_i4, i4_modes, seg_map, seg_q, seg_beta,
                seg_rows, lam4_4b, lam16_4b, lamuv_4b, lammd_4b, dq_uv_b)

    def encode_batch(Yb, Ub, Vb):
        """Batched encoder: planar phase 0/1 (ops/phase1p.py), then the
        phase-2 wavefront — the fused Pallas scan kernel with in-kernel
        nibble packing on TPU (ops/pallas_p2.py), the planar jnp scan
        (ops/planar.py — bit-identical) elsewhere or for the search/
        trellis/skew-2 configurations the kernel does not cover."""
        from . import planar as PL

        (modes, uvmodes, is_i4, i4_modes, seg_map, seg_q, seg_beta,
         seg_rows, lam4, lam16_4, lamuv_4, lammd_4, dq_uv_b) = \
            part1_batched(Yb, Ub, Vb)
        seg = (seg_map, seg_rows) if use_segments else None
        i4_ctx = (is_i4, i4_modes) if i4_blocks else None
        search = None
        if i4_mode_search and i4_blocks:
            # 4th element switches on the closed-loop UV mode search too;
            # 5th is the split-decision lambda (reference LambdaMode).
            search = ((rt, lam4, lam16_4, lamuv_4, lammd_4) if use_segments
                      else (rt, lambdas["i4"], lambdas["i16"],
                            lambdas["uv"], lambdas["mode"]))
        # The P2 grid kernel is bit-identical to the planar scan but
        # measured SLOWER on v5e (378 vs 463 Mpx/s at the bench shape:
        # its sequential grid serializes DMA waves the scan overlaps),
        # so it is opt-in until it beats the scan.
        p2_kernel = (_pallas_enabled() and sk == 1 and not trellis
                     and search is None
                     and bool(os.environ.get("WEBPTPU_P2K")))
        if p2_kernel:
            from . import pallas_p2 as P2

            wire = P2.phase2_pack_pallas(
                Yb, Ub, Vb, modes, uvmodes, qp, mb_w, mb_h,
                rd_drop=rd_drop, seg=seg, i4=i4_ctx, esc_cap=esc_cap)
            B = Yb.shape[0]
            imodes = jnp.where(
                is_i4[..., None], i4_modes,
                jnp.concatenate([modes[..., None],
                                 jnp.zeros((B, n_mb, 15), jnp.uint8)],
                                axis=-1))
            return dict(wire,
                        modes=modes, uvmodes=uvmodes, is_i4=is_i4,
                        imodes=imodes, seg_map=seg_map.astype(jnp.uint8),
                        seg_q=seg_q, seg_beta=seg_beta, dq_uv=dq_uv_b)
        # (pack_wire_planar — packing in the scan's skewed layout — was
        # measured 1.7x SLOWER than unskew + _pack_levels at the B=128
        # bench shape: its per-image escape-lid sort runs over the padded
        # T*24*mb_h domain and its row gathers scalarize. The unskewed
        # path stays.)
        out = PL.phase2_planar(
            Yb, Ub, Vb, modes, uvmodes, qp, mb_w, mb_h,
            rd_drop=rd_drop, seg=seg, i4=i4_ctx, sk=sk, trellis=trellis,
            i4_search=search)
        lv24, y2 = out[0], out[1]
        if search is not None:
            i4_modes, is_i4 = out[4], out[5]
            uvmodes = out[6]
        res = jax.vmap(part3)(lv24, y2, modes, uvmodes, is_i4, i4_modes,
                              seg_map, seg_q, seg_beta)
        res["dq_uv"] = dq_uv_b
        return res

    def encode_one(Y, U, V):
        Y = Y.astype(jnp.int32)
        U = U.astype(jnp.int32)
        V = V.astype(jnp.int32)
        sns = max(0, int(sns_strength))
        if use_segments:
            seg_map, seg_q, seg_beta, guv = _segment_plan_device(
                Y, U, V, mb_w, mb_h, quality, sns_strength, segments)
            dq = _uv_deltas(guv, sns)
            dq_uv = jnp.stack([jnp.int32(dq[0]), dq[1].astype(jnp.int32)])
            qp_i, lam_i, seg_rows = _mb_quant(seg_map, seg_q, n_mb,
                                              dq_uv=dq)
            seg = (seg_map, seg_rows)
            tlsd4, tlsd = _tlsd_from_seg(sns, seg_q, seg_map)
        else:
            seg_map = jnp.zeros((n_mb,), jnp.int32)
            seg_q = jnp.zeros((4,), jnp.int32)
            seg_beta = jnp.zeros((4,), jnp.int32)
            dq_uv = jnp.zeros((2,), jnp.int32)
            qp_i, lam_i, seg = qp, lambdas, None
            tlsd4, tlsd = _tlsd_static(sns, q_i4_static, n_mb)
        modes, uvmodes, i16_score = _phase1(Y, U, V, qp_i, lam_i, rt,
                                            mb_w, mb_h, tlsd=tlsd)
        if i4_blocks:
            src_b = _block(Y.reshape(mb_h, 16, mb_w, 16)
                           .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16), 16)
            is_i4, i4_modes, _ = _i4_dispatch(
                Y, src_b, qp_i, lam_i, seg, rt, mb_w, mb_h, i16_score,
                tlsd=tlsd, tlsd4=tlsd4, allow_tr=(sk == 2))
            i4_ctx = (is_i4, i4_modes)
        else:
            is_i4 = jnp.zeros((n_mb,), bool)
            i4_modes = jnp.zeros((n_mb, 16), jnp.uint8)
            i4_ctx = None
        lv24, y2, bottom, right, _, _ = _phase2(
            Y, U, V, modes, uvmodes, qp_i, mb_w, mb_h, rd_drop=rd_drop,
            seg=seg, i4=i4_ctx, sk=sk)
        packed, esc_idx, esc_val, esc_cnt = _pack_levels(lv24, esc_cap)
        skip = (lv24 == 0).all(axis=(-2, -1)) & (y2 == 0).all(axis=-1)
        imodes = jnp.where(is_i4[:, None], i4_modes,
                           jnp.concatenate(
                               [modes[:, None],
                                jnp.zeros((n_mb, 15), jnp.uint8)], axis=1))
        return {"packed": packed, "esc_idx": esc_idx, "esc_val": esc_val,
                "esc_cnt": esc_cnt, "y2": y2, "modes": modes,
                "uvmodes": uvmodes, "skip": skip, "is_i4": is_i4,
                "imodes": imodes,
                "seg_map": seg_map.astype(jnp.uint8), "seg_q": seg_q,
                "seg_beta": seg_beta, "dq_uv": dq_uv}

    def to_yuv(rgb):
        if sharp_yuv:
            from . import sharpyuv as devsharp

            return devsharp.sharp_yuv420(rgb)
        from . import yuv as devyuv

        return devyuv.rgb_to_yuv420(rgb)

    def to_yuv_planar(rgbp):
        """rgbp: [3, H, W] u8 planes. Planar upload sidesteps the
        channel-last de-interleave (~2/3 of the import cost on TPU)."""
        if sharp_yuv:
            from . import sharpyuv as devsharp

            return devsharp.sharp_yuv420(jnp.stack(
                [rgbp[0], rgbp[1], rgbp[2]], axis=-1))
        from . import yuv as devyuv

        return devyuv.rgb_planes_to_yuv420(rgbp[0], rgbp[1], rgbp[2])

    if use_planar:
        yuv_b = jax.jit(encode_batch)

        def rgb_batch(rgbs):
            Y, U, V = jax.vmap(to_yuv)(rgbs)
            return encode_batch(Y, U, V)

        def rgbp_batch(rgbps):
            Y, U, V = jax.vmap(to_yuv_planar)(rgbps)
            return encode_batch(Y, U, V)

        rgb_b = jax.jit(rgb_batch)
    else:
        yuv_b = jax.jit(jax.vmap(encode_one))
        rgb_b = jax.jit(jax.vmap(lambda rgb: encode_one(*to_yuv(rgb))))

        def rgbp_batch(rgbps):
            return jax.vmap(lambda p: encode_one(*to_yuv_planar(p)))(rgbps)

    # Blob variants: every output field bitcast to bytes and concatenated
    # into BLOB_CHUNKS equal uint8 arrays, so the host pays one fetch wave
    # (the tunnel costs ~27 ms *per array* round-trip; the dict form is 13
    # arrays = two serialized waves of latency). Chunks — not one array —
    # because the link also caps out per-stream. unpack_output_blob() is
    # the host inverse; values are bit-identical to the dict form.
    # The trailing esc_cnt output is a direct tiny buffer: fetching it
    # alone synchronizes the whole program without pulling a chunk
    # (jax.block_until_ready returns early on the axon tunnel platform).
    def _blobify(out):
        blob = jnp.concatenate([_u8flat(out[k]) for k in BLOB_ORDER])
        pad = (-blob.size) % BLOB_CHUNKS
        blob = jnp.pad(blob, (0, pad)).reshape(BLOB_CHUNKS, -1)
        return tuple(blob[i] for i in range(BLOB_CHUNKS)) + (out["esc_cnt"],)

    if use_planar:
        blob_b = jax.jit(
            lambda Y, U, V: jax.vmap(_blobify)(encode_batch(Y, U, V)))
        rgb_blob_b = jax.jit(
            lambda rgbs: jax.vmap(_blobify)(rgb_batch(rgbs)))
    else:
        blob_b = jax.jit(
            jax.vmap(lambda Y, U, V: _blobify(encode_one(Y, U, V))))
        rgb_blob_b = jax.jit(
            jax.vmap(lambda rgb: _blobify(encode_one(*to_yuv(rgb)))))
    rgbp_blob_b = jax.jit(
        lambda rgbps: jax.vmap(_blobify)(rgbp_batch(rgbps)))

    shapes = jax.eval_shape(
        encode_one,
        jax.ShapeDtypeStruct((mb_h * 16, mb_w * 16), jnp.uint8),
        jax.ShapeDtypeStruct((mb_h * 8, mb_w * 8), jnp.uint8),
        jax.ShapeDtypeStruct((mb_h * 8, mb_w * 8), jnp.uint8))
    spec, off = {}, 0
    for k in BLOB_ORDER:
        dt = np.dtype(shapes[k].dtype)
        nb = int(np.prod(shapes[k].shape, dtype=np.int64)) * dt.itemsize
        spec[k] = (dt, tuple(shapes[k].shape), off, nb)
        off += nb

    yuv_b.rgb = rgb_b
    yuv_b.blob = blob_b
    yuv_b.rgbp_blob = rgbp_blob_b
    # Stage handles for scripts/profile_phases.py (not used in production).
    yuv_b.part1 = jax.jit(part1_batched if use_planar
                          else jax.vmap(part1))
    yuv_b.rgb_blob = rgb_blob_b
    yuv_b.blob_spec = spec
    yuv_b.n_mb = n_mb
    yuv_b.esc_cap = esc_cap
    yuv_b.sharp_yuv = bool(sharp_yuv)
    return yuv_b
