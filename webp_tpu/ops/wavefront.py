"""Device wavefront VP8 encoder (JAX): the flagship TPU kernel.

The intra-prediction dependency (left, top, top-right reconstructed
neighbors) makes VP8 mode decision a wavefront. The reference parallelizes
it with a goroutine row pipeline and a 2-column skew
(encode_parallel.go:168-341, rowSync.waitFor(y-1, x+2)). Here the same
schedule becomes a lax.scan over skewed diagonals t = mb_x + 2*mb_y: all
MBs on a diagonal are independent and run as one vectorized batch (VPU
lanes), with reconstructed context flowing through compact ring buffers
(top row / left column / top-left corner) instead of halo arrays.

Exact-integer parity with the host encoder (webp_tpu/lossy/encode.py) for
the I16 + chroma path: identical mode decisions, levels, contexts, and
therefore identical bitstreams after host entropy coding.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.cost import (
    ENTROPY_COST, LEVEL_FIXED_COSTS, compute_level_cost_tables,
)
from ..lossy.encode import FIXED_COSTS_I16, FIXED_COSTS_UV
from . import dct
from .quant import quantize

ZIGZAG = np.asarray(T.ZIGZAG)
BANDS = np.asarray(T.BANDS[:16])
BANDS_NEXT = np.asarray(list(T.BANDS[1:16]) + [0])  # band of n+1 (n<15)


def _bit_cost_arrays(proba: np.ndarray):
    """p0-related cost constants per (type, band, ctx)."""
    ec = np.asarray(ENTROPY_COST)
    p0 = proba[..., 0].astype(np.int64)  # [4,8,3]
    cost_bit1_p0 = ec[255 - p0]
    cost_bit0_p0 = ec[p0]
    return cost_bit1_p0, cost_bit0_p0


@dataclass
class WavefrontTables:
    """Device constants derived from the probability table + quantizers."""

    level_cost: jnp.ndarray     # [4, 8, 3, 68]
    fixed_cost: jnp.ndarray     # [2048]
    cost1_p0: jnp.ndarray       # [4, 8, 3]
    cost0_p0: jnp.ndarray       # [4, 8, 3]
    bands: jnp.ndarray          # [16]
    y1: tuple
    y2: tuple
    uv: tuple
    lambda_i16: int
    lambda_uv: int
    lambda_mode: int


def make_tables(proba: np.ndarray, qp, lambdas) -> WavefrontTables:
    c1, c0 = _bit_cost_arrays(proba)
    return WavefrontTables(
        level_cost=jnp.asarray(compute_level_cost_tables(proba), jnp.int32),
        fixed_cost=jnp.asarray(LEVEL_FIXED_COSTS, jnp.int32),
        cost1_p0=jnp.asarray(c1, jnp.int32),
        cost0_p0=jnp.asarray(c0, jnp.int32),
        bands=jnp.asarray(BANDS, jnp.int32),
        y1=qp["y1"], y2=qp["y2"], uv=qp["uv"],
        lambda_i16=lambdas["i16"], lambda_uv=lambdas["uv"],
        lambda_mode=lambdas["mode"],
    )


# ---------------------------------------------------------------------------
# Rate model (vectorized GetResidualCost).
# ---------------------------------------------------------------------------

def residual_cost_vec(levels, first, ctx0, ptype, tb: WavefrontTables):
    """Rate of blocks of zigzag levels.

    levels: int32 [..., 16]; first: 0/1 scalar; ctx0: int32 [...];
    ptype: scalar. Returns int32 [...].
    """
    v = jnp.abs(levels)
    idx = jnp.arange(16)
    nzv = (v != 0) & (idx >= first)
    has_any = nzv.any(axis=-1)
    # Index of the last nonzero coefficient.
    last = 15 - jnp.argmax(nzv[..., ::-1], axis=-1)
    last = jnp.where(has_any, last, 0)

    # Per-position context: position `first` uses ctx0; n>first uses
    # clip(|level[n-1]|, 0, 2).
    prev_v = jnp.concatenate([jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)
    ctx_n = jnp.minimum(prev_v, 2)
    ctx_n = jnp.where(idx == first, ctx0[..., None], ctx_n)

    # Level-cost lookup as a one-hot matmul (TPU: gathers are slow, the MXU
    # is free). Combined table per position: lc[band[n], ctx, v] + fixed[v],
    # with v clamped to 67 — levels > 67 get a slightly underestimated rate
    # in the device RD search only (emission rates stay exact; such levels
    # are vanishingly rare at practical qualities).
    lc = tb.level_cost[ptype]  # [8, 3, 68]
    comb = (lc[tb.bands] + tb.fixed_cost[:68][None, None, :])  # [16, 3, 68]
    comb = comb.reshape(16, 3 * 68).astype(jnp.float32)
    vc = jnp.minimum(v, 67)
    oh = jax.nn.one_hot(ctx_n * 68 + vc, 3 * 68, dtype=jnp.float32)
    cost_n = jnp.einsum("...ns,ns->...n", oh, comb).astype(jnp.int32)
    in_run = (idx >= first) & (idx <= last[..., None])
    total = jnp.where(in_run, cost_n, 0).sum(axis=-1)

    # ctx0==0 pays the "has coefficients" bit explicitly.
    b_first = int(T.BANDS[first])
    extra = jnp.where(ctx0 == 0, tb.cost1_p0[ptype, b_first, 0], 0)
    # EOB after the last coefficient (when last < 15).
    last_v = jnp.take_along_axis(v, last[..., None], axis=-1)[..., 0]
    eob_ctx = jnp.where(last_v == 1, 1, 2)
    nb = tb.bands[jnp.minimum(last + 1, 15)]
    eob = jnp.where(last < 15, tb.cost0_p0[ptype, nb, eob_ctx], 0)
    empty_cost = tb.cost0_p0[ptype, b_first, ctx0]
    return jnp.where(has_any, total + extra + eob, empty_cost)


# ---------------------------------------------------------------------------
# Predictions (batched over lanes).
# ---------------------------------------------------------------------------

def _pred4(size, top, left, tl, has_top, has_left):
    """Returns [L, 4, size, size] predictions for modes DC/TM/V/H with
    border handling (checkMode semantics). top/left: [L, size], tl: [L]."""
    L = top.shape[0]
    shift = 5 if size == 16 else 4
    top_m = jnp.where(has_top[:, None], top, 127)
    left_m = jnp.where(has_left[:, None], left, 129)
    tl_m = jnp.where(has_top & has_left, tl,
                     jnp.where(has_top, 129, 127))
    # DC with variants.
    sum_t = top_m.sum(axis=-1)
    sum_l = left_m.sum(axis=-1)
    dc_both = (sum_t + sum_l + size) >> shift
    dc_t = (sum_t + (size >> 1)) >> (shift - 1)
    dc_l = (sum_l + (size >> 1)) >> (shift - 1)
    dc = jnp.where(has_top & has_left, dc_both,
                   jnp.where(has_top, dc_t,
                             jnp.where(has_left, dc_l, 0x80)))
    pred_dc = jnp.broadcast_to(dc[:, None, None], (L, size, size))
    pred_v = jnp.broadcast_to(top_m[:, None, :], (L, size, size))
    pred_h = jnp.broadcast_to(left_m[:, :, None], (L, size, size))
    pred_tm = jnp.clip(
        left_m[:, :, None] + top_m[:, None, :] - tl_m[:, None, None], 0, 255)
    # Mode order: DC=0, TM=1, V=2, H=3 (libwebp numbering).
    return jnp.stack([pred_dc, pred_tm, pred_v, pred_h], axis=1)


def _blocks(x, size):
    """[L, M, S, S] -> [L, M, nb, 4, 4] raster blocks (nb = (S/4)^2)."""
    L, M, S, _ = x.shape
    b = S // 4
    x = x.reshape(L, M, b, 4, b, 4)
    x = jnp.moveaxis(x, 4, 3)
    return x.reshape(L, M, b * b, 4, 4)


def _unblocks(x, size):
    L = x.shape[0]
    b = size // 4
    x = x.reshape(L, b, b, 4, 4)
    x = jnp.moveaxis(x, 2, 3)
    return x.reshape(L, size, size)


# ---------------------------------------------------------------------------
# Batched diagonal step. All tensors carry a leading lane axis L.
# ---------------------------------------------------------------------------

def _i16_rd(src_b, top, left, tl, has_top, has_left, tnz, lnz, tdc, ldc, tb):
    """I16 RD for a batch of MBs. src_b: [L, 16, 4, 4]. Returns decisions."""
    L = src_b.shape[0]
    preds = _pred4(16, top, left, tl, has_top, has_left)   # [L, 4, 16, 16]
    pred_b = _blocks(preds, 16)                            # [L, 4, 16, 4, 4]
    coeffs = dct.fdct4x4(src_b[:, None], pred_b)
    flat = coeffs.reshape(L, 4, 16, 16)
    wht = dct.fwht4x4(flat[..., 0].reshape(L, 4, 4, 4)).reshape(L, 4, 16)
    y2_lv, y2_dq = quantize(wht, *tb.y2, ZIGZAG)
    rec_dcs = dct.wht4x4(y2_dq.reshape(L, 4, 4, 4)).reshape(L, 4, 16)
    lv, dq = quantize(flat, *tb.y1, ZIGZAG, first=1)
    dq = dq.at[..., 0].set(rec_dcs)
    recon = jnp.clip(pred_b + dct.idct4x4(dq.reshape(L, 4, 16, 4, 4)), 0, 255)
    disto = ((src_b[:, None] - recon) ** 2).sum(axis=(2, 3, 4))  # [L, 4]

    y2_rate = residual_cost_vec(y2_lv, 0, (tdc + ldc)[:, None].repeat(4, 1), 1, tb)
    nzb = (lv[..., 1:] != 0).any(axis=-1).astype(jnp.int32)      # [L, 4, 16]
    nzg = nzb.reshape(L, 4, 4, 4)                                # [L, m, by, bx]
    tnz_bits = jnp.stack([(tnz >> x) & 1 for x in range(4)], -1).astype(jnp.int32)
    lnz_bits = jnp.stack([(lnz >> y) & 1 for y in range(4)], -1).astype(jnp.int32)
    top_ctx = jnp.concatenate(
        [jnp.broadcast_to(tnz_bits[:, None, None, :], (L, 4, 1, 4)),
         nzg[:, :, :-1, :]], axis=2)
    left_ctx = jnp.concatenate(
        [jnp.broadcast_to(lnz_bits[:, None, :, None], (L, 4, 4, 1)),
         nzg[:, :, :, :-1]], axis=3)
    ctx0 = (top_ctx + left_ctx).reshape(L, 4, 16)
    rate = residual_cost_vec(lv, 1, ctx0, 0, tb).sum(axis=-1)    # [L, 4]
    rate = rate + y2_rate + jnp.asarray(FIXED_COSTS_I16, jnp.int32)[None, :]
    # float32 scores: rate*lambda + 256*disto can exceed int32 (the host uses
    # arbitrary-precision ints); near-ties may resolve differently, which
    # only affects mode choice, never bitstream validity.
    score = (rate.astype(jnp.float32) * float(tb.lambda_i16)
             + 256.0 * disto.astype(jnp.float32))
    best = jnp.argmin(score, axis=-1)                            # [L]

    def pick(a):
        return jnp.take_along_axis(
            a, best.reshape((L,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]

    recon_best = _unblocks(pick(recon), 16)
    return {
        "mode": best.astype(jnp.uint8),
        "lv": pick(lv),
        "y2_lv": pick(y2_lv),
        "recon": recon_best,
        "nzg": pick(nzg),                                        # [L, 4, 4]
        "y2_nz": (pick(y2_lv) != 0).any(axis=-1).astype(jnp.int32),
    }


def _uv_rd(src_u, src_v, tu, lu, tlu, tv, lv_, tlv, has_top, has_left,
           tnz, lnz, tb):
    """Chroma RD: [L, 8, 8] planes -> best joint mode + levels."""
    L = src_u.shape[0]
    pu = _pred4(8, tu, lu, tlu, has_top, has_left)   # [L, 4, 8, 8]
    pv = _pred4(8, tv, lv_, tlv, has_top, has_left)
    out = {}
    rate_total = jnp.broadcast_to(
        jnp.asarray(FIXED_COSTS_UV, jnp.int32)[None, :], (L, 4)).astype(jnp.int32)
    disto_total = jnp.zeros((L, 4), jnp.int32)
    per_plane = []
    for (src, preds, ch) in ((src_u, pu, 0), (src_v, pv, 2)):
        sb = _blocks(src[:, None].repeat(4, 1), 8)               # [L, 4, 4, 4, 4]
        pb = _blocks(preds, 8)
        co = dct.fdct4x4(sb, pb).reshape(L, 4, 4, 16)
        lv, dq = quantize(co, *tb.uv, ZIGZAG)
        recon = jnp.clip(pb + dct.idct4x4(dq.reshape(L, 4, 4, 4, 4)), 0, 255)
        disto_total = disto_total + ((sb - recon) ** 2).sum(axis=(2, 3, 4))
        nzb = (lv != 0).any(axis=-1).astype(jnp.int32).reshape(L, 4, 2, 2)
        tnz_bits = jnp.stack([(tnz >> (4 + ch + x)) & 1 for x in range(2)],
                             -1).astype(jnp.int32)
        lnz_bits = jnp.stack([(lnz >> (4 + ch + y)) & 1 for y in range(2)],
                             -1).astype(jnp.int32)
        top_ctx = jnp.concatenate(
            [jnp.broadcast_to(tnz_bits[:, None, None, :], (L, 4, 1, 2)),
             nzb[:, :, :-1, :]], axis=2)
        left_ctx = jnp.concatenate(
            [jnp.broadcast_to(lnz_bits[:, None, :, None], (L, 4, 2, 1)),
             nzb[:, :, :, :-1]], axis=3)
        ctx0 = (top_ctx + left_ctx).reshape(L, 4, 4)
        rate_total = rate_total + residual_cost_vec(lv, 0, ctx0, 2, tb).sum(-1)
        per_plane.append((lv, recon, nzb))
    score = (rate_total.astype(jnp.float32) * float(tb.lambda_uv)
             + 256.0 * disto_total.astype(jnp.float32))
    best = jnp.argmin(score, axis=-1)

    def pick(a):
        return jnp.take_along_axis(
            a, best.reshape((L,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]

    out["uvmode"] = best.astype(jnp.uint8)
    out["lv_u"] = pick(per_plane[0][0])
    out["lv_v"] = pick(per_plane[1][0])
    out["rec_u"] = _unblocks(pick(per_plane[0][1]), 8)
    out["rec_v"] = _unblocks(pick(per_plane[1][1]), 8)
    out["nz_u"] = pick(per_plane[0][2])   # [L, 2, 2]
    out["nz_v"] = pick(per_plane[1][2])
    return out


def wavefront_encode_fn(mb_w: int, mb_h: int, quality: int):
    """Builds the jitted wavefront encoder for a fixed frame geometry.

    Returns fn(srcY [H,W] u8, srcU, srcV) -> dict of per-MB decision arrays
    (levels/y2/modes/uvmode/skip), bit-compatible with the host encoder.
    """
    from .pipeline import quant_params
    from ..lossy.encode import VP8Encoder, LossyConfig
    from ..lossy import tables as TT

    qp = quant_params(quality)
    # Lambdas identical to VP8Encoder.__init__.
    from ..lossy.encode import quality_to_qindex
    q = quality_to_qindex(quality)
    dc_t, ac_t, ac2_t = TT.DC_TABLE, TT.AC_TABLE, TT.AC_TABLE2
    clip = lambda v, m: max(0, min(m, v))
    y1dc, y1ac = int(dc_t[q]), int(ac_t[q])
    y2dc = max(8, int(dc_t[q]) * 2)
    q_i4 = (y1dc + 15 * y1ac + 8) >> 4
    q_i16 = (y2dc + 15 * int(ac2_t[q]) + 8) >> 4
    q_uv = (int(dc_t[clip(q, 117)]) + 15 * int(ac_t[q]) + 8) >> 4
    lambdas = {
        "i16": max(3 * q_i16 * q_i16, 1),
        "uv": max((3 * q_uv * q_uv) >> 6, 1),
        "mode": max((1 * q_i4 * q_i4) >> 7, 1),
    }
    tb = make_tables(np.asarray(T.COEFFS_PROBA0), qp, lambdas)

    n_mb = mb_w * mb_h
    Lmax = min(mb_h, mb_w // 2 + 1)
    n_steps = mb_w + 2 * mb_h - 2
    lanes = np.arange(Lmax)

    def step(carry, t):
        (top_y, left_y, tl_y, top_u, left_u, tl_u, top_v, left_v, tl_v,
         top_nz, left_nz, top_dc, left_dc,
         out_lv, out_y2, out_modes, out_uv, out_skip, srcYb, srcUb, srcVb) = carry

        # The diagonal's valid row window slides: y in [ceil((t-mbW+1)/2), t//2].
        y0 = jnp.maximum(0, (t - mb_w + 2) // 2)
        ys = y0 + lanes
        xs = t - 2 * ys
        valid = (xs >= 0) & (xs < mb_w) & (ys < mb_h)
        xs_c = jnp.clip(xs, 0, mb_w - 1)
        mb = ys * mb_w + xs_c
        has_top = ys > 0
        has_left = xs_c > 0

        src_b = srcYb[mb]                      # [L, 16, 4, 4]
        top = top_y[xs_c]
        left = left_y[ys]
        tl = tl_y[xs_c, ys & 1]
        tnz = jnp.where(has_top, top_nz[xs_c], 0)
        lnz = jnp.where(has_left, left_nz[ys], 0)
        tdc = jnp.where(has_top, top_dc[xs_c], 0)
        ldc = jnp.where(has_left, left_dc[ys], 0)

        d16 = _i16_rd(src_b, top, left, tl, has_top, has_left,
                      tnz, lnz, tdc, ldc, tb)
        duv = _uv_rd(srcUb[mb].reshape(-1, 8, 8), srcVb[mb].reshape(-1, 8, 8),
                     top_u[xs_c], left_u[ys], tl_u[xs_c, ys & 1],
                     top_v[xs_c], left_v[ys], tl_v[xs_c, ys & 1],
                     has_top, has_left, tnz, lnz, tb)

        skip = ((d16["lv"] == 0).all(axis=(1, 2))
                & (d16["y2_lv"] == 0).all(axis=1)
                & (duv["lv_u"] == 0).all(axis=(1, 2))
                & (duv["lv_v"] == 0).all(axis=(1, 2)))

        # Context packing (verified against the host token walker).
        def pack(nzg, nz_u, nz_v, axis):
            if axis == "t":  # bottom row / bottom chroma row
                y4 = sum((nzg[:, 3, c] << c) for c in range(4))
                u2 = (nz_u[:, 1, 0] << 4) | (nz_u[:, 1, 1] << 5)
                v2 = (nz_v[:, 1, 0] << 6) | (nz_v[:, 1, 1] << 7)
            else:  # right column
                y4 = sum((nzg[:, r, 3] << r) for r in range(4))
                u2 = (nz_u[:, 0, 1] << 4) | (nz_u[:, 1, 1] << 5)
                v2 = (nz_v[:, 0, 1] << 6) | (nz_v[:, 1, 1] << 7)
            return (y4 | u2 | v2).astype(jnp.uint32)

        new_tnz = pack(d16["nzg"], duv["nz_u"], duv["nz_v"], "t")
        new_lnz = pack(d16["nzg"], duv["nz_u"], duv["nz_v"], "l")

        # Scatter context updates ('drop' discards invalid lanes).
        drop_x = jnp.where(valid, xs_c, mb_w + 1)
        drop_y = jnp.where(valid, ys, mb_h + 1)
        top_y = top_y.at[drop_x].set(d16["recon"][:, 15, :], mode="drop")
        left_y = left_y.at[drop_y].set(d16["recon"][:, :, 15], mode="drop")
        tl_y = tl_y.at[jnp.where(valid, xs_c + 1, mb_w + 2), (ys + 1) & 1].set(
            d16["recon"][:, 15, 15], mode="drop")
        top_u = top_u.at[drop_x].set(duv["rec_u"][:, 7, :], mode="drop")
        left_u = left_u.at[drop_y].set(duv["rec_u"][:, :, 7], mode="drop")
        tl_u = tl_u.at[jnp.where(valid, xs_c + 1, mb_w + 2), (ys + 1) & 1].set(
            duv["rec_u"][:, 7, 7], mode="drop")
        top_v = top_v.at[drop_x].set(duv["rec_v"][:, 7, :], mode="drop")
        left_v = left_v.at[drop_y].set(duv["rec_v"][:, :, 7], mode="drop")
        tl_v = tl_v.at[jnp.where(valid, xs_c + 1, mb_w + 2), (ys + 1) & 1].set(
            duv["rec_v"][:, 7, 7], mode="drop")
        top_nz = top_nz.at[drop_x].set(new_tnz, mode="drop")
        left_nz = left_nz.at[drop_y].set(new_lnz, mode="drop")
        top_dc = top_dc.at[drop_x].set(d16["y2_nz"], mode="drop")
        left_dc = left_dc.at[drop_y].set(d16["y2_nz"], mode="drop")

        drop_mb = jnp.where(valid, mb, n_mb + 1)
        lv24 = jnp.concatenate(
            [d16["lv"], duv["lv_u"], duv["lv_v"]], axis=1)  # [L, 24, 16]
        out_lv = out_lv.at[drop_mb].set(lv24, mode="drop")
        out_y2 = out_y2.at[drop_mb].set(d16["y2_lv"], mode="drop")
        out_modes = out_modes.at[drop_mb].set(d16["mode"], mode="drop")
        out_uv = out_uv.at[drop_mb].set(duv["uvmode"], mode="drop")
        out_skip = out_skip.at[drop_mb].set(skip, mode="drop")

        return (top_y, left_y, tl_y, top_u, left_u, tl_u, top_v, left_v, tl_v,
                top_nz, left_nz, top_dc, left_dc,
                out_lv, out_y2, out_modes, out_uv, out_skip,
                srcYb, srcUb, srcVb), None

    @jax.jit
    def encode_rgb(rgb_padded):
        """Fused device path: RGB import (gamma-aware chroma) + wavefront.

        rgb_padded: uint8 [mb_h*16, mb_w*16, 3] (edge-replicated padding).
        """
        from . import yuv as devyuv

        Y, U, V = devyuv.rgb_to_yuv420(rgb_padded)
        return encode(Y, U, V)

    @jax.jit
    def encode(srcY, srcU, srcV):
        # Block the source planes: [nMB, 16, 4, 4] / [nMB, 8, 8].
        yb = srcY.astype(jnp.int32).reshape(mb_h, 4, 4, mb_w, 4, 4)
        yb = jnp.moveaxis(yb, (0, 1, 2, 3, 4, 5), (0, 2, 4, 1, 3, 5))
        yb = yb.reshape(n_mb, 16, 4, 4)
        ub = srcU.astype(jnp.int32).reshape(mb_h, 8, mb_w, 8)
        ub = jnp.moveaxis(ub, 1, 2).reshape(n_mb, 8, 8)
        vb = srcV.astype(jnp.int32).reshape(mb_h, 8, mb_w, 8)
        vb = jnp.moveaxis(vb, 1, 2).reshape(n_mb, 8, 8)

        carry = (
            jnp.zeros((mb_w, 16), jnp.int32), jnp.zeros((mb_h, 16), jnp.int32),
            jnp.zeros((mb_w, 2), jnp.int32),
            jnp.zeros((mb_w, 8), jnp.int32), jnp.zeros((mb_h, 8), jnp.int32),
            jnp.zeros((mb_w, 2), jnp.int32),
            jnp.zeros((mb_w, 8), jnp.int32), jnp.zeros((mb_h, 8), jnp.int32),
            jnp.zeros((mb_w, 2), jnp.int32),
            jnp.zeros(mb_w, jnp.uint32), jnp.zeros(mb_h, jnp.uint32),
            jnp.zeros(mb_w, jnp.int32), jnp.zeros(mb_h, jnp.int32),
            jnp.zeros((n_mb, 24, 16), jnp.int32),
            jnp.zeros((n_mb, 16), jnp.int32),
            jnp.zeros(n_mb, jnp.uint8),
            jnp.zeros(n_mb, jnp.uint8),
            jnp.zeros(n_mb, bool),
            yb, ub, vb,
        )
        carry, _ = jax.lax.scan(step, carry, jnp.arange(n_steps))
        (_, _, _, _, _, _, _, _, _, _, _, _, _,
         out_lv, out_y2, out_modes, out_uv, out_skip, _, _, _) = carry
        return out_lv, out_y2, out_modes, out_uv, out_skip

    encode.rgb = encode_rgb
    encode.rgb_batch = jax.jit(jax.vmap(encode_rgb))
    return encode
