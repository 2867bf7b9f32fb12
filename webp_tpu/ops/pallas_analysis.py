"""Fused natural-layout Pallas analysis kernel: I16 + I4 mode search.

The planar formulation (ops/pallas_i4.py) is fast once the data is in
[16, n_sb] layout, but producing that layout costs more HBM-shuffle time
than the 10-mode search itself (~40 ms vs ~25 ms at 16x1536x1024 on a
v5e), and the jnp I16 phase-1 pays the same tax on its [n_mb, 16, 4, 4]
block tensors. This kernel removes the tax: it consumes the raw luma
plane [H, W] in its natural row-major layout and performs every
cross-pixel movement in VMEM with lane/sublane rolls:

  - per-subblock context rows (top/left/corner/above-right) are built by
    masked butterfly broadcasts over aligned 4/16-element groups;
  - the integer 4x4 FDCT/WHT/IDCT run "anchored": butterfly partners are
    fetched with static rolls, results are valid at the block-anchor
    positions and spread back with 1..3-step rolls;
  - per-coefficient quantizer rows follow the zigzag pattern plane
    (a [4, 4]-tiled constant), so quantization is fully elementwise;
  - the zigzag run/EOB rate model uses a suffix-occupancy bit trick:
    s = sum(nz << zz) per block, position zz is inside the coded run iff
    (s >> zz) != 0 — no sequential scan over the 16 positions.

Scores and mode choices are bit-identical to the jnp formulation
(fastpath._phase1 luma + i4.i4_search); see tests/test_pallas.py.

Reference behavior: encode_analysis.go:1075 (I16 search),
encode_analysis.go:1243 (PickBestI4ModeRD), ssim.go:266 (TDisto).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.cost import FIXED_COSTS_I4

ZIGZAG = np.asarray(T.ZIGZAG)
INV_ZZ = np.argsort(ZIGZAG)
QFIX = 17
MAX_LEVEL = 2047
I4_MODE_COST = np.asarray(FIXED_COSTS_I4)[0, 0].astype(np.int32)
WEIGHT_Y_FLAT = (38, 32, 20, 9, 32, 28, 17, 7,
                 20, 17, 10, 4, 9, 7, 4, 2)
TAIL_BUCKETS = ((8, 11), (11, 19), (19, 35), (35, 1 << 30))
_DEBUG = None  # test-only component tap ("rate16" | "disto16" | ...)
import os
_NI4 = int(os.environ.get("WEBPTPU_PA_NI4", "10"))   # compile-bisect knobs
_NI16 = int(os.environ.get("WEBPTPU_PA_NI16", "4"))
_STAGE = int(os.environ.get("WEBPTPU_PA_STAGE", "99"))


def _a2(a, b):
    return (a + b + 1) >> 1


def _a3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _kernel(ym_ref, yh_ref, seg_ref, qtab_ref, lam_ref,
            i16m_ref, i16s_ref, i4m_ref, i4s_ref, *,
            mbr, w, lvl0, tail0, eob0, lvl1, tail1, eob1,
            lvl3, tail3, eob3, fix16, mode_cost, tr_modes,
            use_td, allow_tr, multi_seg):
    R = mbr * 16
    pid = _pid()
    row = jax.lax.broadcasted_iota(jnp.int32, (R, w), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, w), 1)
    mr = [row % 4 == i for i in range(4)]
    ml = [lane % 4 == j for j in range(4)]
    anchor4 = mr[0] & ml[0]
    anchor16 = (row % 16 == 0) & (lane % 16 == 0)

    def bfly_sum(x, axis, g, it):
        k = 1
        while k < g:
            a = jnp.roll(x, -k, axis=axis)
            b = jnp.roll(x, k, axis=axis)
            x = x + jnp.where((it % (2 * k)) < k, a, b)
            k *= 2
        return x

    def bsum_l(x, g):
        return bfly_sum(x, 1, g, lane)

    def bsum_r(x, g):
        return bfly_sum(x, 0, g, row)

    def bsum_block(x, g):
        return bsum_r(bsum_l(x, g), g)

    def bcast_block(x, mask, g):
        return bsum_block(jnp.where(mask, x, 0), g)

    def compose16(vals, rmask=mr, lmask=ml):
        out = vals[0]
        for p in range(1, 16):
            out = jnp.where(rmask[p // 4] & lmask[p % 4], vals[p], out)
        return out

    Ym = ym_ref[:, :].astype(jnp.int32)
    halo = yh_ref[R - 1:R, :].astype(jnp.int32)
    halo = jnp.where(pid == 0, 127, halo)
    RA = jnp.where(row == 0, halo, jnp.roll(Ym, 1, axis=0))
    LF = jnp.roll(Ym, 1, axis=1)     # left-neighbor pixel plane
    LA = jnp.roll(RA, 1, axis=1)     # above-left pixel plane
    segp = seg_ref[:, :].astype(jnp.int32) if multi_seg else None

    def seg_sel(base_idx, z):
        v = qtab_ref[base_idx, z]
        if multi_seg:
            for s in range(1, 4):
                v = jnp.where(segp == s, qtab_ref[base_idx + s * 4, z], v)
        return v

    def _early(v):
        vi = v.astype(jnp.int32)
        for k in range(mbr):
            i16m_ref[k * 4, :] = vi[k * 16, :]
            i16s_ref[k * 4, :] = v.astype(jnp.float32)[k * 16, :]
        for k in range(mbr * 4):
            i4m_ref[k, :] = vi[k * 4, :]
            i4s_ref[k, :] = v.astype(jnp.float32)[k * 4, :]

    if _STAGE == 0:
        _early(Ym + RA + LF + LA)
        return

    zzp = compose16([int(INV_ZZ[p]) for p in range(16)])
    pow2 = compose16([1 << int(INV_ZZ[p]) for p in range(16)])
    w_plane = compose16([int(v) for v in WEIGHT_Y_FLAT])
    mrow4 = (row % 16) // 4
    mlan4 = (lane % 16) // 4
    zz2 = jnp.zeros((R, w), jnp.int32)
    pow22 = jnp.zeros((R, w), jnp.int32)
    for u in range(4):
        for v in range(4):
            m2uv = (mrow4 == u) & (mlan4 == v)
            zz2 = jnp.where(m2uv, int(INV_ZZ[u * 4 + v]), zz2)
            pow22 = jnp.where(m2uv, 1 << int(INV_ZZ[u * 4 + v]), pow22)

    def qplanes(base, pattern):
        # (q, iq, bias, sharpen) planes following a zigzag pattern plane.
        out = []
        for param in range(4):
            p = jnp.zeros((R, w), jnp.int32)
            for z in range(16):
                p = jnp.where(pattern == z, seg_sel(base + param, z), p)
            out.append(p)
        return out

    qy1, iqy1, by1, sy1 = qplanes(0, zzp)

    def lam_plane(off):
        v = lam_ref[0, off] * jnp.ones((R, w), jnp.float32)
        if multi_seg:
            for s in range(1, 4):
                v = jnp.where(segp == s, lam_ref[0, off + s], v)
        return v

    if _STAGE == 1:
        _early(zzp + pow2 + w_plane + zz2 + pow22 + qy1 + iqy1 + by1 + sy1)
        return

    lam16 = lam_plane(0)
    lam4 = lam_plane(4)
    tlsd = lam_plane(8) if use_td else None
    # Split-decision lambda (reference LambdaMode): selection runs at
    # lam16/lam4, emitted scores are the winners' lam_md-rescored totals.
    lam_md = lam_plane(12)

    # ---------------- shared transform machinery ----------------

    def fdct_plane(D):
        d1 = jnp.roll(D, -1, axis=1)
        d2 = jnp.roll(D, -2, axis=1)
        d3 = jnp.roll(D, -3, axis=1)
        a0, a1, a2, a3 = D + d3, d1 + d2, d1 - d2, D - d3
        t0 = (a0 + a1) * 8
        t1 = (a2 * 2217 + a3 * 5352 + 1812) >> 9
        t2 = (a0 - a1) * 8
        t3 = (a3 * 2217 - a2 * 5352 + 937) >> 9
        Tm = jnp.where(ml[0], t0,
                       jnp.where(ml[1], jnp.roll(t1, 1, axis=1),
                                 jnp.where(ml[2], jnp.roll(t2, 2, axis=1),
                                           jnp.roll(t3, 3, axis=1))))
        m1 = jnp.roll(Tm, -1, axis=0)
        m2 = jnp.roll(Tm, -2, axis=0)
        m3 = jnp.roll(Tm, -3, axis=0)
        a0, a1, a2, a3 = Tm + m3, m1 + m2, m1 - m2, Tm - m3
        o0 = (a0 + a1 + 7) >> 4
        o2 = (a0 - a1 + 7) >> 4
        o1 = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) \
            + (a3 != 0).astype(jnp.int32)
        o3 = (a3 * 2217 - a2 * 5352 + 51000) >> 16
        return jnp.where(mr[0], o0,
                         jnp.where(mr[1], jnp.roll(o1, 1, axis=0),
                                   jnp.where(mr[2], jnp.roll(o2, 2, axis=0),
                                             jnp.roll(o3, 3, axis=0))))

    def idct_plane(dqn):
        # Contract rows first (dct.idct4x4), anchored at mr[0].
        i1 = jnp.roll(dqn, -1, axis=0)
        i2 = jnp.roll(dqn, -2, axis=0)
        i3 = jnp.roll(dqn, -3, axis=0)
        a = dqn + i2
        b = dqn - i2
        cc = ((i1 * 35468) >> 16) - (((i3 * 20091) >> 16) + i3)
        dd = ((i1 * 20091) >> 16) + i1 + ((i3 * 35468) >> 16)
        t0, t1, t2, t3 = a + dd, b + cc, b - cc, a - dd
        Tm = jnp.where(mr[0], t0,
                       jnp.where(mr[1], jnp.roll(t1, 1, axis=0),
                                 jnp.where(mr[2], jnp.roll(t2, 2, axis=0),
                                           jnp.roll(t3, 3, axis=0))))
        j1 = jnp.roll(Tm, -1, axis=1)
        j2 = jnp.roll(Tm, -2, axis=1)
        j3 = jnp.roll(Tm, -3, axis=1)
        dc0 = Tm + 4
        a = dc0 + j2
        b = dc0 - j2
        cc = ((j1 * 35468) >> 16) - (((j3 * 20091) >> 16) + j3)
        dd = ((j1 * 20091) >> 16) + j1 + ((j3 * 35468) >> 16)
        o0, o1, o2, o3 = (a + dd) >> 3, (b + cc) >> 3, \
            (b - cc) >> 3, (a - dd) >> 3
        return jnp.where(ml[0], o0,
                         jnp.where(ml[1], jnp.roll(o1, 1, axis=1),
                                   jnp.where(ml[2], jnp.roll(o2, 2, axis=1),
                                             jnp.roll(o3, 3, axis=1))))

    def hadamard_plane(x):
        # metrics._hadamard4: contract cols (lanes) first.
        c1 = jnp.roll(x, -1, axis=1)
        c2 = jnp.roll(x, -2, axis=1)
        c3 = jnp.roll(x, -3, axis=1)
        a0, a1 = x + c2, c1 + c3
        a2, a3 = c1 - c3, x - c2
        t0, t1, t2, t3 = a0 + a1, a3 + a2, a3 - a2, a0 - a1
        Tm = jnp.where(ml[0], t0,
                       jnp.where(ml[1], jnp.roll(t1, 1, axis=1),
                                 jnp.where(ml[2], jnp.roll(t2, 2, axis=1),
                                           jnp.roll(t3, 3, axis=1))))
        r1 = jnp.roll(Tm, -1, axis=0)
        r2 = jnp.roll(Tm, -2, axis=0)
        r3 = jnp.roll(Tm, -3, axis=0)
        a0, a1 = Tm + r2, r1 + r3
        a2, a3 = r1 - r3, Tm - r2
        o0, o1, o2, o3 = a0 + a1, a3 + a2, a3 - a2, a0 - a1
        return jnp.where(mr[0], o0,
                         jnp.where(mr[1], jnp.roll(o1, 1, axis=0),
                                   jnp.where(mr[2], jnp.roll(o2, 2, axis=0),
                                             jnp.roll(o3, 3, axis=0))))

    def rate_sb(level_abs, lvl, tail, eob, first):
        """Per-subblock approx rate (fastpath.approx_block_rate),
        broadcast to every position of the 4x4 block."""
        vc = jnp.minimum(level_abs, 7)
        c = jnp.zeros((R, w), jnp.int32)
        for k in range(8):
            c = jnp.where(vc == k, int(lvl[k]), c)
        for b, (lo, hi) in enumerate(TAIL_BUCKETS):
            c = c + jnp.where((level_abs >= lo) & (level_abs < hi),
                              int(tail[b]), 0)
        nz = (level_abs != 0) & (zzp >= first)
        s = bsum_block(jnp.where(nz, pow2, 0), 4)
        in_run = ((s >> zzp) != 0) & (zzp >= first)
        return bsum_block(jnp.where(in_run, c, 0), 4) + int(eob)

    if use_td:
        ha_src = bsum_block(w_plane * jnp.abs(hadamard_plane(Ym)), 4)

    # ---------------- I4: context planes + 10-mode search ----------------

    Cl = []
    for i in range(4):
        v = bcast_block(LF, mr[i] & ml[0], 4)
        Cl.append(jnp.where(lane < 4, 129, v))
    tl_raw = bcast_block(LA, anchor4, 4)
    top_missing = (pid == 0) & (row < 4)
    Ctl = jnp.where(lane < 4, jnp.where(top_missing, 127, 129), tl_raw)
    Ct = [bcast_block(RA, mr[0] & ml[j], 4) for j in range(4)]
    RAm4 = jnp.roll(RA, -4, axis=1)
    Ctr = [bcast_block(RAm4, mr[0] & ml[j], 4) for j in range(4)]
    RAm16 = jnp.roll(RA, -16, axis=1)
    Cmbtr = [bcast_block(RAm16, (row % 16 == 0) & (lane % 16 == j), 16)
             for j in range(4)]
    c3 = (lane % 16) >= 12
    Ctr = [jnp.where(c3, Cmbtr[j], Ctr[j]) for j in range(4)]

    if _STAGE == 2:
        acc = Ctl
        for v in Cl + Ct + Ctr:
            acc = acc + v
        _early(acc + lam16.astype(jnp.int32))
        return

    contour = [Cl[3], Cl[2], Cl[1], Cl[0], Ctl] + Ct + Ctr
    s3 = [_a3(contour[i], contour[i + 1], contour[i + 2]) for i in range(11)]
    s2 = [_a2(contour[i], contour[i + 1]) for i in range(12)]
    lr = [Ctl, Cl[0], Cl[1], Cl[2], Cl[3], Cl[3]]
    s3h = [_a3(lr[i], lr[i + 1], lr[i + 2]) for i in range(4)]
    s2h = [_a2(lr[i], lr[i + 1]) for i in range(5)]
    dc4 = (Ct[0] + Ct[1] + Ct[2] + Ct[3]
           + Cl[0] + Cl[1] + Cl[2] + Cl[3] + 4) >> 3

    def i4_pred(mode):
        """Per-position prediction plane (same formulas as
        pallas_i4._kernel rows_of, on planes)."""
        if mode == 0:
            return dc4
        if mode == 1:  # TM
            return compose16([jnp.clip(Cl[r] + Ct[c] - Ctl, 0, 255)
                              for r in range(4) for c in range(4)])
        if mode == 2:  # VE
            return compose16([s3[4 + c] for r in range(4) for c in range(4)])
        if mode == 3:  # HE
            return compose16([s3h[r] for r in range(4) for c in range(4)])
        if mode == 4:  # RD
            return compose16([s3[3 - r + c]
                              for r in range(4) for c in range(4)])
        if mode == 5:  # VR
            grid = [[s2[4 + c] for c in range(4)],
                    [s3[3 + c] for c in range(4)],
                    [s3[2], s2[4], s2[5], s2[6]],
                    [s3[1], s3[3], s3[4], s3[5]]]
            return compose16([grid[r][c] for r in range(4) for c in range(4)])
        if mode == 6:  # LD
            tail_v = _a3(Ctr[2], Ctr[3], Ctr[3])
            f = s3[5:11] + [tail_v]
            return compose16([f[r + c] for r in range(4) for c in range(4)])
        if mode == 7:  # VL
            grid = [[s2[5 + c] for c in range(4)],
                    [s3[5 + c] for c in range(4)],
                    [s2[6], s2[7], s2[8], s3[9]],
                    [s3[6], s3[7], s3[8], s3[10]]]
            return compose16([grid[r][c] for r in range(4) for c in range(4)])
        if mode == 8:  # HD
            hd0 = [s2h[0], s3[3], s3[4], s3[5]]
            hd1 = [s2h[1], s3h[0], hd0[0], hd0[1]]
            hd2 = [s2h[2], s3h[1], hd1[0], hd1[1]]
            hd3 = [s2h[3], s3h[2], hd2[0], hd2[1]]
            return compose16(hd0 + hd1 + hd2 + hd3)
        hu0 = [s2h[1], s3h[1], s2h[2], s3h[2]]
        hu1 = [hu0[2], hu0[3], s2h[3], s3h[3]]
        hu2 = [hu1[2], hu1[3], Cl[3], Cl[3]]
        hu3 = [Cl[3]] * 4
        return compose16(hu0 + hu1 + hu2 + hu3)

    if _STAGE == 3:
        CO = fdct_plane(Ym - dc4)
        mag = jnp.abs(CO) + sy1
        level = jnp.minimum((mag * iqy1 + by1) >> QFIX, MAX_LEVEL)
        _early(level + rate_sb(level, lvl3, tail3, eob3, 0))
        return

    best_s4 = jnp.full((R, w), jnp.inf, jnp.float32)
    best_r4 = jnp.zeros((R, w), jnp.float32)
    best_D4 = jnp.zeros((R, w), jnp.float32)
    best_m4 = jnp.zeros((R, w), jnp.int32)
    for m in range(_NI4):
        pred = i4_pred(m)
        CO = fdct_plane(Ym - pred)
        mag = jnp.abs(CO) + sy1
        level = jnp.minimum((mag * iqy1 + by1) >> QFIX, MAX_LEVEL)
        dqz = level * qy1
        e = jnp.abs(CO) - dqz
        disto = bsum_block(e * e, 4)
        rate = rate_sb(level, lvl3, tail3, eob3, 0) + int(mode_cost[m])
        D = 64.0 * disto.astype(jnp.float32)
        if use_td:
            dqn = jnp.where(CO < 0, -dqz, dqz)
            rec = jnp.clip(pred + idct_plane(dqn), 0, 255)
            ha_rec = bsum_block(w_plane * jnp.abs(hadamard_plane(rec)), 4)
            td = jnp.abs(ha_rec - ha_src) >> 5
            D = D + tlsd * td.astype(jnp.float32)
        score = rate.astype(jnp.float32) * lam4 + D
        if m in tr_modes and not allow_tr:
            score = jnp.where(c3, jnp.float32(np.inf), score)
        better = score < best_s4
        best_s4 = jnp.where(better, score, best_s4)
        best_r4 = jnp.where(better, rate.astype(jnp.float32), best_r4)
        best_D4 = jnp.where(better, D, best_D4)
        best_m4 = jnp.where(better, m, best_m4)
    best_s4 = best_r4 * lam_md + best_D4

    # ---------------- I16: 4-mode search ----------------

    T16 = bsum_r(jnp.where(row % 16 == 0, RA, 0), 16)
    has_top16 = (pid > 0) | (row >= 16)
    has_left16 = lane >= 16
    topm = jnp.where(has_top16, T16, 127)
    L16 = bsum_l(jnp.where(lane % 16 == 0, LF, 0), 16)
    leftm = jnp.where(has_left16, L16, 129)
    tl16 = bcast_block(LA, anchor16, 16)
    tlm = jnp.where(has_top16 & has_left16, tl16,
                    jnp.where(has_top16, 129, 127))
    sum_t = bsum_l(topm, 16)
    sum_l = bsum_r(leftm, 16)
    dc16 = jnp.where(
        has_top16 & has_left16, (sum_t + sum_l + 16) >> 5,
        jnp.where(has_top16, (sum_t + 8) >> 4,
                  jnp.where(has_left16, (sum_l + 8) >> 4, 0x80)))
    preds16 = [dc16,
               jnp.clip(leftm + topm - tlm, 0, 255),
               topm,
               leftm]

    # y2 quant follows the SUBBLOCK-grid zigzag (zz2 at the DC anchors).
    qy2 = qplanes(16, zz2)

    best_s16 = jnp.full((R, w), jnp.inf, jnp.float32)
    best_r16 = jnp.zeros((R, w), jnp.float32)
    best_D16 = jnp.zeros((R, w), jnp.float32)
    best_m16 = jnp.zeros((R, w), jnp.int32)
    debug_hit = False
    for m in range(_NI16):
        CO = fdct_plane(Ym - preds16[m])
        # y2: forward WHT over the subblock DCs (anchored stride 4).
        w1 = jnp.roll(CO, -4, axis=1)
        w2 = jnp.roll(CO, -8, axis=1)
        w3 = jnp.roll(CO, -12, axis=1)
        a0, a1 = CO + w2, w1 + w3
        a2, a3 = w1 - w3, CO - w2
        t0, t1, t2, t3 = a0 + a1, a3 + a2, a3 - a2, a0 - a1
        Tw = jnp.where(mlan4 == 0, t0,
                       jnp.where(mlan4 == 1, jnp.roll(t1, 4, axis=1),
                                 jnp.where(mlan4 == 2,
                                           jnp.roll(t2, 8, axis=1),
                                           jnp.roll(t3, 12, axis=1))))
        r1 = jnp.roll(Tw, -4, axis=0)
        r2 = jnp.roll(Tw, -8, axis=0)
        r3 = jnp.roll(Tw, -12, axis=0)
        a0, a1 = Tw + r2, r1 + r3
        a2, a3 = r1 - r3, Tw - r2
        o0, o1, o2, o3 = a0 + a1, a3 + a2, a3 - a2, a0 - a1
        wht = jnp.where(mrow4 == 0, o0,
                        jnp.where(mrow4 == 1, jnp.roll(o1, 4, axis=0),
                                  jnp.where(mrow4 == 2,
                                            jnp.roll(o2, 8, axis=0),
                                            jnp.roll(o3, 12, axis=0)))) >> 1
        # y2 quantization at the 16 subblock-DC anchor positions.
        mag2 = jnp.abs(wht) + qy2[3]
        lvl2 = jnp.minimum((mag2 * qy2[1] + qy2[2]) >> QFIX, MAX_LEVEL)
        dqz2 = lvl2 * qy2[0]
        vc2 = jnp.minimum(lvl2, 7)
        c2c = jnp.zeros((R, w), jnp.int32)
        for k in range(8):
            c2c = jnp.where(vc2 == k, int(lvl1[k]), c2c)
        for b, (lo, hi) in enumerate(TAIL_BUCKETS):
            c2c = c2c + jnp.where((lvl2 >= lo) & (lvl2 < hi),
                                  int(tail1[b]), 0)
        nz2 = (lvl2 != 0) & anchor4
        s2p = bsum_block(jnp.where(nz2, pow22, 0), 16)
        in_run2 = ((s2p >> zz2) != 0) & anchor4
        rate2 = bsum_block(jnp.where(in_run2, c2c, 0), 16) + int(eob1)
        # Inverse WHT of the dequantized y2 -> per-subblock DC.
        dqn2 = jnp.where(wht < 0, -dqz2, dqz2)
        i1 = jnp.roll(dqn2, -4, axis=0)
        i2 = jnp.roll(dqn2, -8, axis=0)
        i3 = jnp.roll(dqn2, -12, axis=0)
        a0, a1 = dqn2 + i3, i1 + i2
        a2, a3 = i1 - i2, dqn2 - i3
        t0, t1, t2, t3 = a0 + a1, a3 + a2, a0 - a1, a3 - a2
        Ti = jnp.where(mrow4 == 0, t0,
                       jnp.where(mrow4 == 1, jnp.roll(t1, 4, axis=0),
                                 jnp.where(mrow4 == 2,
                                           jnp.roll(t2, 8, axis=0),
                                           jnp.roll(t3, 12, axis=0))))
        j1 = jnp.roll(Ti, -4, axis=1)
        j2 = jnp.roll(Ti, -8, axis=1)
        j3 = jnp.roll(Ti, -12, axis=1)
        dc0 = Ti + 3
        a0 = dc0 + j3
        a1 = j1 + j2
        a2 = j1 - j2
        a3 = dc0 - j3
        o0, o1, o2, o3 = (a0 + a1) >> 3, (a3 + a2) >> 3, \
            (a0 - a1) >> 3, (a3 - a2) >> 3
        recdc = jnp.where(mlan4 == 0, o0,
                          jnp.where(mlan4 == 1, jnp.roll(o1, 4, axis=1),
                                    jnp.where(mlan4 == 2,
                                              jnp.roll(o2, 8, axis=1),
                                              jnp.roll(o3, 12, axis=1))))
        # y1 levels with first=1 (DC excluded from the AC scan).
        mag = jnp.abs(CO) + sy1
        level = jnp.minimum((mag * iqy1 + by1) >> QFIX, MAX_LEVEL)
        level = jnp.where(zzp == 0, 0, level)
        dqz = level * qy1
        dqn = jnp.where(CO < 0, -dqz, dqz)
        dqf = jnp.where(anchor4, recdc, dqn)
        e = CO - dqf
        disto = bsum_block(e * e, 16)
        r1sb = rate_sb(level, lvl0, tail0, eob0, 1)
        rate = bsum_block(jnp.where(anchor4, r1sb, 0), 16) + rate2 \
            + int(fix16[m])
        D = 64.0 * disto.astype(jnp.float32)
        if use_td:
            rec = jnp.clip(preds16[m] + idct_plane(dqf), 0, 255)
            ha_rec = bsum_block(w_plane * jnp.abs(hadamard_plane(rec)), 4)
            td = jnp.abs(ha_rec - ha_src) >> 5
            td16 = bsum_block(jnp.where(anchor4, td, 0), 16)
            D = D + tlsd * td16.astype(jnp.float32)
        score = rate.astype(jnp.float32) * lam16 + D
        if _DEBUG and m == 0:
            comp = {"rate16": rate, "disto16": disto, "rate2": rate2,
                    "r1": bsum_block(jnp.where(anchor4, r1sb, 0), 16),
                    "wht": wht, "recdc": recdc}[_DEBUG]
            best_s16 = comp.astype(jnp.float32)
            best_m16 = jnp.zeros((R, w), jnp.int32)
            debug_hit = True
            break
        better = score < best_s16
        best_s16 = jnp.where(better, score, best_s16)
        best_r16 = jnp.where(better, rate.astype(jnp.float32), best_r16)
        best_D16 = jnp.where(better, D, best_D16)
        best_m16 = jnp.where(better, m, best_m16)
    if not debug_hit:
        best_s16 = best_r16 * lam_md + best_D16

    # The i16 outputs share the i4 planes' (mbr * 4, w) row geometry so
    # every output block is sublane-aligned ((mbr, w) blocks violate the
    # TPU's 8-row divisibility at mbr=2): MB row k's I16 result lands on
    # row 4*k, the same row its first subblock row occupies in the i4
    # planes. Rows 4*k+1..3 are dead (never read back).
    for k in range(mbr):
        i16m_ref[k * 4, :] = best_m16[k * 16, :]
        i16s_ref[k * 4, :] = best_s16[k * 16, :]
    for k in range(mbr * 4):
        i4m_ref[k, :] = best_m4[k * 4, :]
        i4s_ref[k, :] = best_s4[k * 4, :]


def _pid():
    from jax.experimental import pallas as pl

    return pl.program_id(0)


def _fixed_costs_i16():
    from ..lossy.encode import FIXED_COSTS_I16

    return FIXED_COSTS_I16


@functools.lru_cache(maxsize=8)
def _build_call(mb_h_pad, mbr, w, lvl0, tail0, eob0, lvl1, tail1, eob1,
                lvl3, tail3, eob3, fix16, mode_cost, tr_modes, use_td,
                allow_tr, multi_seg, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = mbr * 16
    grid = mb_h_pad // mbr
    kernel = functools.partial(
        _kernel, mbr=mbr, w=w, lvl0=lvl0, tail0=tail0, eob0=eob0,
        lvl1=lvl1, tail1=tail1, eob1=eob1, lvl3=lvl3, tail3=tail3,
        eob3=eob3, fix16=fix16, mode_cost=mode_cost, tr_modes=tr_modes,
        use_td=use_td, allow_tr=allow_tr, multi_seg=multi_seg)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, w), lambda i: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mbr * 4, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mbr * 4, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mbr * 4, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mbr * 4, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mb_h_pad * 4, w), jnp.int32),
            jax.ShapeDtypeStruct((mb_h_pad * 4, w), jnp.float32),
            jax.ShapeDtypeStruct((mb_h_pad * 4, w), jnp.int32),
            jax.ShapeDtypeStruct((mb_h_pad * 4, w), jnp.float32),
        ],
        # The default scoped-vmem budget (16M) is ~1.5M short of this
        # kernel's live planes at mbr=2; v5e/v5p VMEM is far larger.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def luma_analysis(Y, seg_map, qtab_y1, qtab_y2, lam16_4, lam4_4, tlsd4,
                  rt, mb_w, mb_h, allow_tr=False, mbr=2, interpret=False,
                  lam_mode4=None):
    """Fused I16 + I4 luma analysis.

    Y: [H, W] int; seg_map: [n_mb] i32 or None; qtab_y1/qtab_y2:
    [16, 16] i32 ((seg*4 + {q,iq,bias,sharpen}) x zigzag);
    lam16_4/lam4_4: [4] f32 per-segment lambdas; tlsd4: [4] f32 or None.
    rt: fastpath.RateTables.

    Returns (i16_mode [n_mb] i32, i16_score [n_mb] f32,
             i4_mode [n_mb, 16] i32, i4_score [n_mb, 16] f32) with values
    bit-identical to fastpath._phase1's luma scores and i4.i4_search.
    """
    H, W = mb_h * 16, mb_w * 16
    W_pad = -(-W // 128) * 128
    mb_h_pad = -(-mb_h // mbr) * mbr
    H_pad = mb_h_pad * 16
    Yu = Y.astype(jnp.uint8)
    if W_pad != W:
        Yu = jnp.concatenate(
            [Yu, jnp.broadcast_to(Yu[:, W - 1:W], (H, W_pad - W))], axis=1)
    if H_pad != H:
        Yu = jnp.concatenate(
            [Yu, jnp.broadcast_to(Yu[H - 1:H, :], (H_pad - H, W_pad))],
            axis=0)
    multi_seg = seg_map is not None
    if multi_seg:
        sg = seg_map.reshape(mb_h, mb_w).astype(jnp.uint8)
        if W_pad != W:
            sg = jnp.concatenate(
                [sg, jnp.broadcast_to(sg[:, -1:], (mb_h, W_pad // 16 - mb_w))],
                axis=1)
        if mb_h_pad != mb_h:
            sg = jnp.concatenate(
                [sg, jnp.broadcast_to(sg[-1:, :],
                                      (mb_h_pad - mb_h, W_pad // 16))],
                axis=0)
        segp = jnp.broadcast_to(sg[:, None, :, None],
                                (mb_h_pad, 16, W_pad // 16, 16)
                                ).reshape(H_pad, W_pad)
    else:
        segp = jnp.zeros((H_pad, W_pad), jnp.uint8)
    qtab = jnp.concatenate([qtab_y1.astype(jnp.int32),
                            qtab_y2.astype(jnp.int32)], axis=0)  # [32, 16]
    lam_row = jnp.zeros((1, 128), jnp.float32)
    lam_row = lam_row.at[0, 0:4].set(jnp.asarray(lam16_4, jnp.float32))
    lam_row = lam_row.at[0, 4:8].set(jnp.asarray(lam4_4, jnp.float32))
    use_td = tlsd4 is not None
    if use_td:
        lam_row = lam_row.at[0, 8:12].set(jnp.asarray(tlsd4, jnp.float32))
    lam_row = lam_row.at[0, 12:16].set(jnp.asarray(
        lam16_4 if lam_mode4 is None else lam_mode4, jnp.float32))
    call = _build_call(
        mb_h_pad, mbr, W_pad,
        tuple(int(v) for v in rt.lvl[0]), tuple(int(v) for v in rt.tail[0]),
        int(rt.eob[0]),
        tuple(int(v) for v in rt.lvl[1]), tuple(int(v) for v in rt.tail[1]),
        int(rt.eob[1]),
        tuple(int(v) for v in rt.lvl[3]), tuple(int(v) for v in rt.tail[3]),
        int(rt.eob[3]),
        tuple(int(v) for v in _fixed_costs_i16()),
        tuple(int(v) for v in I4_MODE_COST), (2, 6, 7),
        use_td, allow_tr, multi_seg, interpret)
    i16m, i16s, i4m, i4s = call(Yu, Yu, segp, qtab, lam_row)
    n_mb = mb_w * mb_h
    i16_mode = i16m[0:mb_h * 4:4, 0:W:16].reshape(n_mb)
    i16_score = i16s[0:mb_h * 4:4, 0:W:16].reshape(n_mb)

    def to_mb(a):
        g = a[:mb_h * 4, 0:W:4]                       # [SBY, SBX]
        return (g.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)
                .reshape(n_mb, 16))

    return i16_mode, i16_score, to_mb(i4m), to_mb(i4s)
