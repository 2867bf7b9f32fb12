"""Pallas TPU kernel for the phase-1 I16 + UV mode search.

The jnp planar formulation (ops/phase1p.py) is HBM-bound: each of the 4
I16 modes and 4 UV modes streams the full source-block tensors through an
fdct -> quantize -> rate pipeline whose intermediates XLA materializes in
HBM ([16, 16, L] i32 per mode — measured 42 ms of the 179 ms batch-32
encode, plus ~26 ms of per-lane segment quant-row builds that only exist
to feed it). This kernel runs the whole search in VMEM: per grid step it
loads a planar tile of macroblocks (source blocks + the 16-pixel
top/left contours), evaluates all 4 I16 predictors through the exact
integer FDCT/WHT/quant/rate model and all 4 UV predictors, and writes
only the winning modes and the I16 score.

Layouts are planar [row, lane] with lanes = macroblocks; rows are
block-major pixel/coefficient positions. Each logical [TILE] row is
reshaped to [TILE/128, 128] so vregs pack fully (same trick as
ops/pallas_i4.py).

Math is bit-identical to ops/phase1p.py phase1_planar (asserted in
tests/test_pallas_p1.py), so the kernel and the jnp fallback choose the
same modes.

Reference behavior: encode_analysis.go:1075 (PickBestI16ModeRD), :1379
(PickBestUVModeRD), ssim.go:266 (TDisto16x16), transforms.go (DCT/WHT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T

ZIGZAG = np.asarray(T.ZIGZAG)
QFIX = 17
MAX_LEVEL = 2047
TILE = 1024  # macroblocks per grid step: [8, 128] vregs per logical row

# Source array rows (u8): block-major pixels per plane. Shared by the
# mode-search kernel and the segment-alpha kernel, and built BEFORE the
# segment plan exists.
R_SRCY, R_SRCU, R_SRCV = 0, 256, 320
N_SRC = 384
# Context array rows (u8): contours + flags + segment map (built after
# the plan).
C_TOPY, C_LEFTY, C_TLY = 0, 16, 32
C_TOPU, C_LEFTU, C_TLU = 33, 41, 49
C_TOPV, C_LEFTV, C_TLV = 50, 58, 66
C_HT, C_HL, C_SEG = 67, 68, 69
N_CTX = 96  # padded to a multiple of 32 (u8 sublane tile)

WEIGHT_Y_FLAT = (38, 32, 20, 9, 32, 28, 17, 7,
                 20, 17, 10, 4, 9, 7, 4, 2)
_WY = np.asarray(WEIGHT_Y_FLAT, np.int32).reshape(4, 4)


def _fdct_k(d):
    """Exact VP8 FDCT. d: [nb, 4r, 4c, 8, 128] i32 (src - pred).
    Returns coeffs [nb, 4, 4, 8, 128] (row-major (r, c))."""
    d0, d1, d2, d3 = d[:, :, 0], d[:, :, 1], d[:, :, 2], d[:, :, 3]
    a0, a1, a2, a3 = d0 + d3, d1 + d2, d1 - d2, d0 - d3
    t0 = (a0 + a1) * 8
    t1 = (a2 * 2217 + a3 * 5352 + 1812) >> 9
    t2 = (a0 - a1) * 8
    t3 = (a3 * 2217 - a2 * 5352 + 937) >> 9
    tmp = jnp.stack([t0, t1, t2, t3], axis=2)        # [nb, r, t, 8, 128]
    m0, m1, m2, m3 = tmp[:, 0], tmp[:, 1], tmp[:, 2], tmp[:, 3]
    a0, a1, a2, a3 = m0 + m3, m1 + m2, m1 - m2, m0 - m3
    o0 = (a0 + a1 + 7) >> 4
    o2 = (a0 - a1 + 7) >> 4
    # (a3 != 0) as arithmetic: Mosaic rejects relayouts of multi-dim i1.
    o1 = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + jnp.minimum(jnp.abs(a3), 1)
    o3 = (a3 * 2217 - a2 * 5352 + 51000) >> 16
    return jnp.stack([o0, o1, o2, o3], axis=1)


C1 = 20091
C2 = 35468


def _mul1(a):
    return ((a * C1) >> 16) + a


def _mul2(a):
    return (a * C2) >> 16


def _idct_k(c):
    """Exact VP8 inverse DCT. c: [nb, 4, 4, 8, 128] i32 (r, c)."""
    i0, i1, i2, i3 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    a = i0 + i2
    b = i0 - i2
    cc = _mul2(i1) - _mul1(i3)
    d = _mul1(i1) + _mul2(i3)
    tmp = jnp.stack([a + d, b + cc, b - cc, a - d], axis=1)
    dc = tmp[:, :, 0] + 4
    a = dc + tmp[:, :, 2]
    b = dc - tmp[:, :, 2]
    cc = _mul2(tmp[:, :, 1]) - _mul1(tmp[:, :, 3])
    d = _mul1(tmp[:, :, 1]) + _mul2(tmp[:, :, 3])
    return jnp.stack([a + d, b + cc, b - cc, a - d], axis=2) >> 3


def _fwht_k(d):
    """Forward WHT over block DCs. d: [4br, 4bc, 8, 128] i32."""
    c0, c1, c2, c3 = d[:, 0], d[:, 1], d[:, 2], d[:, 3]
    a0, a1, a2, a3 = c0 + c2, c1 + c3, c1 - c3, c0 - c2
    tmp = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=1)
    r0, r1, r2, r3 = tmp[0], tmp[1], tmp[2], tmp[3]
    a0, a1, a2, a3 = r0 + r2, r1 + r3, r1 - r3, r0 - r2
    return jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=0) >> 1


def _iwht_k(c):
    """Inverse WHT. c: [4, 4, 8, 128] i32 -> rec DCs [4, 4, 8, 128].
    Mirrors planar.wht4x4_p: stage 1 slices axis 0, stage 2 axis 1."""
    i0, i1, i2, i3 = c[0], c[1], c[2], c[3]
    a0, a1, a2, a3 = i0 + i3, i1 + i2, i1 - i2, i0 - i3
    tmp = jnp.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2], axis=0)
    dc = tmp[:, 0] + 3
    a0 = dc + tmp[:, 3]
    a1 = tmp[:, 1] + tmp[:, 2]
    a2 = tmp[:, 1] - tmp[:, 2]
    a3 = dc - tmp[:, 3]
    return jnp.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2], axis=1) >> 3


def _hadamard_w(x):
    """Weighted-abs Hadamard per block: x [nb, 4, 4, 8, 128] i32 ->
    [nb, 8, 128] (metrics._hadamard4 + WEIGHT_Y sum)."""
    c0, c1, c2, c3 = x[:, :, 0], x[:, :, 1], x[:, :, 2], x[:, :, 3]
    a0, a1 = c0 + c2, c1 + c3
    a2, a3 = c1 - c3, c0 - c2
    t = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=2)
    r0, r1, r2, r3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    a0, a1 = r0 + r2, r1 + r3
    a2, a3 = r1 - r3, r0 - r2
    h = jnp.stack([a0 + a1, a3 + a2, a3 - a2, a0 - a1], axis=1)
    # Static-scalar weights (array constants can't be captured in pallas).
    acc = None
    for r in range(4):
        for c in range(4):
            v = int(_WY[r, c]) * jnp.abs(h[:, r, c])
            acc = v if acc is None else acc + v
    return acc


def _level_cost(v, lvl_cost, tail_cost):
    """approx rate per-level cost (fastpath.RateTables select tree).
    lvl_cost/tail_cost are the POSITION's own rows (band-exact)."""
    vc = jnp.minimum(v, 7)
    bit0 = (vc & 1) != 0
    bit1 = (vc & 2) != 0
    c01 = jnp.where(bit0, int(lvl_cost[1]), int(lvl_cost[0]))
    c23 = jnp.where(bit0, int(lvl_cost[3]), int(lvl_cost[2]))
    c45 = jnp.where(bit0, int(lvl_cost[5]), int(lvl_cost[4]))
    c67 = jnp.where(bit0, int(lvl_cost[7]), int(lvl_cost[6]))
    c = jnp.where(vc >= 4, jnp.where(bit1, c67, c45),
                  jnp.where(bit1, c23, c01))
    tc = tuple(int(t) for t in tail_cost)
    c = c + jnp.where(v >= 8, tc[0], 0)
    for thr, delta in ((11, tc[1] - tc[0]), (19, tc[2] - tc[1]),
                       (35, tc[3] - tc[2])):
        if delta:
            c = c + jnp.where(v >= thr, delta, 0)
    return c


def _kernel(src_ref, ctx_ref, qtab_ref, lam_ref, mode_ref, uv_ref,
            score_ref, *, lvl, tail, eob1, eob2, empty, fc16, fcuv,
            use_td):
    """One tile of TILE macroblock lanes.

    src rows (u8, R_* constants): srcY [16blk x 16pos], srcU/V
    [4blk x 16pos]. ctx rows (C_* constants): 16-px top/left contours +
    corners per plane, has_top/has_left flags, segment id.
    qtab: [1, 48, 16] i32 — rows = type*16 + seg*4 + param (types
    y1/y2/uv, params q/iq/bias/sharpen), zigzag columns.
    lam: [1, 1, 128] f32 — lam_i16[4] @0, lam_uv[4] @4, tlsd4[4] @8,
    lam_mode[4] @12 (the split-decision lambda: mode selection runs at
    lam_i16, but score_ref emits the winner's lam_mode-rescored total —
    see phase1p.phase1_planar).
    """
    S = src_ref.shape[1]
    d = src_ref[:, :].reshape(N_SRC, S // 128, 128)
    c = ctx_ref[:, :].reshape(N_CTX, S // 128, 128)
    sub = S // 128

    def rows(lo, n):
        return c[lo:lo + n].astype(jnp.int32)

    seg = c[C_SEG].astype(jnp.int32)
    ht = c[C_HT] != 0
    hl = c[C_HL] != 0

    def qrow(tb, param, zz):
        v = qtab_ref[0, tb * 16 + param, zz]
        for s in range(1, 4):
            v = jnp.where(seg == s, qtab_ref[0, tb * 16 + s * 4 + param, zz],
                          v)
        return v

    def lam_of(base):
        v = lam_ref[0, 0, base] * jnp.ones((sub, 128), jnp.float32)
        for s in range(1, 4):
            v = jnp.where(seg == s, lam_ref[0, 0, base + s], v)
        return v

    lam16 = lam_of(0)
    lamuv = lam_of(4)
    lam_md = lam_of(12)
    if use_td:
        tlsd = lam_of(8)

    # Only the y1 rows are hoisted (used 4 modes x 16 blocks); y2/uv rows
    # are rebuilt per use — keeping all 192 [sub, 128] rows live pushes
    # the kernel past the 16 MB VMEM budget.
    qrows = {0: [[qrow(0, p, zz) for zz in range(16)] for p in range(4)]}

    def qrows_of(tb):
        if tb in qrows:
            return qrows[tb]
        return [[qrow(tb, p, zz) for zz in range(16)] for p in range(4)]

    def quant_rate(co, tb, pt, first, want_dq):
        """co: list of 16 [sub,128] raster coeffs. Returns (rate, disto_ac,
        dq list or None, dc_level_saved) using zigzag order; with first=1
        position 0 is excluded from rate and its disto left to the caller.
        """
        q_r, iq_r, b_r, s_r = qrows_of(tb)
        rate = jnp.zeros((sub, 128), jnp.int32)
        run_cost = jnp.zeros((sub, 128), jnp.int32)
        has_any = jnp.zeros((sub, 128), bool)
        disto = jnp.zeros((sub, 128), jnp.int32)
        pend = jnp.zeros((sub, 128), jnp.int32)
        dq = [None] * 16 if want_dq else None
        for zz in range(first, 16):
            czz = co[int(ZIGZAG[zz])]
            mag = jnp.abs(czz) + s_r[zz]
            level = jnp.minimum((mag * iq_r[zz] + b_r[zz]) >> QFIX,
                                MAX_LEVEL)
            dqz = level * q_r[zz]
            if want_dq:
                dq[int(ZIGZAG[zz])] = jnp.where(czz < 0, -dqz, dqz)
            e = jnp.abs(czz) - dqz
            disto = disto + e * e
            c = _level_cost(level, lvl[pt][zz], tail[pt][zz])
            nz = level != 0
            run_cost = run_cost + c
            rate = jnp.where(nz, rate + run_cost, rate)
            run_cost = jnp.where(nz, 0, run_cost)
            has_any = has_any | nz
            # Pending EOB bit if the block terminates here (band[zz+1],
            # ctx from the last level — RateTables.eob1p/eob2p).
            e_zz = jnp.where(level == 1, int(eob1[pt][zz]),
                             int(eob2[pt][zz]))
            pend = jnp.where(nz, e_zz, pend)
        rate = jnp.where(has_any, rate + pend, int(empty[pt][first]))
        return rate, disto, dq

    # ------------------------------------------------------------------
    # Luma I16.
    # ------------------------------------------------------------------
    # Source blocks stay u8 (values 0..255) and upcast per consumer: the
    # persistent i32 copy costs 1 MB of the 16 MB VMEM budget.
    srcY8 = d[R_SRCY:R_SRCY + 256].reshape(16, 4, 4, sub, 128)
    topY = rows(C_TOPY, 16)
    leftY = rows(C_LEFTY, 16)
    tlY = c[C_TLY].astype(jnp.int32)

    # Masks broadcast across leading dims as integer blends: Mosaic cannot
    # relayout an i1 vector to a replicated leading dimension.
    hti = ht.astype(jnp.int32)
    hli = hl.astype(jnp.int32)
    top_m = hti * topY + (1 - hti) * 127               # [16, sub, 128]
    left_m = hli * leftY + (1 - hli) * 129
    # where(ht, 129, 127) with two scalar branches trips a Mosaic i1
    # relayout; 127 + 2*hti is the same value.
    tl_m = jnp.where(ht & hl, tlY, 127 + 2 * hti)
    sum_t = top_m.sum(axis=0)
    sum_l = left_m.sum(axis=0)
    dc16 = jnp.where(ht & hl, (sum_t + sum_l + 16) >> 5,
                     jnp.where(ht, (sum_t + 8) >> 4,
                               jnp.where(hl, (sum_l + 8) >> 4, 0x80)))
    T4 = top_m.reshape(4, 4, sub, 128)                 # [bc, pc, ...]
    L4 = left_m.reshape(4, 4, sub, 128)                # [br, pr, ...]

    if use_td:
        ha_src = _hadamard_w(srcY8.astype(jnp.int32))  # [16, sub, 128]

    best_score = jnp.full((sub, 128), jnp.inf, jnp.float32)
    best_rate = jnp.zeros((sub, 128), jnp.float32)
    best_D = jnp.zeros((sub, 128), jnp.float32)
    best_mode = jnp.zeros((sub, 128), jnp.int32)
    for m in range(4):
        shape = (4, 4, 4, 4, sub, 128)                 # [br, bc, pr, pc]
        if m == 0:
            pred = jnp.broadcast_to(dc16, shape)
        elif m == 1:
            pred = jnp.clip(L4[:, None, :, None] + T4[None, :, None, :]
                            - tl_m, 0, 255)
        elif m == 2:
            pred = jnp.broadcast_to(T4[None, :, None, :], shape)
        else:
            pred = jnp.broadcast_to(L4[:, None, :, None], shape)
        pred = pred.reshape(16, 4, 4, sub, 128)
        co44 = _fdct_k(srcY8.astype(jnp.int32) - pred)  # [16, 4, 4, ...]
        # Per-block AC quant/rate/disto; collect DCs for the WHT.
        rate = jnp.zeros((sub, 128), jnp.int32)
        disto = jnp.zeros((sub, 128), jnp.int32)
        dcs = []
        for b in range(16):
            cb = [co44[b, p // 4, p % 4] for p in range(16)]
            dcs.append(cb[0])
            r_b, d_b, _ = quant_rate(cb, 0, 0, 1, False)
            rate = rate + r_b
            disto = disto + d_b
        # WHT + y2 quant + rec DC.
        wht = _fwht_k(jnp.stack(dcs, axis=0).reshape(4, 4, sub, 128))
        whtl = [wht[p // 4, p % 4] for p in range(16)]
        r_y2, _, y2dq = quant_rate(whtl, 1, 1, 0, True)
        rec_dc = _iwht_k(jnp.stack(y2dq, axis=0).reshape(4, 4, sub, 128))
        rec_l = [rec_dc[p // 4, p % 4] for p in range(16)]
        for b in range(16):
            e0 = dcs[b] - rec_l[b]
            disto = disto + e0 * e0
        rate = rate + r_y2 + int(fc16[m])
        D = 64.0 * disto.astype(jnp.float32)
        if use_td:
            # Perceptual SD (reference TDisto16x16 + TLambdaSD). Levels
            # are requantized per block here instead of stored in pass A
            # — storing all 256 dequant rows blows the 16 MB VMEM budget.
            q_r, iq_r, b_r, s_r = qrows_of(0)
            td = jnp.zeros((sub, 128), jnp.int32)
            for b in range(16):
                dq = [None] * 16
                for zz in range(1, 16):
                    czz = co44[b, int(ZIGZAG[zz]) // 4, int(ZIGZAG[zz]) % 4]
                    mag = jnp.abs(czz) + s_r[zz]
                    level = jnp.minimum((mag * iq_r[zz] + b_r[zz]) >> QFIX,
                                        MAX_LEVEL)
                    dqz = level * q_r[zz]
                    dq[int(ZIGZAG[zz])] = jnp.where(czz < 0, -dqz, dqz)
                dq[0] = rec_l[b]
                dq44 = jnp.stack(
                    [jnp.stack([dq[r * 4 + c] for c in range(4)], axis=0)
                     for r in range(4)], axis=0)
                rec = jnp.clip(pred[b] + _idct_k(dq44[None])[0], 0, 255)
                ha_rec = _hadamard_w(rec[None])[0]
                td = td + (jnp.abs(ha_rec - ha_src[b]) >> 5)
            D = D + tlsd * td.astype(jnp.float32)
        score = rate.astype(jnp.float32) * lam16 + D
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_rate = jnp.where(better, rate.astype(jnp.float32), best_rate)
        best_D = jnp.where(better, D, best_D)
        best_mode = jnp.where(better, m, best_mode)

    mode_ref[0, :] = best_mode.reshape(S)
    score_ref[0, :] = (best_rate * lam_md + best_D).reshape(S)

    # ------------------------------------------------------------------
    # Chroma UV (joint U+V score).
    # ------------------------------------------------------------------
    def plane_ctx(r_top, r_left, r_tl):
        topc = hti * rows(r_top, 8) + (1 - hti) * 127
        leftc = hli * rows(r_left, 8) + (1 - hli) * 129
        tlc = jnp.where(ht & hl, c[r_tl].astype(jnp.int32), 127 + 2 * hti)
        st = topc.sum(axis=0)
        sl = leftc.sum(axis=0)
        dc = jnp.where(ht & hl, (st + sl + 8) >> 4,
                       jnp.where(ht, (st + 4) >> 3,
                                 jnp.where(hl, (sl + 4) >> 3, 0x80)))
        return topc.reshape(2, 4, sub, 128), leftc.reshape(2, 4, sub, 128), \
            tlc, dc

    srcU8 = d[R_SRCU:R_SRCU + 64].reshape(4, 4, 4, sub, 128)
    srcV8 = d[R_SRCV:R_SRCV + 64].reshape(4, 4, 4, sub, 128)
    TU, LU, tlU, dcU = plane_ctx(C_TOPU, C_LEFTU, C_TLU)
    TV, LV, tlV, dcV = plane_ctx(C_TOPV, C_LEFTV, C_TLV)

    best_uv_score = jnp.full((sub, 128), jnp.inf, jnp.float32)
    best_uv = jnp.zeros((sub, 128), jnp.int32)
    for m in range(4):
        rate = jnp.full((sub, 128), int(fcuv[m]), jnp.int32)
        disto = jnp.zeros((sub, 128), jnp.int32)
        for src8, (Tc, Lc, tlc, dcc) in ((srcU8, (TU, LU, tlU, dcU)),
                                         (srcV8, (TV, LV, tlV, dcV))):
            shape = (2, 2, 4, 4, sub, 128)
            if m == 0:
                pred = jnp.broadcast_to(dcc, shape)
            elif m == 1:
                pred = jnp.clip(Lc[:, None, :, None] + Tc[None, :, None, :]
                                - tlc, 0, 255)
            elif m == 2:
                pred = jnp.broadcast_to(Tc[None, :, None, :], shape)
            else:
                pred = jnp.broadcast_to(Lc[:, None, :, None], shape)
            pred = pred.reshape(4, 4, 4, sub, 128)
            co44 = _fdct_k(src8.astype(jnp.int32) - pred)
            for b in range(4):
                cb = [co44[b, p // 4, p % 4] for p in range(16)]
                r_b, d_b, _ = quant_rate(cb, 2, 2, 0, False)
                rate = rate + r_b
                disto = disto + d_b
        score = (rate.astype(jnp.float32) * lamuv
                 + 64.0 * disto.astype(jnp.float32))
        better = score < best_uv_score
        best_uv_score = jnp.where(better, score, best_uv_score)
        best_uv = jnp.where(better, m, best_uv)

    uv_ref[0, :] = best_uv.reshape(S)


@functools.lru_cache(maxsize=8)
def _build_call(n_lanes, lvl, tail, eob1, eob2, empty, fc16, fcuv,
                use_td, tiles_per_img,
                interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_kernel, lvl=lvl, tail=tail, eob1=eob1,
                               eob2=eob2, empty=empty,
                               fc16=fc16, fcuv=fcuv, use_td=use_td)
    grid = n_lanes // TILE
    tpi = tiles_per_img

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((N_SRC, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_CTX, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48, 16), lambda i: (i // tpi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i // tpi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, n_lanes), jnp.float32),
        ],
        # The TD variant's peak (pred + coeffs + recompute temps) sits
        # just above the 16 MB default scoped-vmem budget; v5e has the
        # physical headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _rate_consts(rt):
    """Static nested tuples of the position-resolved rate constants:
    lvl[pt][pos][8], tail[pt][pos][4], eob1/eob2[pt][pos], empty[pt][pos]
    (see fastpath.RateTables)."""
    t3 = lambda a: tuple(tuple(tuple(int(v) for v in r) for r in m)
                         for m in a)
    t2 = lambda a: tuple(tuple(int(v) for v in r) for r in a)
    return (t3(rt.lvlp), t3(rt.tailp), t2(rt.eob1p), t2(rt.eob2p),
            t2(rt.emptyp))


def phase1_scores_pallas(src, ctx, qtabs, lams, rt, fc16, fcuv, use_td,
                         tiles_per_img, interpret=False):
    """src: u8 [N_SRC, L]; ctx: u8 [N_CTX, L] (L = B * n_mb_pad,
    n_mb_pad % TILE == 0); qtabs: i32 [B, 48, 16]; lams: f32 [B, 1, 128].
    Returns (mode [L] i32, uvmode [L] i32, score [L] f32)."""
    L = src.shape[1]
    lvl, tail, eob1, eob2, empty = _rate_consts(rt)
    call = _build_call(L, lvl, tail, eob1, eob2, empty,
                       tuple(int(v) for v in fc16),
                       tuple(int(v) for v in fcuv),
                       bool(use_td), int(tiles_per_img), interpret)
    mode, uv, score = call(src, ctx, qtabs.astype(jnp.int32),
                           lams.astype(jnp.float32))
    return mode[0], uv[0], score[0]


# ---------------------------------------------------------------------------
# Segment-alpha kernel: per-MB texture alphas from the same src rows
# (phase 0; feeds the k-means plan). Mirrors phase1p._alphas_planar /
# fastpath._mb_alphas (reference computeAlphas, encode_analysis.go:245).
# ---------------------------------------------------------------------------

def _alpha_kernel(src_ref, alpha_ref, uv_ref):
    S = src_ref.shape[1]
    d = src_ref[:, :].reshape(N_SRC, S // 128, 128)
    sub = S // 128

    def hist_alpha(v_list):
        """v_list: C rows of [sub, 128] i32 values < 32 -> alpha [sub,128]
        (fastpath._hist_alpha)."""
        counts = []
        for k in range(32):
            acc = None
            for r in v_list:
                t = (r == k).astype(jnp.int32)
                acc = t if acc is None else acc + t
            counts.append(acc)
        max_value = counts[0]
        for k in range(1, 32):
            max_value = jnp.maximum(max_value, counts[k])
        last_nz = jnp.zeros((sub, 128), jnp.int32)
        for k in range(1, 32):
            last_nz = jnp.where(counts[k] > 0, k, last_nz)
        last_nz = jnp.maximum(last_nz, 1)
        # 510 * last_nz // max_value via exact f32 floor-division
        # (numerator <= 15810, denominator <= C: float32-exact).
        num = (510 * last_nz).astype(jnp.float32)
        den = jnp.maximum(max_value, 1).astype(jnp.float32)
        q = jnp.floor(num / den).astype(jnp.int32)
        alpha = jnp.where(max_value > 1, q, 0)
        return jnp.minimum(alpha, 255)

    def plane_alpha(lo, nb):
        blocks = d[lo:lo + nb * 16].astype(jnp.int32) \
            .reshape(nb, 4, 4, sub, 128)
        total = blocks.sum(axis=(0, 1, 2))
        mean = total.astype(jnp.float32) * (1.0 / (nb * 16))
        dc = jnp.round(mean).astype(jnp.int32)
        co = _fdct_k(blocks - dc)
        v = jnp.minimum(jnp.abs(co) >> 3, 31)
        return hist_alpha([v[b, p // 4, p % 4] for b in range(nb)
                           for p in range(16)])

    luma = plane_alpha(R_SRCY, 16)
    # Chroma: U then V blocks concatenated (fastpath._mb_alphas order).
    blocksU = d[R_SRCU:R_SRCU + 64].astype(jnp.int32) \
        .reshape(4, 4, 4, sub, 128)
    blocksV = d[R_SRCV:R_SRCV + 64].astype(jnp.int32) \
        .reshape(4, 4, 4, sub, 128)
    uvb = jnp.concatenate([blocksU, blocksV], axis=0)
    total = uvb.sum(axis=(0, 1, 2))
    dc = jnp.round(total.astype(jnp.float32) * (1.0 / 128)).astype(jnp.int32)
    co = _fdct_k(uvb - dc)
    v = jnp.minimum(jnp.abs(co) >> 3, 31)
    uv = hist_alpha([v[b, p // 4, p % 4] for b in range(8)
                     for p in range(16)])

    a = jnp.clip(255 - ((3 * luma + uv + 2) >> 2), 0, 255)
    alpha_ref[0, :] = a.reshape(S)
    # Pre-mix UV alpha: feeds the global dq_uv_ac derivation (reference
    # setSegmentParams, encode_analysis.go:163).
    uv_ref[0, :] = uv.reshape(S)


@functools.lru_cache(maxsize=4)
def _build_alpha_call(n_lanes, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _alpha_kernel,
        grid=(n_lanes // TILE,),
        in_specs=[pl.BlockSpec((N_SRC, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, n_lanes), jnp.int32),
                   jax.ShapeDtypeStruct((1, n_lanes), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def alphas_pallas(src, interpret=False):
    """src: u8 [N_SRC, L] -> (alphas [L], uv alphas [L]) i32 (0..255)."""
    a, uv = _build_alpha_call(src.shape[1], interpret)(src)
    return a[0], uv[0]
