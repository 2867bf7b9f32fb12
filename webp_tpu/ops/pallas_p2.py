"""Pallas TPU kernel for the phase-2 closed-loop wavefront (+ fused pack).

The jnp planar scan (ops/planar.py phase2_planar) pays two HBM taxes the
math does not require: every step's intermediates round-trip through HBM
between XLA fusions, and the scan's level output materializes as a
[T, 24, 16, N] int16 tensor (~250 MB at batch 32) that the pack stage
re-reads. This kernel runs the whole wavefront as a sequential pallas
grid over the anti-diagonal steps: the reconstructed-context carries
(bottom rows / right columns / corners per plane) live in VMEM scratch
across steps, each step's luma/I4/chroma pipelines stay in registers,
and the levels leave the chip already nibble-packed with per-MB escape
slots — the full int16 level tensor never exists.

Scope: the production default configuration — skew 1, no trellis, no
closed-loop search, single band (no halos), segment quantization and the
I4 reconstruction walk included. Everything else falls back to the jnp
scan. Values are bit-identical to phase2_planar + fastpath._pack_levels
(asserted in tests/test_pallas_p2.py); escape values ride a dense int8
side plane (|level| <= 127 at practical qualities; beyond that the image
takes the exact host fallback) from which the XLA epilogue gathers the
blob's compact escape list.

Reference behavior: encode_parallel.go:168 (the wavefront),
encode_frame.go:360-569 (residual pipelines), transforms.go (DCT/WHT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from .quant import QFIX, MAX_LEVEL, _WT
from .pallas_p1 import _fdct_k, _idct_k, _fwht_k, _iwht_k

ZIGZAG = np.asarray(T.ZIGZAG)

# meta input rows (u8).
MI_M, MI_UVM, MI_SEG, MI_I4F = 0, 1, 2, 3
N_META_IN = 8
# meta output rows (i32).
MO_BITMAP, MO_CNT, MO_SKIP, MO_BIG = 0, 1, 2, 3
N_META_OUT = 8


def _shift1(a, m_lane0, z00):
    """Planar lane shift out[l] = a[l-1] on [..., NS, 128] (sub-major
    flattened lanes); m_lane0/z00 are int {0,1} masks of lane==0 and
    l==0."""
    from jax.experimental.pallas import tpu as pltpu

    b = pltpu.roll(a, 1, axis=a.ndim - 1)
    c = pltpu.roll(b, 1, axis=a.ndim - 2)
    out = m_lane0 * c + (1 - m_lane0) * b
    return out * (1 - z00)


def _pred4_all_k(t, l, tl, tr):
    """Port of planar.pred4_all_p with trailing (NS, 128) dims.

    t/l/tr: [g, 4, NS, 128]; tl: [g, NS, 128]. Returns 10 predictions
    [g, 4, 4, NS, 128] in mode order DC,TM,VE,HE,RD,VR,LD,VL,HD,HU."""
    def a2(a, b):
        return (a + b + 1) >> 1

    def a3(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    # Explicit reverse (lax.rev on a leading axis is a Mosaic risk).
    l_rev = jnp.stack([l[:, 3], l[:, 2], l[:, 1], l[:, 0]], axis=1)
    ctx = jnp.concatenate([l_rev, tl[:, None], t, tr], axis=1)
    s3 = a3(ctx[:, :-2], ctx[:, 1:-1], ctx[:, 2:])          # [g, 11, ...]
    s2 = a2(ctx[:, :-1], ctx[:, 1:])                        # [g, 12, ...]
    lr = jnp.concatenate([ctx[:, 4:5], l, l[:, 3:4]], axis=1)
    s3h = a3(lr[:, :-2], lr[:, 1:-1], lr[:, 2:])            # [g, 4, ...]
    s2h = a2(lr[:, :-1], lr[:, 1:])                         # [g, 5, ...]
    l3 = l[:, 3]

    g = t.shape[0]
    tail = t.shape[2:]
    shape44 = (g, 4, 4) + tail

    def rows(*rs):
        return jnp.stack(rs, axis=1)

    dc = (t.sum(axis=1) + l.sum(axis=1) + 4) >> 3
    p_dc = jnp.broadcast_to(dc[:, None, None], shape44)
    p_tm = jnp.clip(l[:, :, None] + t[:, None, :] - tl[:, None, None],
                    0, 255)
    p_ve = jnp.broadcast_to(s3[:, 4:8][:, None], shape44)
    p_he = jnp.broadcast_to(s3h[:, :, None], shape44)
    p_rd = rows(s3[:, 3:7], s3[:, 2:6], s3[:, 1:5], s3[:, 0:4])
    c2 = s2[:, 4:8]
    d3 = s3[:, 3:7]
    p_vr = rows(c2, d3,
                jnp.concatenate([s3[:, 2:3], c2[:, 0:3]], axis=1),
                jnp.concatenate([s3[:, 1:2], d3[:, 0:3]], axis=1))
    f = jnp.concatenate(
        [s3[:, 5:11], a3(tr[:, 2], tr[:, 3], tr[:, 3])[:, None]], axis=1)
    p_ld = rows(f[:, 0:4], f[:, 1:5], f[:, 2:6], f[:, 3:7])
    g2 = s2[:, 5:9]
    g3 = s3[:, 5:9]
    p_vl = rows(g2, g3,
                jnp.concatenate([g2[:, 1:4], s3[:, 9:10]], axis=1),
                jnp.concatenate([g3[:, 1:4], s3[:, 10:11]], axis=1))
    hd0 = jnp.concatenate([s2h[:, 0:1], s3[:, 3:6]], axis=1)
    hd1 = jnp.concatenate([s2h[:, 1:2], s3h[:, 0:1], hd0[:, 0:2]], axis=1)
    hd2 = jnp.concatenate([s2h[:, 2:3], s3h[:, 1:2], hd1[:, 0:2]], axis=1)
    hd3 = jnp.concatenate([s2h[:, 3:4], s3h[:, 2:3], hd2[:, 0:2]], axis=1)
    p_hd = rows(hd0, hd1, hd2, hd3)
    l3b = jnp.broadcast_to(l3[:, None], (g, 4) + tail)
    hu0 = jnp.stack([s2h[:, 1], s3h[:, 1], s2h[:, 2], s3h[:, 2]], axis=1)
    hu1 = jnp.concatenate([hu0[:, 2:4], s2h[:, 3:4], s3h[:, 3:4]], axis=1)
    hu2 = jnp.concatenate([hu1[:, 2:4], l3b[:, 0:2]], axis=1)
    p_hu = rows(hu0, hu1, hu2, l3b)

    return [p_dc, p_tm, p_ve, p_he, p_rd, p_vr, p_ld, p_vl, p_hd, p_hu]


def _make_kernel(mb_w, mb_h, NS, rd_drop):
    """Builds the step kernel (all shapes/static params closed over)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wt = tuple(float(w) for w in np.asarray(_WT).ravel())
    rdf = float(rd_drop)

    def quantize_zz(co, q_r, iq_r, b_r, s_r, first, drop_mul, tlam_base):
        """co: 16 raster rows [NS,128] i32. Returns (lv 16 zigzag rows
        signed, dq 16 raster rows signed). Mirrors planar.quantize_p."""
        lv = [None] * 16
        dq = [None] * 16
        for zz in range(16):
            czz = co[int(ZIGZAG[zz])]
            neg = (czz < 0).astype(jnp.int32)
            mag = jnp.abs(czz) + s_r[zz]
            level = jnp.minimum((mag * iq_r[zz] + b_r[zz]) >> QFIX,
                                MAX_LEVEL)
            if rdf and drop_mul and zz >= 0:
                qf = q_r[zz].astype(jnp.float32)
                c0 = mag.astype(jnp.float32)
                dd = wt[zz] * (c0 * c0 - (c0 - qf) * (c0 - qf))
                drop = (256.0 * dd) < (rdf * drop_mul) * tlam_base
                level = jnp.where(drop & (level == 1), 0, level)
            if first and zz == 0:
                level = jnp.zeros_like(level)
            slv = (1 - 2 * neg) * level
            lv[zz] = slv
            dq[int(ZIGZAG[zz])] = slv * q_r[zz]
        return lv, dq

    def kernel(src_ref, meta_ref, i4m_ref, rows4_hbm,
               pk_ref, y2_ref, lv8_ref, mo_ref,
               cBy, cRy, cCy, cBu, cRu, cCu, cBv, cRv, cCv,
               rows4_ref, r4_sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            # Quant tables stay in HBM and land in scratch ONCE: as a
            # pipelined input their 6 MB block would be re-fetched every
            # wavefront step (measured: that re-DMA alone outweighed the
            # whole kernel).
            dma = pltpu.make_async_copy(rows4_hbm, rows4_ref, r4_sem)
            dma.start()
            dma.wait()
            cBy[...] = jnp.zeros(cBy.shape, jnp.int32)
            cRy[...] = jnp.zeros(cRy.shape, jnp.int32)
            cCy[...] = jnp.zeros(cCy.shape, jnp.int32)
            cBu[...] = jnp.zeros(cBu.shape, jnp.int32)
            cRu[...] = jnp.zeros(cRu.shape, jnp.int32)
            cCu[...] = jnp.zeros(cCu.shape, jnp.int32)
            cBv[...] = jnp.zeros(cBv.shape, jnp.int32)
            cRv[...] = jnp.zeros(cRv.shape, jnp.int32)
            cCv[...] = jnp.zeros(cCv.shape, jnp.int32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (NS, 128), 1)
        subi = jax.lax.broadcasted_iota(jnp.int32, (NS, 128), 0)
        lidx = subi * 128 + lane
        m_lane0 = (lane == 0).astype(jnp.int32)
        z00 = ((subi == 0) & (lane == 0)).astype(jnp.int32)

        yy = lidx % mb_h
        xcol = t - yy
        valid = (xcol >= 0) & (xcol < mb_w)
        has_left = valid & (xcol > 0)
        has_top = valid & (yy > 0)
        hti = has_top.astype(jnp.int32)
        hli = has_left.astype(jnp.int32)

        def sh1(a):
            return _shift1(a, m_lane0, z00)

        src = src_ref[0].reshape(384, NS, 128)
        meta = meta_ref[0].reshape(N_META_IN, NS, 128)
        i4m = i4m_ref[0].reshape(16, NS, 128).astype(jnp.int32)
        m16 = meta[MI_M].astype(jnp.int32)
        uvm = meta[MI_UVM].astype(jnp.int32)
        seg = meta[MI_SEG].astype(jnp.int32)
        i4f = meta[MI_I4F].astype(jnp.int32)

        # Per-lane quant rows by segment (integer blends).
        s_eq = [(seg == s).astype(jnp.int32) for s in range(4)]

        def qrow(tb, param, zz):
            v = s_eq[0] * rows4_ref[tb, 0, param, zz]
            for s in range(1, 4):
                v = v + s_eq[s] * rows4_ref[tb, s, param, zz]
            return v

        qrows = {tb: [[qrow(tb, p, zz) for zz in range(16)]
                      for p in range(4)] for tb in range(3)}

        def tlam_of(tb):
            q0 = qrows[tb][0][0].astype(jnp.float32)
            q1 = qrows[tb][0][1].astype(jnp.float32)
            base = jnp.floor((q0 + 15.0 * q1 + 8.0) * (1.0 / 16.0))
            return base * base * 0.25


        tlam_y1 = tlam_of(0)

        # ---------------- Luma I16 ----------------
        srcY = src[0:256].astype(jnp.int32).reshape(16, 4, 4, NS, 128)
        topY = sh1(cBy[...])                              # [16, NS, 128]
        leftY = cRy[...]
        tlY = sh1(cCy[1])                                 # corner from t-2
        corner_y = cCy[0]                                 # t-1 (for update)

        top_m = hti * topY + (1 - hti) * 127
        left_m = hli * leftY + (1 - hli) * 129
        tl_m = jnp.where(has_top & has_left, tlY, 127 + 2 * hti)
        sum_t = top_m.sum(axis=0)
        sum_l = left_m.sum(axis=0)
        dc16 = jnp.where(has_top & has_left, (sum_t + sum_l + 16) >> 5,
                         jnp.where(has_top, (sum_t + 8) >> 4,
                                   jnp.where(has_left, (sum_l + 8) >> 4,
                                             0x80)))
        T4 = top_m.reshape(4, 4, NS, 128)
        L4 = left_m.reshape(4, 4, NS, 128)
        shp = (4, 4, 4, 4, NS, 128)
        p_dc = jnp.broadcast_to(dc16, shp)
        p_tm = jnp.clip(L4[:, None, :, None] + T4[None, :, None, :]
                        - tl_m, 0, 255)
        p_v = jnp.broadcast_to(T4[None, :, None, :], shp)
        p_h = jnp.broadcast_to(L4[:, None, :, None], shp)
        me = [(m16 == k).astype(jnp.int32) for k in range(4)]
        pred = (me[0] * p_dc + me[1] * p_tm + me[2] * p_v + me[3] * p_h) \
            .reshape(16, 4, 4, NS, 128)
        co44 = _fdct_k(srcY - pred)

        y1q = qrows[0]
        lv16 = [None] * 16                 # per block: 16 zigzag rows
        dq16 = [None] * 16
        dcs = []
        for b in range(16):
            cb = [co44[b, p // 4, p % 4] for p in range(16)]
            dcs.append(cb[0])
            lvb, dqb = quantize_zz(cb, y1q[0], y1q[1], y1q[2], y1q[3],
                                   first=1, drop_mul=1.0,
                                   tlam_base=tlam_y1)
            lv16[b] = lvb
            dq16[b] = dqb
        wht = _fwht_k(jnp.stack(dcs, axis=0).reshape(4, 4, NS, 128))
        whtl = [wht[p // 4, p % 4] for p in range(16)]
        y2q = qrows[1]
        y2lv, y2dq = quantize_zz(whtl, y2q[0], y2q[1], y2q[2], y2q[3],
                                 first=0, drop_mul=0.0, tlam_base=None)
        rec_dc = _iwht_k(jnp.stack(y2dq, axis=0).reshape(4, 4, NS, 128))
        rec16 = []
        for b in range(16):
            dqb = list(dq16[b])
            dqb[0] = rec_dc[b // 4, b % 4]
            dq44 = jnp.stack(
                [jnp.stack([dqb[r * 4 + c] for c in range(4)], axis=0)
                 for r in range(4)], axis=0)
            rec16.append(jnp.clip(pred[b] + _idct_k(dq44[None])[0], 0, 255))


        # ---------------- I4 closed-loop walk ----------------
        top_row = hti * topY + (1 - hti) * 127
        left_col = hli * leftY + (1 - hli) * 129
        tl0 = jnp.where(has_top & has_left, tlY, 127 + 2 * hti)
        trs_row = hti * topY[15] + (1 - hti) * 127        # edge-replicated

        groups = [[(0, 0)], [(0, 1)], [(0, 2), (1, 0)], [(0, 3), (1, 1)],
                  [(1, 2), (2, 0)], [(1, 3), (2, 1)], [(2, 2), (3, 0)],
                  [(2, 3), (3, 1)], [(3, 2)], [(3, 3)]]
        wb = {}
        lv4 = [None] * 16

        def ctx_of(r, c):
            tt = jnp.stack([top_row[c * 4 + i] for i in range(4)], axis=0) \
                if r == 0 else wb[(r - 1, c)][3]
            ll = jnp.stack([left_col[r * 4 + i] for i in range(4)], axis=0) \
                if c == 0 else wb[(r, c - 1)][:, 3]
            if r == 0 and c == 0:
                tl = tl0
            elif r == 0:
                tl = top_row[c * 4 - 1]
            elif c == 0:
                tl = left_col[r * 4 - 1]
            else:
                tl = wb[(r - 1, c - 1)][3, 3]
            if c == 3:
                tr = jnp.stack([trs_row] * 4, axis=0)
            elif r == 0:
                tr = jnp.stack([top_row[c * 4 + 4 + i] for i in range(4)],
                               axis=0)
            else:
                tr = wb[(r - 1, c + 1)][3]
            return tt, ll, tl, tr

        for group in groups:
            g = len(group)
            ctxs = [ctx_of(r, c) for (r, c) in group]
            tg = jnp.stack([cx[0] for cx in ctxs], axis=0)
            lg = jnp.stack([cx[1] for cx in ctxs], axis=0)
            tlg = jnp.stack([cx[2] for cx in ctxs], axis=0)
            trg = jnp.stack([cx[3] for cx in ctxs], axis=0)
            preds = _pred4_all_k(tg, lg, tlg, trg)   # 10 x [g,4,4,NS,128]
            mode = jnp.stack([i4m[r * 4 + c] for (r, c) in group], axis=0)
            msel = [(mode == k).astype(jnp.int32)[:, None, None]
                    for k in range(10)]
            predg = msel[0] * preds[0]
            for k in range(1, 10):
                predg = predg + msel[k] * preds[k]
            srcg = jnp.stack([srcY[r * 4 + c] for (r, c) in group], axis=0)
            cog = _fdct_k(srcg - predg)              # [g, 4, 4, NS, 128]
            for i, (r, c) in enumerate(group):
                cb = [cog[i, p // 4, p % 4] for p in range(16)]
                lvb, dqb = quantize_zz(cb, y1q[0], y1q[1], y1q[2], y1q[3],
                                       first=0, drop_mul=3.5,
                                       tlam_base=tlam_y1)
                lv4[r * 4 + c] = lvb
                dq44 = jnp.stack(
                    [jnp.stack([dqb[rr * 4 + cc] for cc in range(4)],
                               axis=0) for rr in range(4)], axis=0)
                wb[(r, c)] = jnp.clip(predg[i] + _idct_k(dq44[None])[0],
                                      0, 255)


        # Blend I16 vs I4 (levels + recon blocks).
        i4b = i4f
        lvY = [[i4b * lv4[b][z] + (1 - i4b) * lv16[b][z]
                for z in range(16)] for b in range(16)]
        y2out = [(1 - i4b) * y2lv[z] for z in range(16)]
        recY = [i4b * wb[(b // 4, b % 4)] + (1 - i4b) * rec16[b]
                for b in range(16)]

        # ---------------- Chroma ----------------
        def chroma(plane_lo, cB, cR, cC):
            srcC = src[plane_lo:plane_lo + 64].astype(jnp.int32) \
                .reshape(4, 4, 4, NS, 128)
            topC = sh1(cB[...])
            leftC = cR[...]
            tlC = sh1(cC[1])
            topc = hti * topC + (1 - hti) * 127
            leftc = hli * leftC + (1 - hli) * 129
            tlc = jnp.where(has_top & has_left, tlC, 127 + 2 * hti)
            st = topc.sum(axis=0)
            sl = leftc.sum(axis=0)
            dcc = jnp.where(has_top & has_left, (st + sl + 8) >> 4,
                            jnp.where(has_top, (st + 4) >> 3,
                                      jnp.where(has_left, (sl + 4) >> 3,
                                                0x80)))
            T2 = topc.reshape(2, 4, NS, 128)
            L2 = leftc.reshape(2, 4, NS, 128)
            shpc = (2, 2, 4, 4, NS, 128)
            pdc = jnp.broadcast_to(dcc, shpc)
            ptm = jnp.clip(L2[:, None, :, None] + T2[None, :, None, :]
                           - tlc, 0, 255)
            pv = jnp.broadcast_to(T2[None, :, None, :], shpc)
            ph = jnp.broadcast_to(L2[:, None, :, None], shpc)
            mc = [(uvm == k).astype(jnp.int32) for k in range(4)]
            predc = (mc[0] * pdc + mc[1] * ptm + mc[2] * pv + mc[3] * ph) \
                .reshape(4, 4, 4, NS, 128)
            coc = _fdct_k(srcC - predc)
            uvq = qrows[2]
            lvc = [None] * 4
            recc = [None] * 4
            for b in range(4):
                cb = [coc[b, p // 4, p % 4] for p in range(16)]
                lvb, dqb = quantize_zz(cb, uvq[0], uvq[1], uvq[2], uvq[3],
                                       first=0, drop_mul=0.0,
                                       tlam_base=None)
                lvc[b] = lvb
                dq44 = jnp.stack(
                    [jnp.stack([dqb[rr * 4 + cc] for cc in range(4)],
                               axis=0) for rr in range(4)], axis=0)
                recc[b] = jnp.clip(predc[b] + _idct_k(dq44[None])[0],
                                   0, 255)
            return lvc, recc

        lvU, recU = chroma(256, cBu, cRu, cCu)
        lvV, recV = chroma(320, cBv, cRv, cCv)


        # ---------------- Carry updates ----------------
        bot = jnp.stack([recY[12 + bc][3, pc] for bc in range(4)
                         for pc in range(4)], axis=0)
        rgt = jnp.stack([recY[br * 4 + 3][pr, 3] for br in range(4)
                         for pr in range(4)], axis=0)
        # Per-row scratch stores: a full-ref store of a freshly stacked
        # value crashes the LLO lowering on this toolchain.
        for i in range(16):
            cBy[i] = bot[i]
            cRy[i] = rgt[i]
        cCy[1] = corner_y
        cCy[0] = recY[15][3, 3]

        def chroma_carry(recc, cB, cR, cC):
            botc = [recc[2 + bc][3, pc] for bc in range(2)
                    for pc in range(4)]
            rgtc = [recc[br * 2 + 1][pr, 3] for br in range(2)
                    for pr in range(4)]
            old = cC[0]
            for i in range(8):
                cB[i] = botc[i]
                cR[i] = rgtc[i]
            cC[1] = old
            cC[0] = recc[3][3, 3]

        chroma_carry(recU, cBu, cRu, cCu)
        chroma_carry(recV, cBv, cRv, cCv)

        # ---------------- Fused pack ----------------
        # Nibble plane + per-MB escape bitmap + a dense int8 level plane
        # (clamped to +-127; |level| > 127 raises the big-flag, which the
        # caller turns into the exact host fallback — at practical
        # qualities levels stay far below it). The escape VALUES for the
        # blob's compact list are gathered sparsely from the int8 plane
        # by the XLA epilogue, so the 16-bit level tensor never exists.
        all_lv = ([lvY[b] for b in range(16)]
                  + [lvU[b] for b in range(4)]
                  + [lvV[b] for b in range(4)])     # 24 x 16 zigzag rows
        bitmap = jnp.zeros((NS, 128), jnp.int32)
        cnt = jnp.zeros((NS, 128), jnp.int32)
        big = jnp.zeros((NS, 128), jnp.int32)
        nz_total = jnp.zeros((NS, 128), jnp.int32)
        for b in range(24):
            lvb = all_lv[b]
            eb = jnp.zeros((NS, 128), jnp.int32)
            for z in range(16):
                a = jnp.abs(lvb[z])
                eb = jnp.maximum(eb, (a > 7).astype(jnp.int32))
                big = jnp.maximum(big, (a > 127).astype(jnp.int32))
                nz_total = nz_total + a
                v8 = jnp.clip(lvb[z], -127, 127)
                lv8_ref[0, b * 16 + z, :] = v8.astype(jnp.int8).reshape(-1)
            bitmap = bitmap + (eb << b)
            cnt = cnt + eb
            # Nibbles: escaped blocks ship zeros in the packed plane.
            for j in range(8):
                n0 = jnp.clip(lvb[2 * j], -7, 7) + 8
                n1 = jnp.clip(lvb[2 * j + 1], -7, 7) + 8
                byte = (1 - eb) * (n0 | (n1 << 4))
                pk_ref[0, b * 8 + j, :] = byte.astype(jnp.uint8).reshape(-1)
        for z in range(16):
            nz_total = nz_total + jnp.abs(y2out[z])
            y2_ref[0, z, :] = y2out[z].astype(jnp.int16).reshape(-1)
        mo_ref[0, MO_BITMAP, :] = bitmap.reshape(-1)
        mo_ref[0, MO_CNT, :] = cnt.reshape(-1)
        mo_ref[0, MO_SKIP, :] = (nz_total == 0).astype(jnp.int32) \
            .reshape(-1)
        mo_ref[0, MO_BIG, :] = big.reshape(-1)
        for r in range(MO_BIG + 1, N_META_OUT):
            mo_ref[0, r, :] = jnp.zeros((NS, 128), jnp.int32).reshape(-1)

    return kernel


@functools.lru_cache(maxsize=8)
def _build_call(mb_w, mb_h, NS, T_steps, rd_drop, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = NS * 128
    kernel = _make_kernel(mb_w, mb_h, NS, rd_drop)
    return pl.pallas_call(
        kernel,
        grid=(T_steps,),
        in_specs=[
            pl.BlockSpec((1, 384, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_META_IN, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 192, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 384, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_META_OUT, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_steps, 192, N), jnp.uint8),
            jax.ShapeDtypeStruct((T_steps, 16, N), jnp.int16),
            jax.ShapeDtypeStruct((T_steps, 384, N), jnp.int8),
            jax.ShapeDtypeStruct((T_steps, N_META_OUT, N), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, NS, 128), jnp.int32),   # cBy
            pltpu.VMEM((16, NS, 128), jnp.int32),   # cRy
            pltpu.VMEM((2, NS, 128), jnp.int32),    # cCy (t-1, t-2)
            pltpu.VMEM((8, NS, 128), jnp.int32),    # cBu
            pltpu.VMEM((8, NS, 128), jnp.int32),    # cRu
            pltpu.VMEM((2, NS, 128), jnp.int32),    # cCu
            pltpu.VMEM((8, NS, 128), jnp.int32),    # cBv
            pltpu.VMEM((8, NS, 128), jnp.int32),    # cRv
            pltpu.VMEM((2, NS, 128), jnp.int32),    # cCv
            pltpu.VMEM((3, 4, 4, 16, NS, 128), jnp.int32),  # rows4
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def phase2_pack_pallas(Y, U, V, modes, uvmodes, qp, mb_w, mb_h,
                       rd_drop=0.0, seg=None, i4=None, esc_cap=None,
                       interpret=False):
    """Pallas phase-2 + fused pack for the default configuration.

    Same contract as the (phase2_planar -> _pack_levels) pair: returns
    dict(packed [B, n_mb, 24, 8] u8, esc_idx [B, esc_cap] i32 block ids,
    esc_val [B, esc_cap, 16] i16, esc_cnt [B] i32, y2 [B, n_mb, 16] i16,
    skip [B, n_mb] bool). esc_cnt is forced above esc_cap when any level
    exceeds the int8 plane (|level| > 127 — triggers the caller's exact
    host fallback, like the global escape-capacity overflow).
    """
    from .planar import (_mb_planar, _skew_b, _unskew_b, _seg_rows_planar)

    B = Y.shape[0]
    n_mb = mb_w * mb_h
    N0 = B * mb_h
    sk = 1
    n_steps = mb_w + sk * (mb_h - 1)
    NS = -(-N0 // 128)
    N = NS * 128

    def lanes_pad(a):
        """[T, R, N0] -> [T, R, N] (pad lanes to the 128 boundary)."""
        if N == N0:
            return a
        return jnp.pad(a, ((0, 0), (0, 0), (0, N - N0)))

    def skew(a):
        return _skew_b(a, mb_w, mb_h, n_steps, sk)

    src = jnp.concatenate([
        skew(_mb_planar(Y.astype(jnp.uint8), mb_h, mb_w, 16)),
        skew(_mb_planar(U.astype(jnp.uint8), mb_h, mb_w, 8)),
        skew(_mb_planar(V.astype(jnp.uint8), mb_h, mb_w, 8)),
    ], axis=1)
    src = lanes_pad(src)

    def skew_row(a):
        """[B, n_mb] -> [T, 1, N0] skewed per-lane row."""
        return skew(a.reshape(B, mb_h, mb_w).astype(jnp.uint8))[:, None]

    if seg is not None:
        seg_map, seg_rows = seg
    else:
        seg_map = jnp.zeros((B, n_mb), jnp.int32)
    if i4 is not None:
        is_i4, i4_modes = i4
    else:
        is_i4 = jnp.zeros((B, n_mb), bool)
        i4_modes = jnp.zeros((B, n_mb, 16), jnp.uint8)

    meta = jnp.concatenate([
        skew_row(modes), skew_row(uvmodes), skew_row(seg_map),
        skew_row(is_i4.astype(jnp.uint8)),
        jnp.zeros((n_steps, N_META_IN - 4, N0), jnp.uint8),
    ], axis=1)
    meta = lanes_pad(meta)
    i4m_sk = lanes_pad(
        skew(i4_modes.reshape(B, mb_h, mb_w, 16)).astype(jnp.uint8))

    if seg is not None:
        r4 = jnp.stack([_seg_rows_planar(seg_rows[k].astype(jnp.int32),
                                         B, mb_h)
                        for k in ("y1", "y2", "uv")], axis=0)  # [3,4,4,16,N0]
        if N != N0:
            r4 = jnp.pad(r4, ((0, 0),) * 4 + ((0, N - N0),))
        rows4 = r4.reshape(3, 4, 4, 16, NS, 128)
    else:
        one = np.stack([np.stack([np.asarray(qp[k][i], np.int32)
                                  .reshape(16) for i in range(4)])
                        for k in ("y1", "y2", "uv")])          # [3, 4, 16]
        r4 = np.broadcast_to(one[:, None, :, :, None],
                             (3, 4, 4, 16, N)).copy()
        rows4 = jnp.asarray(r4.reshape(3, 4, 4, 16, NS, 128))

    call = _build_call(mb_w, mb_h, NS, n_steps, float(rd_drop), interpret)
    pk, y2o, lv8, mo = call(src, meta, i4m_sk, rows4)

    def unskew(a):
        return _unskew_b(a[:, :, :N0], B, mb_w, mb_h, n_steps, sk)

    packed = unskew(pk).reshape(B, n_mb, 24, 8)
    y2 = unskew(y2o)                                   # [B, n_mb, 16]
    meta_u = unskew(mo)                                # [B, n_mb, 8]

    over = meta_u[..., MO_BIG].any(axis=1)
    skip = meta_u[..., MO_SKIP].astype(bool)
    bitmap = meta_u[..., MO_BITMAP]                    # [B, n_mb] 24 bits

    # Escape list, same semantics as fastpath._pack_levels: ascending
    # block ids of every block holding |level| > 7, values gathered
    # SPARSELY from the still-skewed int8 plane (the unskewed int16
    # level tensor never exists).
    flags = ((bitmap[..., None] >> jnp.arange(24)) & 1).astype(bool) \
        .reshape(B, n_mb * 24)
    n_blk = n_mb * 24
    blk_i = jnp.arange(n_blk, dtype=jnp.int32)
    keys = jnp.where(flags, blk_i[None, :], jnp.int32(n_blk))
    idx = jax.lax.sort(keys, dimension=1, is_stable=False)[:, :esc_cap]
    idx = jnp.where(idx >= n_blk, 0, idx)
    mb_i = idx // 24
    c_i = idx % 24
    # Skewed address of MB (x, y) at step t = x + y, lane = b*mb_h + y.
    y_of = mb_i // mb_w
    x_of = mb_i % mb_w
    t_of = x_of + y_of
    lv8_flat = lv8.reshape(-1)
    j16 = (jnp.arange(16, dtype=jnp.int32) * N)[None, :]

    def gather_one(b, tt, cc, yy):
        base = (tt * 384 + cc * 16) * N + b * mb_h + yy
        return lv8_flat[base[:, None] + j16]

    esc_val = jax.vmap(gather_one)(
        jnp.arange(B, dtype=jnp.int32), t_of, c_i, y_of).astype(jnp.int16)
    esc_cnt = jnp.where(over, jnp.int32(esc_cap + 1),
                        flags.sum(axis=1).astype(jnp.int32))

    return {"packed": packed, "esc_idx": idx.astype(jnp.int32),
            "esc_val": esc_val, "esc_cnt": esc_cnt,
            "y2": y2.astype(jnp.int16), "skip": skip}
