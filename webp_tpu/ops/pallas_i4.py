"""Pallas TPU kernel for the I4 (4x4 intra) mode search.

The jnp formulation of the 10-mode search (ops/i4.py i4_search) is
HBM-bound: ten fdct->quantize->rate pipelines each stream ~60 elementwise
ops over [n_sb, 16] int32 intermediates, and XLA does not fuse across
them (measured 73 ms of the 186 ms batch-16 encode on a v5e). This kernel
keeps the whole search in VMEM: per grid step it loads a planar tile of
subblocks (src coefficients + the 13-pixel prediction contour), evaluates
all 10 predictors, the forward DCT, quantization, the approximate rate
model and the RD score entirely on-chip, and writes only the winning mode
and score.

Layouts are planar [row, lane]: the subblock axis rides the 128-wide VPU
lanes, rows are pixel/coefficient positions (the [..., 16]-last layouts
the jnp path uses waste 7/8 of each lane group).

Math is bit-identical to ops/i4.py + ops/dct.py + ops/quant.py (asserted
by tests/test_pallas.py), so the kernel and the jnp fallback choose the
same modes.
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
TILE = 2048  # subblocks per grid step -> (16, 128) rows fill vregs


def _a2(a, b):
    return (a + b + 1) >> 1


def _a3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


WEIGHT_Y_FLAT = (38, 32, 20, 9, 32, 28, 17, 7,
                 20, 17, 10, 4, 9, 7, 4, 2)


def _hadamard_rows(x):
    """Weighted-abs Hadamard sum over a block given 16 [S] rows
    (metrics._hadamard4 in row-list form)."""
    t = [None] * 16
    for r in range(4):
        x0, x1, x2, x3 = x[r * 4], x[r * 4 + 1], x[r * 4 + 2], x[r * 4 + 3]
        a0, a1, a2, a3 = x0 + x2, x1 + x3, x1 - x3, x0 - x2
        t[r * 4 + 0] = a0 + a1
        t[r * 4 + 1] = a3 + a2
        t[r * 4 + 2] = a3 - a2
        t[r * 4 + 3] = a0 - a1
    acc = None
    for c in range(4):
        r0, r1, r2, r3 = t[c], t[4 + c], t[8 + c], t[12 + c]
        a0, a1, a2, a3 = r0 + r2, r1 + r3, r1 - r3, r0 - r2
        outs = (a0 + a1, a3 + a2, a3 - a2, a0 - a1)
        for r in range(4):
            v = int(WEIGHT_Y_FLAT[r * 4 + c]) * jnp.abs(outs[r])
            acc = v if acc is None else acc + v
    return acc


def _kernel(data_ref, qtab_ref, lam_ref, mode_ref, score_ref, *,
            lvl_cost, tail_cost, eob1_cost, eob2_cost, empty_cost,
            mode_cost, tr_modes, use_td):
    """One tile: data [32, S] u8 = src pixels (rows 0-15, raster p = r*4+c)
    stacked over ctx (rows 16-31): 16-19 = l3..l0, 20 = tl, 21-24 = t0..t3,
    25-28 = tr0..tr3, 29 = is_c3, 30 = segment id. One u8 ref instead of
    two i32 refs: the host-side layout change into planar [.., n_sb] is
    HBM-bound, so shipping bytes and upcasting here costs 4x less.
    qtab [16, 16]: (seg*4 + {q,iq,bias,sharpen}) x zigzag position."""
    # Each logical row is reshaped from [S] to [S//128, 128]: Mosaic lays
    # a 1-D vector across lanes only (one sublane per vreg), so the whole
    # search would run at 1/8 VPU utilization; 2-D rows pack (8, 128)
    # vregs fully.
    S = data_ref.shape[1]
    d = data_ref[:, :].reshape(32, S // 128, 128).astype(jnp.int32)
    src = d[:16]
    l = [d[16 + 3 - i] for i in range(4)]              # l0..l3
    tl = d[20]
    t = [d[21 + i] for i in range(4)]
    tr = [d[25 + i] for i in range(4)]
    is_c3 = d[29] != 0
    seg = d[30]

    # Smoothed strips over the contour [l3 l2 l1 l0 tl t0..t3 tr0..tr3]
    # (same construction as ops/i4.py pred4_all).
    contour = [l[3], l[2], l[1], l[0], tl] + t + tr     # 13 rows
    s3 = [_a3(contour[i], contour[i + 1], contour[i + 2])
          for i in range(11)]
    s2 = [_a2(contour[i], contour[i + 1]) for i in range(12)]
    lr = [tl, l[0], l[1], l[2], l[3], l[3]]
    s3h = [_a3(lr[i], lr[i + 1], lr[i + 2]) for i in range(4)]
    s2h = [_a2(lr[i], lr[i + 1]) for i in range(5)]

    dc = (t[0] + t[1] + t[2] + t[3] + l[0] + l[1] + l[2] + l[3] + 4) >> 3

    def rows_of(mode):
        """Returns pred[16] rows ([S] each, raster p = r*4 + c)."""
        if mode == 0:
            return [dc] * 16
        if mode == 1:  # TM
            return [jnp.clip(l[r] + t[c] - tl, 0, 255)
                    for r in range(4) for c in range(4)]
        if mode == 2:  # VE
            row = [s3[4 + c] for c in range(4)]
            return row * 4
        if mode == 3:  # HE
            return [s3h[r] for r in range(4) for _ in range(4)]
        if mode == 4:  # RD: o[r, c] = s3[3 - r + c]
            return [s3[3 - r + c] for r in range(4) for c in range(4)]
        if mode == 5:  # VR
            grid = [[s2[4 + c] for c in range(4)],
                    [s3[3 + c] for c in range(4)],
                    [s3[2], s2[4], s2[5], s2[6]],
                    [s3[1], s3[3], s3[4], s3[5]]]
            return [grid[r][c] for r in range(4) for c in range(4)]
        if mode == 6:  # LD: f = s3[5..10] + tail
            tail = _a3(tr[2], tr[3], tr[3])
            f = s3[5:11] + [tail]
            return [f[r + c] for r in range(4) for c in range(4)]
        if mode == 7:  # VL
            grid = [[s2[5 + c] for c in range(4)],
                    [s3[5 + c] for c in range(4)],
                    [s2[6], s2[7], s2[8], s3[9]],
                    [s3[6], s3[7], s3[8], s3[10]]]
            return [grid[r][c] for r in range(4) for c in range(4)]
        if mode == 8:  # HD
            hd0 = [s2h[0], s3[3], s3[4], s3[5]]
            hd1 = [s2h[1], s3h[0], hd0[0], hd0[1]]
            hd2 = [s2h[2], s3h[1], hd1[0], hd1[1]]
            hd3 = [s2h[3], s3h[2], hd2[0], hd2[1]]
            return hd0 + hd1 + hd2 + hd3
        # HU
        hu0 = [s2h[1], s3h[1], s2h[2], s3h[2]]
        hu1 = [hu0[2], hu0[3], s2h[3], s3h[3]]
        hu2 = [hu1[2], hu1[3], l[3], l[3]]
        hu3 = [l[3]] * 4
        return hu0 + hu1 + hu2 + hu3

    # Per-subblock quant rows selected by segment (4-way select), hoisted
    # out of the 10-mode loop: the same (param, zz) vectors serve every
    # mode, so building them once saves ~9x of the select work.
    def qrow_build(param, zz):
        v = qtab_ref[0 * 4 + param, zz]
        for s in range(1, 4):
            v = jnp.where(seg == s, qtab_ref[s * 4 + param, zz], v)
        return v

    qrows = [[qrow_build(param, zz) for zz in range(16)]
             for param in range(4)]

    def qrow(param, zz):
        return qrows[param][zz]

    best_score = jnp.full(src.shape[1:], jnp.inf, jnp.float32)
    best_rate = jnp.zeros(src.shape[1:], jnp.float32)
    best_D = jnp.zeros(src.shape[1:], jnp.float32)
    best_mode = jnp.zeros(src.shape[1:], jnp.int32)
    lam = lam_ref[0, 0] * jnp.ones(src.shape[1:], jnp.float32)
    for s in range(1, 4):
        lam = jnp.where(seg == s, lam_ref[0, s], lam)
    # Split-decision lambda (slots 8:12): the emitted score is the chosen
    # mode's lam_mode-rescored contribution (ops/i4.py i4_search).
    lam_md = lam_ref[0, 8] * jnp.ones(src.shape[1:], jnp.float32)
    for s in range(1, 4):
        lam_md = jnp.where(seg == s, lam_ref[0, 8 + s], lam_md)
    if use_td:
        tlsd = lam_ref[0, 4] * jnp.ones(src.shape[1:], jnp.float32)
        for s in range(1, 4):
            tlsd = jnp.where(seg == s, lam_ref[0, 4 + s], tlsd)
        ha_src = _hadamard_rows([src[p, :] for p in range(16)])

    for m in range(10):
        pred = rows_of(m)
        d = [src[p, :] - pred[p] for p in range(16)]
        # fdct4x4 (ops/dct.py), rows = d[r*4+c].
        tmp = [None] * 16
        for r in range(4):
            d0, d1, d2, d3 = d[r * 4], d[r * 4 + 1], d[r * 4 + 2], d[r * 4 + 3]
            a0, a1, a2i, a3 = d0 + d3, d1 + d2, d1 - d2, d0 - d3
            tmp[r * 4 + 0] = (a0 + a1) * 8
            tmp[r * 4 + 1] = (a2i * 2217 + a3 * 5352 + 1812) >> 9
            tmp[r * 4 + 2] = (a0 - a1) * 8
            tmp[r * 4 + 3] = (a3 * 2217 - a2i * 5352 + 937) >> 9
        co = [None] * 16
        for c in range(4):
            m0, m1, m2, m3 = tmp[c], tmp[4 + c], tmp[8 + c], tmp[12 + c]
            a0, a1, a2i, a3 = m0 + m3, m1 + m2, m1 - m2, m0 - m3
            co[0 * 4 + c] = (a0 + a1 + 7) >> 4
            co[2 * 4 + c] = (a0 - a1 + 7) >> 4
            co[1 * 4 + c] = ((a2i * 2217 + a3 * 5352 + 12000) >> 16) \
                + (a3 != 0).astype(jnp.int32)
            co[3 * 4 + c] = (a3 * 2217 - a2i * 5352 + 51000) >> 16
        # quantize (ops/quant.py) in zigzag order + disto + rate.
        disto = jnp.zeros(src.shape[1:], jnp.int32)
        rate = jnp.zeros(src.shape[1:], jnp.int32)
        has_any = jnp.zeros(src.shape[1:], bool)
        run_cost = jnp.zeros(src.shape[1:], jnp.int32)
        pend = jnp.zeros(src.shape[1:], jnp.int32)
        dqn = [None] * 16
        for zz in range(16):
            czz = co[int(ZIGZAG[zz])]
            mag = jnp.abs(czz) + qrow(3, zz)
            level = jnp.minimum((mag * qrow(1, zz) + qrow(2, zz)) >> QFIX,
                                MAX_LEVEL)
            dqz = level * qrow(0, zz)
            if use_td:
                dqn[int(ZIGZAG[zz])] = jnp.where(czz < 0, -dqz, dqz)
            e = jnp.abs(czz) - dqz
            disto = disto + e * e
            # approx_block_rate's per-level cost (fastpath.RateTables,
            # band-exact per position): clamped base cost plus the
            # additive tail buckets.
            v = level
            vc = jnp.minimum(v, 7)
            lc = lvl_cost[zz]
            tlc = tail_cost[zz]
            # lvl_cost[vc] as a binary select tree on vc's bits (7 selects
            # instead of 8 equality+select pairs), then the tail buckets
            # as cumulative threshold adds (the bucket deltas telescope).
            bit0 = (vc & 1) != 0
            bit1 = (vc & 2) != 0
            c01 = jnp.where(bit0, int(lc[1]), int(lc[0]))
            c23 = jnp.where(bit0, int(lc[3]), int(lc[2]))
            c45 = jnp.where(bit0, int(lc[5]), int(lc[4]))
            c67 = jnp.where(bit0, int(lc[7]), int(lc[6]))
            c = jnp.where(vc >= 4, jnp.where(bit1, c67, c45),
                          jnp.where(bit1, c23, c01))
            tc = (int(tlc[0]), int(tlc[1]), int(tlc[2]), int(tlc[3]))
            c = c + jnp.where(v >= 8, tc[0], 0)
            for thr, delta in ((11, tc[1] - tc[0]), (19, tc[2] - tc[1]),
                               (35, tc[3] - tc[2])):
                if delta:
                    c = c + jnp.where(v >= thr, delta, 0)
            nz = v != 0
            # Sum of costs from position 0 through the LAST nonzero: add
            # the pending run (zeros since the previous nonzero) plus this
            # coefficient's cost whenever it is nonzero.
            run_cost = run_cost + c
            rate = jnp.where(nz, rate + run_cost, rate)
            run_cost = jnp.where(nz, 0, run_cost)
            has_any = has_any | nz
            # Pending EOB bit for termination at zz (band[zz+1], ctx from
            # the last level — RateTables.eob1p/eob2p).
            e_zz = jnp.where(v == 1, int(eob1_cost[zz]),
                             int(eob2_cost[zz]))
            pend = jnp.where(nz, e_zz, pend)
        rate = jnp.where(has_any, rate + pend, int(empty_cost))
        rate_m = (rate + int(mode_cost[m])).astype(jnp.float32)
        D = 64.0 * disto.astype(jnp.float32)
        if use_td:
            # Perceptual SD (reference PickBestI4ModeRD + TLambdaSD):
            # inverse DCT of the dequantized block, clip, weighted-abs
            # Hadamard vs the source's.
            tmp2 = [None] * 16
            for c in range(4):
                i0, i1 = dqn[c], dqn[4 + c]
                i2, i3 = dqn[8 + c], dqn[12 + c]
                a = i0 + i2
                b2 = i0 - i2
                cc = ((i1 * 35468) >> 16) - (((i3 * 20091) >> 16) + i3)
                dd = ((i1 * 20091) >> 16) + i1 + ((i3 * 35468) >> 16)
                tmp2[0 * 4 + c] = a + dd
                tmp2[1 * 4 + c] = b2 + cc
                tmp2[2 * 4 + c] = b2 - cc
                tmp2[3 * 4 + c] = a - dd
            rec = [None] * 16
            for r in range(4):
                t0, t1 = tmp2[r * 4], tmp2[r * 4 + 1]
                t2, t3 = tmp2[r * 4 + 2], tmp2[r * 4 + 3]
                dc0 = t0 + 4
                a = dc0 + t2
                b2 = dc0 - t2
                cc = ((t1 * 35468) >> 16) - (((t3 * 20091) >> 16) + t3)
                dd = ((t1 * 20091) >> 16) + t1 + ((t3 * 35468) >> 16)
                rec[r * 4 + 0] = jnp.clip(pred[r * 4 + 0] + ((a + dd) >> 3),
                                          0, 255)
                rec[r * 4 + 1] = jnp.clip(pred[r * 4 + 1] + ((b2 + cc) >> 3),
                                          0, 255)
                rec[r * 4 + 2] = jnp.clip(pred[r * 4 + 2] + ((b2 - cc) >> 3),
                                          0, 255)
                rec[r * 4 + 3] = jnp.clip(pred[r * 4 + 3] + ((a - dd) >> 3),
                                          0, 255)
            ha_rec = _hadamard_rows(rec)
            td = jnp.abs(ha_rec - ha_src) >> 5
            D = D + tlsd * td.astype(jnp.float32)
        score = rate_m * lam + D
        if m in tr_modes:
            score = jnp.where(is_c3, jnp.float32(np.inf), score)
        better = score < best_score
        best_score = jnp.where(better, score, best_score)
        best_rate = jnp.where(better, rate_m, best_rate)
        best_D = jnp.where(better, D, best_D)
        best_mode = jnp.where(better, m, best_mode)

    mode_ref[0, :] = best_mode.reshape(S)
    score_ref[0, :] = (best_rate * lam_md + best_D).reshape(S)


@functools.lru_cache(maxsize=8)
def _build_call(n_sb_padded, lvl_cost, tail_cost, eob1_cost, eob2_cost,
                empty_cost, mode_cost, tr_modes, interpret, use_td=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(
        _kernel, lvl_cost=lvl_cost, tail_cost=tail_cost,
        eob1_cost=eob1_cost, eob2_cost=eob2_cost, empty_cost=empty_cost,
        mode_cost=mode_cost, tr_modes=tr_modes, use_td=use_td)
    grid = n_sb_padded // TILE

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((32, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_sb_padded), jnp.int32),
            jax.ShapeDtypeStruct((1, n_sb_padded), jnp.float32),
        ],
        interpret=interpret,
    )


def _lam_row(lam4, tlsd4, lam_mode4):
    """Packs per-segment lambdas into the kernel's [1, 128] f32 row:
    lam_i4 @0:4, tlsd @4:8, lam_mode @8:12 (defaults to lam_i4)."""
    row = jnp.zeros((1, 128), jnp.float32).at[0, :4].set(
        jnp.asarray(lam4, jnp.float32))
    if tlsd4 is not None:
        row = row.at[0, 4:8].set(jnp.asarray(tlsd4, jnp.float32))
    row = row.at[0, 8:12].set(jnp.asarray(
        lam4 if lam_mode4 is None else lam_mode4, jnp.float32))
    return row


def i4_search_scores(src_b, top, left, tl, tr, seg, qtab, lam4,
                     rt_lvl, rt_tail, rt_eob1, rt_eob2, rt_empty,
                     mode_cost, tr_modes, interpret=False, lam_mode4=None):
    """Pallas-backed score/mode computation for every subblock.

    src_b: [n_sb, 4, 4] i32; top/left/tr: [n_sb, 4]; tl: [n_sb];
    seg: [n_sb] i32 (0..3); qtab: [16, 16] i32 ((seg*4+param) x zigzag);
    lam4: [4] f32 array (traced). Returns (mode [n_sb], score [n_sb])
    where score is the chosen mode's lam_mode-rescored contribution.
    """
    n_sb = src_b.shape[0]
    pad = (-n_sb) % TILE
    src16 = src_b.reshape(n_sb, 16).T                  # [16, n_sb]
    is_c3 = (jnp.arange(n_sb) % 4) == 3
    ctx = jnp.concatenate([
        left[:, ::-1], tl[:, None], top, tr,
        is_c3[:, None].astype(jnp.int32), seg[:, None],
        jnp.zeros((n_sb, 1), jnp.int32),
    ], axis=1).T                                       # [16, n_sb]
    data = jnp.concatenate([src16, ctx]).astype(jnp.uint8)
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad)))
    call = _build_call(n_sb + pad,
                       tuple(tuple(int(v) for v in r) for r in rt_lvl),
                       tuple(tuple(int(v) for v in r) for r in rt_tail),
                       tuple(int(v) for v in rt_eob1),
                       tuple(int(v) for v in rt_eob2), int(rt_empty),
                       tuple(int(v) for v in mode_cost), tuple(tr_modes),
                       interpret)
    mode, score = call(data, qtab.astype(jnp.int32),
                       _lam_row(lam4, None, lam_mode4))
    return mode[0, :n_sb], score[0, :n_sb]


def i4_scores_planar(src16, ctx, qtab, lam4, rt_lvl, rt_tail, rt_eob1,
                     rt_eob2, rt_empty, mode_cost, tr_modes,
                     interpret=False, tlsd4=None, lam_mode4=None):
    """Like i4_search_scores but on pre-built planar [16, n_sb] arrays
    (any subblock ordering — the caller owns the layout). tlsd4 enables
    the perceptual SD term ([4] f32 per-segment TLambdaSD)."""
    n_sb = src16.shape[1]
    pad = (-n_sb) % TILE
    data = jnp.concatenate([src16.astype(jnp.uint8),
                            ctx.astype(jnp.uint8)])
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad)))
    call = _build_call(n_sb + pad,
                       tuple(tuple(int(v) for v in r) for r in rt_lvl),
                       tuple(tuple(int(v) for v in r) for r in rt_tail),
                       tuple(int(v) for v in rt_eob1),
                       tuple(int(v) for v in rt_eob2), int(rt_empty),
                       tuple(int(v) for v in mode_cost), tuple(tr_modes),
                       interpret, use_td=tlsd4 is not None)
    mode, score = call(data, qtab.astype(jnp.int32),
                       _lam_row(lam4, tlsd4, lam_mode4))
    return mode[0, :n_sb], score[0, :n_sb]
