"""Device VP8 decode: batched IDCT + wavefront reconstruction + in-loop
filter + fancy upsample, all on chip.

The host side (native vp8_parse, vp8_dec.cc) stops after the token pass and
ships dequantized coefficients + per-MB info; everything pixel-shaped runs
here:

  * residual IDCT — one batched tensor op over every 4x4 block
    (reference reconstructRow's transform calls, decode_frame.go:83);
  * reconstruction — a skew-2 lax.scan over anti-diagonals (t = x + 2y):
    intra prediction from true reconstructed neighbors, I4 macroblocks as
    a 10-substep in-MB anti-diagonal walk (decode needs the full 10-mode
    predictor set and the above-right strip, so unlike the encoder's
    fast path the skew stays 2);
  * loop filter — a second skew-2 scan in exact raster-filter order
    (decode_frame.go:293 doFilter): each step filters one MB's edges and
    emits writeback patches for the right columns of its left neighbor
    and the bottom rows of the MB above, which the assembly overlays;
  * fancy upsample + YUV->RGB (dsp/upsample.go:45) via ops/yuv.py.

Bit-exact with the host/native decoder (asserted by tests): the filter
math mirrors lossy/dsp.py, the IDCT is ops/dct.py's integer transform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import dct
from .fastpath import _preds4, _unblock
from .i4 import pred4_all


# ---------------------------------------------------------------------------
# Skew helpers (shared by both scans).
# ---------------------------------------------------------------------------

def _skew_maps(mb_w, mb_h, sk=2):
    n_steps = mb_w + sk * (mb_h - 1)
    tt = np.arange(n_steps)[:, None]
    yy = np.arange(mb_h)[None, :]
    xx = tt - sk * yy
    valid = (xx >= 0) & (xx < mb_w)
    return n_steps, xx, valid


def _shear(a, mb_w, mb_h, sk):
    """[n_mb, ...] -> [n_steps, mb_h, ...] with out[t, y] = a[y, t - sk*y]
    via pad + reshape (no gather; invalid lanes read zeros)."""
    n_steps = mb_w + sk * (mb_h - 1)
    b = a.reshape(mb_h, mb_w, *a.shape[1:])
    P = n_steps + sk
    pad_w = [(0, 0)] * b.ndim
    pad_w[1] = (0, P - mb_w)
    b = jnp.pad(b, pad_w)
    flat = b.reshape(mb_h * P, *a.shape[1:])[: mb_h * n_steps]
    return jnp.swapaxes(flat.reshape(mb_h, n_steps, *a.shape[1:]), 0, 1)


def _unshear(c_sk, mb_w, mb_h, sk):
    """Inverse of _shear on per-step outputs [n_steps, mb_h, ...]."""
    n_steps = mb_w + sk * (mb_h - 1)
    tail = c_sk.shape[2:]
    flat = jnp.swapaxes(c_sk, 0, 1).reshape(mb_h * n_steps, *tail)
    pad_w = [(0, 0)] * flat.ndim
    pad_w[0] = (0, mb_h * sk)
    flat = jnp.pad(flat, pad_w)
    out = flat.reshape(mb_h, n_steps + sk, *tail)[:, :mb_w]
    return out.reshape(mb_h * mb_w, *tail)


def _shift1(a):
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _sel4(stack, idx):
    """stack: [L, 4, ...]; idx: [L] in 0..3 -> [L, ...]."""
    i = idx.astype(jnp.int32).reshape(idx.shape + (1,) * (stack.ndim - 2))
    return jnp.where(i == 0, stack[:, 0],
                     jnp.where(i == 1, stack[:, 1],
                               jnp.where(i == 2, stack[:, 2], stack[:, 3])))


# ---------------------------------------------------------------------------
# Reconstruction scan.
# ---------------------------------------------------------------------------

def _i4_decode_walk(res_b, modes, topY, leftY, tlY, trs, has_top, has_left):
    """Closed-loop I4 reconstruction of one MB per lane, prediction only
    (residuals already IDCT'd): 10 anti-diagonal substeps over the 16
    subblocks. res_b: [L, 16, 4, 4] int32; modes: [L, 16]."""
    top_row = jnp.where(has_top[:, None], topY, 127)
    left_col = jnp.where(has_left[:, None], leftY, 129)
    tl0 = jnp.where(has_top & has_left, tlY,
                    jnp.where(has_top, 129, 127))
    tr_strip = jnp.where(has_top[:, None], trs, 127)
    L = res_b.shape[0]

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

    work = jnp.zeros((L, 16, 16), jnp.int32)
    for group in groups:
        g = len(group)
        ctxs = [ctx_of(work, r, c) for (r, c) in group]
        t = jnp.concatenate([cx[0] for cx in ctxs], axis=0)
        l = jnp.concatenate([cx[1] for cx in ctxs], axis=0)
        tl = jnp.concatenate([cx[2] for cx in ctxs], axis=0)
        tr = jnp.concatenate([cx[3] for cx in ctxs], axis=0)
        preds = pred4_all(t, l, tl, tr)
        mode = jnp.concatenate(
            [modes[:, r * 4 + c] for (r, c) in group],
            axis=0).astype(jnp.int32)[:, None, None]
        pred = preds[0]
        for m in range(1, 10):
            pred = jnp.where(mode == m, preds[m], pred)
        res = jnp.concatenate([res_b[:, r * 4 + c] for (r, c) in group],
                              axis=0)
        rec = jnp.clip(pred + res, 0, 255)
        for i, (r, c) in enumerate(group):
            work = jax.lax.dynamic_update_slice(
                work, rec[i * L:(i + 1) * L], (0, r * 4, c * 4))
    return work


def _recon_step(carry, x, lanes_y, mb_h, mb_w):
    """One wavefront reconstruction step (shared by the recon-only and the
    fused recon+filter scans). Returns (new_carry, (rY, rU, rV) int32)."""
    (By1, By2, Ry, Cy1, Cy2, Cy3,
     Bu1, Bu2, Ru, Cu1, Cu2, Cu3,
     Bv1, Bv2, Rv, Cv1, Cv2, Cv3) = carry
    has_left = x["valid"] & (x["x"] > 0)
    has_top = x["valid"] & (lanes_y > 0)

    topY, leftY, tlY = _shift1(By2), Ry, _shift1(Cy3)
    predsY = _preds4(16, topY, leftY, tlY, has_top, has_left)
    predY = _sel4(predsY, jnp.minimum(x["im"][:, 0], 3))
    rec16 = jnp.clip(predY + _unblock(x["ry"], 16), 0, 255)

    # I4: above-right strip = bottom row [0:4] of MB (x+1, y-1),
    # reconstructed one step earlier (skew 2); right-edge replicated.
    trs = _shift1(By1)[:, 0:4]
    edge = jnp.broadcast_to(topY[:, 15:16], (mb_h, 4))
    trs = jnp.where((x["x"] + 1 >= mb_w)[:, None], edge, trs)
    work = _i4_decode_walk(x["ry"], x["im"],
                           topY, leftY, tlY, trs, has_top, has_left)
    sel = x["i4"][:, None, None]
    rY = jnp.where(sel, work, rec16)

    topU, leftU, tlU = _shift1(Bu2), Ru, _shift1(Cu3)
    topV, leftV, tlV = _shift1(Bv2), Rv, _shift1(Cv3)
    predsU = _preds4(8, topU, leftU, tlU, has_top, has_left)
    predsV = _preds4(8, topV, leftV, tlV, has_top, has_left)
    rU = jnp.clip(_sel4(predsU, x["uvm"]) + _unblock(x["ru"], 8), 0, 255)
    rV = jnp.clip(_sel4(predsV, x["uvm"]) + _unblock(x["rv"], 8), 0, 255)

    new = (rY[:, 15, :], By1, rY[:, :, 15], rY[:, 15, 15], Cy1, Cy2,
           rU[:, 7, :], Bu1, rU[:, :, 7], rU[:, 7, 7], Cu1, Cu2,
           rV[:, 7, :], Bv1, rV[:, :, 7], rV[:, 7, 7], Cv1, Cv2)
    return new, (rY, rU, rV)


def _recon_carry0(mb_h):
    z16 = jnp.zeros((mb_h, 16), jnp.int32)
    z8 = jnp.zeros((mb_h, 8), jnp.int32)
    z1 = jnp.zeros((mb_h,), jnp.int32)
    return (z16, z16, z16, z1, z1, z1,
            z8, z8, z8, z1, z1, z1,
            z8, z8, z8, z1, z1, z1)


def _recon_xs(resY, resU, resV, is_i4, imodes, uvmode, mb_w, mb_h):
    n_steps, xx, valid_np = _skew_maps(mb_w, mb_h, 2)

    def skew(a):
        return _shear(a, mb_w, mb_h, 2)

    return {
        "ry": skew(resY), "ru": skew(resU), "rv": skew(resV),
        "i4": skew(is_i4), "im": skew(imodes), "uvm": skew(uvmode),
        "x": jnp.asarray(xx.clip(0, mb_w - 1), jnp.int32),
        "valid": jnp.asarray(valid_np),
    }


def _recon_scan(resY, resU, resV, is_i4, imodes, uvmode, mb_w, mb_h):
    """resY: [n_mb, 16, 4, 4] int32 residual blocks (raster subblock
    order); resU/resV: [n_mb, 4, 4, 4]. Returns (Yb, Ub, Vb) uint8 per-MB
    reconstructions [n_mb, s, s]."""
    xs = _recon_xs(resY, resU, resV, is_i4, imodes, uvmode, mb_w, mb_h)
    lanes_y = jnp.arange(mb_h)

    def step(carry, x):
        new, (rY, rU, rV) = _recon_step(carry, x, lanes_y, mb_h, mb_w)
        return new, (rY.astype(jnp.uint8), rU.astype(jnp.uint8),
                     rV.astype(jnp.uint8))

    _, (y_sk, u_sk, v_sk) = jax.lax.scan(step, _recon_carry0(mb_h), xs)

    Yb = _unshear(y_sk, mb_w, mb_h, 2)
    Ub = _unshear(u_sk, mb_w, mb_h, 2)
    Vb = _unshear(v_sk, mb_w, mb_h, 2)
    return Yb, Ub, Vb


# ---------------------------------------------------------------------------
# Loop filter scan (normal/complex filter; simple filter handled too).
# ---------------------------------------------------------------------------

def _sclip1(v):
    return jnp.clip(v, -128, 127)


def _sclip2(v):
    return jnp.clip(v, -16, 15)


def _c255(v):
    return jnp.clip(v, 0, 255)


def _needs_filter(p1, p0, q0, q1, thresh):
    return 4 * jnp.abs(p0 - q0) + jnp.abs(p1 - q1) <= thresh


def _needs_filter2(p, thresh, it):
    p3, p2, p1, p0, q0, q1, q2, q3 = p
    ok = _needs_filter(p1, p0, q0, q1, thresh)
    ok &= jnp.abs(p3 - p2) <= it
    ok &= jnp.abs(p2 - p1) <= it
    ok &= jnp.abs(p1 - p0) <= it
    ok &= jnp.abs(q3 - q2) <= it
    ok &= jnp.abs(q2 - q1) <= it
    ok &= jnp.abs(q1 - q0) <= it
    return ok


def _do2(p1, p0, q0, q1):
    a = 3 * (q0 - p0) + _sclip1(p1 - q1)
    a1 = _sclip2((a + 4) >> 3)
    a2 = _sclip2((a + 3) >> 3)
    return _c255(p0 + a2), _c255(q0 - a1)


def _filter_edge(p, limit, ilevel, hev_t, inner, enable):
    """Normal filter across one edge. p: 8 vectors [L, n] int32 (p3..q3);
    limit/ilevel/hev_t: [L, 1] int32; inner: [L, 1] bool or python bool;
    enable: [L, 1] bool. Returns 6 updated vectors p2..q2 (p3/q3 never
    change). Mirrors lossy/dsp.py filter_edge_complex bit-for-bit."""
    p3, p2, p1, p0, q0, q1, q2, q3 = p
    mask = _needs_filter2(p, 2 * limit + 1, ilevel) & enable
    hv = (jnp.abs(p1 - p0) > hev_t) | (jnp.abs(q1 - q0) > hev_t)
    f2p0, f2q0 = _do2(p1, p0, q0, q1)
    # doFilter4 (inner, non-hev)
    a = 3 * (q0 - p0)
    a1 = _sclip2((a + 4) >> 3)
    a2 = _sclip2((a + 3) >> 3)
    a3 = (a1 + 1) >> 1
    f4 = (_c255(p1 + a3), _c255(p0 + a2), _c255(q0 - a1), _c255(q1 - a3))
    # doFilter6 (edge, non-hev)
    b = _sclip1(3 * (q0 - p0) + _sclip1(p1 - q1))
    b1 = (27 * b + 63) >> 7
    b2 = (18 * b + 63) >> 7
    b3 = (9 * b + 63) >> 7
    f6 = (_c255(p2 + b3), _c255(p1 + b2), _c255(p0 + b1),
          _c255(q0 - b1), _c255(q1 - b2), _c255(q2 - b3))
    np2 = jnp.where(inner, p2, jnp.where(hv, p2, f6[0]))
    np1 = jnp.where(inner, jnp.where(hv, p1, f4[0]),
                    jnp.where(hv, p1, f6[1]))
    np0 = jnp.where(hv, f2p0, jnp.where(inner, f4[1], f6[2]))
    nq0 = jnp.where(hv, f2q0, jnp.where(inner, f4[2], f6[3]))
    nq1 = jnp.where(inner, jnp.where(hv, q1, f4[3]),
                    jnp.where(hv, q1, f6[4]))
    nq2 = jnp.where(inner, q2, jnp.where(hv, q2, f6[5]))
    out = []
    for old, newv in ((p2, np2), (p1, np1), (p0, np0),
                      (q0, nq0), (q1, nq1), (q2, nq2)):
        out.append(jnp.where(mask, newv, old))
    return out


def _filter_edge_simple(p1, p0, q0, q1, limit, enable):
    mask = _needs_filter(p1, p0, q0, q1, 2 * limit + 1) & enable
    np0, nq0 = _do2(p1, p0, q0, q1)
    return jnp.where(mask, np0, p0), jnp.where(mask, nq0, q0)


def _v_edge(blockL, blockR, col, limit, il, hev, inner, enable):
    """Vertical edge at blockR[:, :, col] with left context from blockL
    (cols col-4..col-1 crossing into blockL when col==0). Returns updated
    (blockL, blockR). block*: [L, n, w] int32."""
    def getc(c):
        if c < 0:
            return blockL[:, :, blockL.shape[2] + c]
        return blockR[:, :, c]

    p = [getc(col + d) for d in range(-4, 4)]
    upd = _filter_edge(p, limit, il, hev, inner, enable)
    for d, v in zip(range(-3, 3), upd):
        c = col + d
        if c < 0:
            blockL = blockL.at[:, :, blockL.shape[2] + c].set(v)
        else:
            blockR = blockR.at[:, :, c].set(v)
    return blockL, blockR


def _h_edge(blockT, blockB, row, limit, il, hev, inner, enable):
    """Horizontal edge at blockB[:, row, :] with top context crossing into
    blockT when row==0."""
    def getr(r):
        if r < 0:
            return blockT[:, blockT.shape[1] + r, :]
        return blockB[:, r, :]

    p = [getr(row + d) for d in range(-4, 4)]
    upd = _filter_edge(p, limit, il, hev, inner, enable)
    for d, v in zip(range(-3, 3), upd):
        r = row + d
        if r < 0:
            blockT = blockT.at[:, blockT.shape[1] + r, :].set(v)
        else:
            blockB = blockB.at[:, r, :].set(v)
    return blockT, blockB


def _filter_step(carry, x, own, uv, lanes_y, simple):
    """One loop-filter wavefront step (shared by the fused decode scan).

    own: [L, 16, 16] int32 reconstructed luma MB; uv: [L, 16, 8] int32
    (U stacked over V). carry: (Ry, Bsy, Bhy, Ruv, Bsuv, Bhuv) — R*:
    right 4 cols of the previous MB (post filtering); Bs*: bottom 4 rows
    of the previous MB; Bh*: assembled bottom rows of the previous MB
    fully patched, for the lane below."""
    (Ry, Bsy, Bhy, Ruv, Bsuv, Bhuv) = carry
    leftR = Ry
    topB = _shift1(Bhy)
    leftRuv = Ruv
    topBuv = _shift1(Bhuv)

    en = (x["valid"] & (x["limit"] > 0))[:, None]
    has_left = en & (x["x"] > 0)[:, None]
    has_top = en & (lanes_y > 0)[:, None]
    lim = x["limit"][:, None]
    il = x["il"][:, None]
    hv = x["hev"][:, None]
    inn = en & x["inner"][:, None]

    if simple:
        # Simple filter: luma only, 2-tap on p1..q1.
        def vsimple(bl, br, col, limit_, enable):
            def getc(c):
                return bl[:, :, 16 + c] if c < 0 else br[:, :, c]
            p1, p0, q0, q1 = (getc(col - 2), getc(col - 1),
                              getc(col), getc(col + 1))
            np0, nq0 = _filter_edge_simple(p1, p0, q0, q1, limit_,
                                           enable)
            if col - 1 < 0:
                bl = bl.at[:, :, 15].set(np0)
            else:
                br = br.at[:, :, col - 1].set(np0)
            br = br.at[:, :, col].set(nq0)
            return bl, br

        def hsimple(bt, bb, row, limit_, enable):
            def getr(r):
                return bt[:, 4 + r, :] if r < 0 else bb[:, r, :]
            p1, p0, q0, q1 = (getr(row - 2), getr(row - 1),
                              getr(row), getr(row + 1))
            np0, nq0 = _filter_edge_simple(p1, p0, q0, q1, limit_,
                                           enable)
            if row - 1 < 0:
                bt = bt.at[:, 3, :].set(np0)
            else:
                bb = bb.at[:, row - 1, :].set(np0)
            bb = bb.at[:, row, :].set(nq0)
            return bt, bb

        leftR, own = vsimple(leftR, own, 0, lim + 4, has_left)
        for k in (4, 8, 12):
            _, own = vsimple(own, own, k, lim, inn)
        topB, own = hsimple(topB, own, 0, lim + 4, has_top)
        for k in (4, 8, 12):
            _, own = hsimple(own, own, k, lim, inn)
    else:
        leftR, own = _v_edge(leftR, own, 0, lim + 4, il, hv, False,
                             has_left)
        for k in (4, 8, 12):
            _, own = _v_edge(own, own, k, lim, il, hv, True, inn)
        leftRuv, uv = _v_edge(leftRuv, uv, 0, lim + 4, il, hv, False,
                              has_left)
        _, uv = _v_edge(uv, uv, 4, lim, il, hv, True, inn)
        topB, own = _h_edge(topB, own, 0, lim + 4, il, hv, False,
                            has_top)
        for k in (4, 8, 12):
            _, own = _h_edge(own, own, k, lim, il, hv, True, inn)
        # Chroma horizontal edges: U and V stacked along the row axis
        # would couple across the U/V boundary; handle separately.
        u_own, v_own = uv[:, :8], uv[:, 8:]
        topBu, topBv = topBuv[:, :4], topBuv[:, 4:]
        topBu, u_own = _h_edge(topBu, u_own, 0, lim + 4, il, hv, False,
                               has_top)
        _, u_own = _h_edge(u_own, u_own, 4, lim, il, hv, True, inn)
        topBv, v_own = _h_edge(topBv, v_own, 0, lim + 4, il, hv, False,
                               has_top)
        _, v_own = _h_edge(v_own, v_own, 4, lim, il, hv, True, inn)
        uv = jnp.concatenate([u_own, v_own], axis=1)
        topBuv = jnp.concatenate([topBu, topBv], axis=1)

    # Writeback assembly values.
    rpatch = leftR                                   # [L, 16, 4]
    bpatch = topB                                    # [L, 4, 16]
    rpatch_uv = leftRuv                              # [L, 16, 4]
    bpatch_uv = topBuv                               # [L, 8, 8]
    # New carries: Bh = previous Bs patched with the updated leftR
    # bottom corner (the left-edge write that lands in the previous
    # MB's bottom rows).
    Bhy_new = Bsy.at[:, :, 12:16].set(leftR[:, 12:16, :])
    Bhuv_new = Bsuv.at[:, :, 4:8].set(
        jnp.concatenate([leftRuv[:, 4:8, :], leftRuv[:, 12:16, :]],
                        axis=1))
    new = (own[:, :, 12:16], own[:, 12:16, :], Bhy_new,
           uv[:, :, 4:8],
           jnp.concatenate([uv[:, 4:8, :], uv[:, 12:16, :]], axis=1),
           Bhuv_new)
    return new, (own.astype(jnp.uint8),
                 rpatch.astype(jnp.uint8), bpatch.astype(jnp.uint8),
                 uv.astype(jnp.uint8),
                 rpatch_uv.astype(jnp.uint8), bpatch_uv.astype(jnp.uint8))


def _filter_carry0(mb_h):
    zR = jnp.zeros((mb_h, 16, 4), jnp.int32)
    zB = jnp.zeros((mb_h, 4, 16), jnp.int32)
    zRuv = jnp.zeros((mb_h, 16, 4), jnp.int32)
    zBuv = jnp.zeros((mb_h, 8, 8), jnp.int32)
    return (zR, zB, zB, zRuv, zBuv, zBuv)


def _fused_decode_scan(resY, resU, resV, is_i4, imodes, uvmode,
                       limit, ilevel, hev, inner, mb_w, mb_h, simple):
    """Reconstruction + loop filter in ONE skew-2 scan.

    The filter of MB (x, y) depends only on (a) its own reconstruction
    (computed earlier in the same step body), (b) the filtered right
    columns of (x-1, y) — previous step, same lane — and (c) the patched
    bottom rows of (x, y-1) — filter carries from steps t-1/t-2, lane
    above. All arrive on the same skew-2 schedule as reconstruction, so
    the filter runs at lag 0 inside the recon step and the whole decode
    costs one scan's worth of step latency instead of two
    (reference doFilterRow interleaves the same way, decode_frame.go:293).
    """
    xs = _recon_xs(resY, resU, resV, is_i4, imodes, uvmode, mb_w, mb_h)

    def skew(a):
        return _shear(a, mb_w, mb_h, 2)

    xs.update({"limit": skew(limit), "il": skew(ilevel), "hev": skew(hev),
               "inner": skew(inner)})
    lanes_y = jnp.arange(mb_h)

    def step(carry, x):
        rc, fc = carry
        rc_new, (rY, rU, rV) = _recon_step(rc, x, lanes_y, mb_h, mb_w)
        uv = jnp.concatenate([rU, rV], axis=1)
        fc_new, outs = _filter_step(fc, x, rY, uv, lanes_y, simple)
        return (rc_new, fc_new), outs

    carry0 = (_recon_carry0(mb_h), _filter_carry0(mb_h))
    _, (core_sk, rp_sk, bp_sk, uv_sk, rpuv_sk, bpuv_sk) = jax.lax.scan(
        step, carry0, xs)
    return _filter_assemble(core_sk, rp_sk, bp_sk, uv_sk, rpuv_sk,
                            bpuv_sk, mb_w, mb_h)


def _filter_assemble(core_sk, rp_sk, bp_sk, uv_sk, rpuv_sk, bpuv_sk,
                     mb_w, mb_h):
    # Assemble: core, then right-col patches from step t+1 (same lane),
    # then bottom-row patches from step t+2 (lane below). All shear-based:
    # the rpatch for MB (x, y) lives at grid slot (x+1, y) of the
    # unsheared patch stream; the bpatch at slot (x, y+1).
    core = _unshear(core_sk, mb_w, mb_h, 2)              # [n_mb, 16, 16]
    uvc = _unshear(uv_sk, mb_w, mb_h, 2)

    yo = np.repeat(np.arange(mb_h), mb_w)
    xo = np.tile(np.arange(mb_w), mb_h)

    def shift_left(a):
        g = a.reshape(mb_h, mb_w, *a.shape[1:])
        g = jnp.concatenate([g[:, 1:], g[:, -1:]], axis=1)
        return g.reshape(a.shape)

    def shift_up(a):
        g = a.reshape(mb_h, mb_w, *a.shape[1:])
        g = jnp.concatenate([g[1:], g[-1:]], axis=0)
        return g.reshape(a.shape)

    has_r = xo < mb_w - 1
    rp = shift_left(_unshear(rp_sk, mb_w, mb_h, 2))
    core = jnp.where(jnp.asarray(has_r)[:, None, None],
                     jnp.concatenate([core[:, :, :12], rp], axis=2), core)
    rpuv = shift_left(_unshear(rpuv_sk, mb_w, mb_h, 2))
    uvc = jnp.where(jnp.asarray(has_r)[:, None, None],
                    jnp.concatenate([uvc[:, :, :4], rpuv], axis=2), uvc)
    has_b = yo < mb_h - 1
    bp = shift_up(_unshear(bp_sk, mb_w, mb_h, 2))
    core = jnp.where(jnp.asarray(has_b)[:, None, None],
                     jnp.concatenate([core[:, :12, :], bp], axis=1), core)
    bpuv = shift_up(_unshear(bpuv_sk, mb_w, mb_h, 2))     # [n_mb, 2*4, 8]
    ub = jnp.concatenate([uvc[:, :4, :], bpuv[:, :4, :]], axis=1)
    vb = jnp.concatenate([uvc[:, 8:12, :], bpuv[:, 4:, :]], axis=1)
    uvc = jnp.where(jnp.asarray(has_b)[:, None, None],
                    jnp.concatenate([ub, vb], axis=1), uvc)
    return core, uvc[:, :8], uvc[:, 8:]


# ---------------------------------------------------------------------------
# Full decode function.
# ---------------------------------------------------------------------------

def _mb_to_plane(b, mb_w, mb_h, s):
    return b.reshape(mb_h, mb_w, s, s).transpose(0, 2, 1, 3).reshape(
        mb_h * s, mb_w * s)


@functools.lru_cache(maxsize=8)
def decode_fn(mb_w: int, mb_h: int, filter_type: int, upsample: bool = True,
              width: int = 0, height: int = 0):
    """Jitted batched device decoder.

    fn(coeffs [B, n_mb, 24, 16] i16, is_i4 [B, n_mb] bool,
       imodes [B, n_mb, 16] u8, uvmode [B, n_mb] u8,
       limit/ilevel/hevt [B, n_mb] i32, inner [B, n_mb] bool)
      -> (Y [B, H, W] u8, U, V) padded planes, or RGB [B, h, w, 3]
      cropped to width x height when upsample=True.
    """
    w = width or mb_w * 16
    h = height or mb_h * 16

    def one(coeffs, is_i4, imodes, uvmode, limit, ilevel, hevt, inner):
        n_mb = mb_w * mb_h
        c = coeffs.astype(jnp.int32)
        res = dct.idct4x4(c.reshape(n_mb, 24, 4, 4))
        if filter_type > 0:
            Yb, Ub, Vb = _fused_decode_scan(
                res[:, :16], res[:, 16:20], res[:, 20:24],
                is_i4, imodes, uvmode, limit, ilevel, hevt, inner,
                mb_w, mb_h, simple=filter_type == 1)
        else:
            Yb, Ub, Vb = _recon_scan(res[:, :16], res[:, 16:20],
                                     res[:, 20:24], is_i4, imodes, uvmode,
                                     mb_w, mb_h)
        Y = _mb_to_plane(Yb, mb_w, mb_h, 16)
        U = _mb_to_plane(Ub, mb_w, mb_h, 8)
        V = _mb_to_plane(Vb, mb_w, mb_h, 8)
        if not upsample:
            return Y, U, V
        from . import yuv as devyuv

        cw, chh = (w + 1) >> 1, (h + 1) >> 1
        uf = devyuv.upsample_chroma_fancy(U[:chh, :cw], h, w)
        vf = devyuv.upsample_chroma_fancy(V[:chh, :cw], h, w)
        return devyuv.yuv_to_rgb(Y[:h, :w], uf, vf)

    return jax.jit(jax.vmap(one))
