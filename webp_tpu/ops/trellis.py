"""Planar (lanes-minor) Viterbi trellis quantization for the device encoder.

Vectorized re-design of the host trellis (lossy/quant.py
trellis_quantize_block, itself parity with reference
internal/lossy/encode_trellis.go TrellisQuantizeBlock): a 16-position DP
over 3 nonzero-context states with two candidate levels per position,
score = rate * lambda + 256 * delta_distortion.

TPU-first layout decisions:
  * The coefficient probabilities are the STATIC default tables
    (lossy/tables.py COEFFS_PROBA0 — the host trellis also rates against
    the pre-optimization probas), so every per-(position, context) rate
    constant folds at trace time into numpy scalars.
  * The only data-dependent rate term, rate(level) = LEVEL_FIXED_COSTS[L]
    + variable_level_cost(min(L, 67)), is precomputed as one static
    [16, 3, MAX_LEVEL+1] table and fetched with a single fused gather per
    candidate OUTSIDE the DP loop — the 16-step Viterbi itself is pure
    full-width vector selects.
  * Scores run in float32. Delta-distortions are exact int32
    (|err^2 - c0^2| < 2^31); the f32 accumulation error (<= ~1e3 on
    pathological all-huge-coefficient blocks) is far below the rate
    granularity (one entropy-cost step x lambda), so decisions match the
    int64 host trellis except on exact ties, which both sides break
    deterministically.

Used by ops/planar.py for the in-scan I4 refinement (method >= 5 on the
device backend). Lanes-minor convention matches ops/planar.py: the
wavefront lane axis is always the trailing axis.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..lossy import tables as T
from ..lossy.cost import (ENTROPY_COST, LEVEL_FIXED_COSTS,
                          MAX_VARIABLE_LEVEL, variable_level_cost)
from .quant import MAX_LEVEL, QFIX

ZIGZAG = np.asarray(T.ZIGZAG)
INV_ZIGZAG = np.argsort(ZIGZAG)
W_ZZ = np.asarray([30, 27, 19, 11, 27, 24, 17, 10,
                   19, 17, 12, 8, 11, 10, 8, 6])[ZIGZAG]  # per zigzag pos
INF = np.float32(3.0e38)


@functools.lru_cache(maxsize=4)
def _rate_consts(ctx_type: int, first: int):
    """Static trellis rate constants for one coefficient type.

    Returns numpy: rate0 [16, 3] (EOB-not-taken + zero-level),
    nz_base [16, 3], eob_next [16, 3] (EOB cost at band(n+1)),
    term0 [3] (initial best_terminal per ctx0), and the fused level-rate
    table rtab [16, 3, MAX_LEVEL+1]."""
    proba = np.asarray(T.COEFFS_PROBA0)
    bands = np.asarray(T.BANDS)
    ec = ENTROPY_COST.astype(np.int64)

    rate0 = np.zeros((16, 3), np.int32)
    nz_base = np.zeros((16, 3), np.int32)
    eob_next = np.zeros((16, 3), np.int32)
    rtab = np.zeros((16, 3, MAX_LEVEL + 1), np.int32)
    lfc = LEVEL_FIXED_COSTS[:MAX_LEVEL + 1].astype(np.int64)
    for n in range(16):
        band = int(bands[n])
        band_next = int(bands[n + 1])
        for pc in range(3):
            p = proba[ctx_type, band, pc]
            not_eob = int(ec[255 - p[0]])
            rate0[n, pc] = not_eob + int(ec[p[1]])
            nz_base[n, pc] = not_eob + int(ec[255 - p[1]])
            eob_next[n, pc] = int(ec[proba[ctx_type, band_next, pc, 0]])
            var = np.asarray(
                [variable_level_cost(min(max(v, 1), MAX_VARIABLE_LEVEL), p)
                 for v in range(MAX_LEVEL + 1)], np.int64)
            rtab[n, pc] = lfc + var
    fb = int(bands[first])
    term0 = np.asarray([int(ec[proba[ctx_type, fb, c, 0]])
                        for c in range(3)], np.int32)
    return rate0, nz_base, eob_next, term0, rtab


def trellis_p(craw, q, iq, sharpen, tlam, ctx0, ctx_type: int = 3,
              first: int = 0):
    """Planar trellis quantization of 4x4 blocks.

    craw: [..., 16, N] int32 raster coefficients; q/iq/sharpen:
    [16, 1|N] zigzag rows (quantize_p convention); tlam: [] | [N]
    trellis lambda; ctx0: [..., N] int32 in 0..2.
    Returns (lv_zz [..., 16, N] int32 signed, dq_raster [..., 16, N]).

    Reference: encode_trellis.go TrellisQuantizeBlock (via the repo's
    host oracle lossy/quant.py:90)."""
    rate0_np, nz_np, eobn_np, term0_np, rtab_np = _rate_consts(
        ctx_type, first)
    lam = jnp.asarray(tlam, jnp.float32)
    czz = craw[..., ZIGZAG, :]
    sign = czz < 0
    c0 = jnp.maximum(jnp.abs(czz) + sharpen, 0)            # [..., 16, N]
    L0 = jnp.minimum((c0 * iq) >> QFIX, MAX_LEVEL)
    thresh = jnp.minimum((c0 * iq + 65536) >> QFIX, MAX_LEVEL)
    Wn = jnp.asarray(W_ZZ, jnp.int32).reshape(16, 1)

    def cand(L, ok):
        err = c0 - L * q
        # exact int32 (|err^2 - c0^2| bounded by W * c0^2 < 2^31)
        dd = (Wn * ((err - c0) * (err + c0))).astype(jnp.float32)
        flat = jnp.asarray(rtab_np.reshape(-1))
        nidx = np.arange(16).reshape(16, 1, 1) * 3
        pidx = np.arange(3).reshape(1, 3, 1)
        idx = (nidx + pidx) * (MAX_LEVEL + 1) + L[..., :, None, :]
        rate = jnp.asarray(nz_np, jnp.int32)[:, :, None] + flat[idx]
        nc = jnp.minimum(L, 2)                              # [..., 16, N]
        return L, ok, rate, dd, nc

    c_a = cand(L0, (L0 > 0) & (L0 <= thresh))
    c_b = cand(L0 + 1, L0 + 1 <= thresh)

    n_lead = craw.ndim - 2
    lead = craw.shape[:-2] + craw.shape[-1:]               # [..., N]
    ctx0 = jnp.minimum(ctx0, 2)
    prev = [jnp.where(ctx0 == c, 0.0, INF) for c in range(3)]

    term0 = jnp.asarray(term0_np, jnp.float32)
    best_term = jnp.where(ctx0 == 0, term0[0],
                          jnp.where(ctx0 == 1, term0[1], term0[2])) * lam
    best_n = jnp.full(lead, -1, jnp.int32)
    best_c = jnp.zeros(lead, jnp.int32)

    path_lv = []            # per n: [3] of [..., N] signed level
    path_pc = []            # per n: [3] of [..., N] prev ctx
    path_ok = []            # per n: [3] of [..., N] bool

    def at(x, n):
        """Slice position n from a [..., 16, N] tensor -> [..., N]."""
        return x[..., n, :]

    for n in range(first, 16):
        cur_s = [None, None, None]
        cur_lv = [None, None, None]
        cur_pc = [None, None, None]

        def consider(c, score, lv, pc):
            if cur_s[c] is None:
                cur_s[c], cur_lv[c], cur_pc[c] = score, lv, pc
            else:
                take = score < cur_s[c]
                cur_s[c] = jnp.where(take, score, cur_s[c])
                cur_lv[c] = jnp.where(take, lv, cur_lv[c])
                cur_pc[c] = jnp.where(take, pc, cur_pc[c])

        sgn = jnp.where(at(sign, n), -1, 1)
        for pc in range(3):
            base = prev[pc]
            # level = 0 -> ctx 0
            consider(0, base + np.float32(rate0_np[n, pc]) * lam,
                     jnp.zeros(lead, jnp.int32), jnp.full(lead, pc,
                                                          jnp.int32))
            for (L, ok, rate, dd, nc) in (c_a, c_b):
                Ln, okn = at(L, n), at(ok, n)
                ts = (base + rate[..., n, pc, :].astype(jnp.float32) * lam
                      + 256.0 * at(dd, n))
                ts = jnp.where(okn, ts, INF)
                ncn = at(nc, n)
                lvn = (sgn * Ln).astype(jnp.int32)
                pcn = jnp.full(lead, pc, jnp.int32)
                for c in (1, 2):
                    consider(c, jnp.where(ncn == c, ts, INF), lvn, pcn)

        path_lv.append(cur_lv)
        path_pc.append(cur_pc)
        path_ok.append([s < INF for s in cur_s])
        for c in (1, 2):
            eob = cur_s[c]
            if n < 15:
                # EOB bit cost at band(n+1) for terminal ctx c
                eob = eob + np.float32(eobn_np[n, c]) * lam
            take = eob < best_term
            best_term = jnp.where(take, eob, best_term)
            best_n = jnp.where(take, n, best_n)
            best_c = jnp.where(take, c, best_c)
        prev = cur_s

    # Backtrack (all full-width selects; ctx frozen on unset nodes).
    out = [jnp.zeros(lead, jnp.int32) for _ in range(16)]
    ctx = best_c
    for n in range(15, first - 1, -1):
        i = n - first
        lv_sel = jnp.where(ctx == 0, path_lv[i][0],
                           jnp.where(ctx == 1, path_lv[i][1], path_lv[i][2]))
        pc_sel = jnp.where(ctx == 0, path_pc[i][0],
                           jnp.where(ctx == 1, path_pc[i][1], path_pc[i][2]))
        ok_sel = jnp.where(ctx == 0, path_ok[i][0],
                           jnp.where(ctx == 1, path_ok[i][1], path_ok[i][2]))
        act = (n <= best_n) & ok_sel
        out[n] = jnp.where(act, lv_sel, 0)
        ctx = jnp.where(act, pc_sel, ctx)

    lv_zz = jnp.stack(out, axis=n_lead)                    # [..., 16, N]
    dq_zz = lv_zz * q
    return lv_zz, dq_zz[..., INV_ZIGZAG, :]


def tlam_i4(q_row):
    """Trellis lambda for I4 blocks from the y1 quant row [16, 1|N]
    (host parity: lossy/encode.py:428, encode.go TLambdaI4)."""
    base = (q_row[0] + 15 * q_row[1] + 8) >> 4
    return jnp.maximum((7 * base * base) >> 3, 1).astype(jnp.float32)
