"""Planar phase-2 (ops/planar.py) is bit-identical to fastpath._phase2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as fp
from webp_tpu.ops import planar as pl
from webp_tpu.ops import i4 as I4


def _mk_inputs(B, mb_w, mb_h, seed=0):
    rng = np.random.default_rng(seed)
    H, W = mb_h * 16, mb_w * 16
    Y = rng.integers(0, 256, (B, H, W), np.int32)
    U = rng.integers(0, 256, (B, H // 2, W // 2), np.int32)
    V = rng.integers(0, 256, (B, H // 2, W // 2), np.int32)
    return Y, U, V


@pytest.mark.parametrize("sk,use_i4,rd_drop,segments", [
    # One representative config stays in the fast tier (the fullest one:
    # skew-2, I4 on, rd_drop, 4 segments); the rest are compile-heavy
    # (~30 s each on the 1-core host) and run in the slow tier.
    pytest.param(1, False, 0.0, 1, marks=pytest.mark.slow),
    pytest.param(1, True, 0.0, 1, marks=pytest.mark.slow),
    pytest.param(1, True, 1024.0, 4, marks=pytest.mark.slow),
    (2, True, 1024.0, 4),
])
def test_phase2_planar_bit_exact(sk, use_i4, rd_drop, segments):
    B, mb_w, mb_h = 2, 5, 3
    quality = 75
    n_mb = mb_w * mb_h
    Y, U, V = _mk_inputs(B, mb_w, mb_h, seed=sk * 10 + int(use_i4))
    qp, lambdas = fp.rd_params(quality)
    lambdas_j = {k: jnp.float32(v) for k, v in lambdas.items()}
    rt = fp.RateTables(np.asarray(fp.T.COEFFS_PROBA0))
    use_segments = segments > 1

    def part1(Yi, Ui, Vi):
        Yi, Ui, Vi = (a.astype(jnp.int32) for a in (Yi, Ui, Vi))
        if use_segments:
            seg_map, seg_q, _, _ = fp._segment_plan_device(
                Yi, Ui, Vi, mb_w, mb_h, quality, 50, segments)
            qp_i, lam_i, seg_rows = fp._mb_quant(seg_map, seg_q, n_mb)
        else:
            seg_map = jnp.zeros((n_mb,), jnp.int32)
            qp_i, lam_i, seg_rows = qp, lambdas_j, None
        modes, uvmodes, i16_score = fp._phase1(Yi, Ui, Vi, qp_i, lam_i, rt,
                                               mb_w, mb_h)
        if use_i4:
            src_b = fp._block(Yi.reshape(mb_h, 16, mb_w, 16)
                              .transpose(0, 2, 1, 3).reshape(n_mb, 16, 16),
                              16)
            is_i4, i4_modes, _ = I4.i4_search(
                Yi, src_b, qp_i["y1"], lam_i["i4"], rt, mb_w, mb_h,
                i16_score, fp.approx_block_rate, allow_tr=(sk == 2))
        else:
            is_i4 = jnp.zeros((n_mb,), bool)
            i4_modes = jnp.zeros((n_mb, 16), jnp.uint8)
        return modes, uvmodes, is_i4, i4_modes, seg_map, seg_rows

    outs = jax.vmap(part1)(Y, U, V)
    modes, uvmodes, is_i4, i4_modes, seg_map, seg_rows = outs
    i4_ctx = (is_i4, i4_modes) if use_i4 else None

    def ref_one(Yi, Ui, Vi, m, uvm, ii4, i4m, sm, sr):
        seg = (sm, sr) if use_segments else None
        i4c = (ii4, i4m) if use_i4 else None
        lv24, y2, bottom, right, _, _ = fp._phase2(
            Yi.astype(jnp.int32), Ui.astype(jnp.int32), Vi.astype(jnp.int32),
            m, uvm, qp, mb_w, mb_h, rd_drop=rd_drop, seg=seg, i4=i4c, sk=sk)
        return lv24, y2, bottom, right

    if use_segments:
        ref = jax.vmap(ref_one)(Y, U, V, modes, uvmodes, is_i4, i4_modes,
                                seg_map, seg_rows)
        seg = (seg_map, seg_rows)
    else:
        ref = jax.vmap(lambda a, b, c, m, u, i, im: ref_one(
            a, b, c, m, u, i, im, None, None))(
            Y, U, V, modes, uvmodes, is_i4, i4_modes)
        seg = None

    got = pl.phase2_planar(Y, U, V, modes, uvmodes, qp, mb_w, mb_h,
                           rd_drop=rd_drop, seg=seg, i4=i4_ctx, sk=sk)
    names = ("lv24", "y2", "bottom", "right")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)


def test_uv_rate4_p_matches_host_chain():
    """uv_rate4_p == the host UVRate chain (vp8_enc_loop.cc /
    encode.py _uv_rate): 4-block ctx chaining, first=0, pt=2, plus the
    outgoing 2-bit top/left nonzero masks."""
    from webp_tpu.lossy import cost as C
    from webp_tpu.lossy import tables as T

    proba = np.asarray(T.COEFFS_PROBA0)
    ct = C.compute_level_cost_tables(proba)
    rng = np.random.default_rng(3)
    N = 64
    lv = rng.integers(-40, 41, (4, 16, N), np.int32)
    # Mix in sparse and empty blocks (the common cases).
    lv[:, :, : N // 3] *= rng.integers(0, 2, (4, 16, N // 3))
    lv[:, :, : N // 8] = 0
    tnz = rng.integers(0, 4, N, np.int32)
    lnz = rng.integers(0, 4, N, np.int32)

    rate, t2, l2 = pl.uv_rate4_p(jnp.asarray(lv), jnp.asarray(tnz),
                                 jnp.asarray(lnz))
    rate, t2, l2 = np.asarray(rate), np.asarray(t2), np.asarray(l2)

    for n in range(N):
        want = 0
        t = [int((tnz[n] >> c) & 1) for c in range(2)]
        l = [int((lnz[n] >> r) & 1) for r in range(2)]
        for r in range(2):
            for c in range(2):
                bi = r * 2 + c
                want += C.residual_cost(lv[bi, :, n], 0, t[c] + l[r], 2,
                                        ct, proba)
                b = 1 if (lv[bi, :, n] != 0).any() else 0
                t[c] = b
                l[r] = b
        assert rate[n] == want, n
        assert t2[n] == t[0] | (t[1] << 1), n
        assert l2[n] == l[0] | (l[1] << 1), n


@pytest.mark.parametrize("segments,sns", [(1, 0), (1, 50), (4, 50)])
def test_phase1_planar_bit_exact(segments, sns):
    """Planar phase 0/1 (ops/phase1p.py) == vmapped fastpath._phase1 +
    fastpath._segment_plan_device: same modes, scores and segment plan."""
    from webp_tpu.ops import phase1p as P1

    B, mb_w, mb_h = 2, 5, 3
    quality = 75
    n_mb = mb_w * mb_h
    L = B * n_mb
    Y, U, V = _mk_inputs(B, mb_w, mb_h, seed=segments * 7 + sns)
    qp, lambdas = fp.rd_params(quality)
    lambdas_j = {k: jnp.float32(v) for k, v in lambdas.items()}
    rt = fp.RateTables(np.asarray(fp.T.COEFFS_PROBA0))
    use_segments = segments > 1

    def ref_one(Yi, Ui, Vi):
        Yi, Ui, Vi = (a.astype(jnp.int32) for a in (Yi, Ui, Vi))
        if use_segments:
            seg_map, seg_q, seg_beta, _ = fp._segment_plan_device(
                Yi, Ui, Vi, mb_w, mb_h, quality, sns, segments)
            qp_i, lam_i, _ = fp._mb_quant(seg_map, seg_q, n_mb)
            tlsd4, tlsd = fp._tlsd_from_seg(sns, seg_q, seg_map)
        else:
            seg_map = jnp.zeros((n_mb,), jnp.int32)
            seg_q = jnp.zeros((4,), jnp.int32)
            seg_beta = jnp.zeros((4,), jnp.int32)
            qp_i, lam_i = qp, lambdas_j
            tlsd4, tlsd = fp._tlsd_static(sns, lambdas["q_i4"], n_mb)
        modes, uvmodes, sc = fp._phase1(Yi, Ui, Vi, qp_i, lam_i, rt,
                                        mb_w, mb_h, tlsd=tlsd)
        return modes, uvmodes, sc, seg_map, seg_q, seg_beta

    r_modes, r_uv, r_sc, r_seg, r_q, r_beta = jax.vmap(ref_one)(Y, U, V)

    srcY = P1._src_planar(jnp.asarray(Y), mb_h, mb_w, 16)
    srcU = P1._src_planar(jnp.asarray(U), mb_h, mb_w, 8)
    srcV = P1._src_planar(jnp.asarray(V), mb_h, mb_w, 8)
    tabs, lam_i16_t, lam_uv_t, lam_i4_t, qi4_t = fp.all_q_tables()
    if use_segments:
        seg_map, seg_q, seg_beta, _ = P1.plan_segments_planar(
            srcY, srcU, srcV, B, n_mb, quality, sns, segments)
        np.testing.assert_array_equal(np.asarray(r_seg), np.asarray(seg_map))
        np.testing.assert_array_equal(np.asarray(r_q), np.asarray(seg_q))
        np.testing.assert_array_equal(np.asarray(r_beta),
                                      np.asarray(seg_beta))
        seg_lane = seg_map.reshape(L)
        oh_q = jax.nn.one_hot(seg_q, 128, dtype=jnp.int32)
        qp_rows = {}
        for k in ("y1", "y2", "uv"):
            tab = jnp.asarray(tabs[k].reshape(128, 64), jnp.int32)
            rows = jnp.einsum("bsq,qf->bsf", oh_q, tab).reshape(B, 4, 4, 16)
            r4 = jnp.broadcast_to(rows.transpose(1, 2, 3, 0)[..., None],
                                  (4, 4, 16, B, n_mb)).reshape(4, 4, 16, L)
            qp_rows[k] = tuple(pl._seg_select_p(r4[:, i], seg_lane)
                               for i in range(4))

        def lane_of(tab_t):
            segv = (oh_q * jnp.asarray(tab_t, jnp.float32)).sum(axis=2)
            r = jnp.broadcast_to(segv.T[..., None],
                                 (4, B, n_mb)).reshape(4, L)
            return pl._seg_select_p(r, seg_lane)

        lam_l = {"i16": lane_of(lam_i16_t), "uv": lane_of(lam_uv_t),
                 "mode": lane_of(fp._lam_mode_table(qi4_t))}
        if sns > 0:
            qi4_seg = jnp.take(jnp.asarray(qi4_t, jnp.int32), seg_q)
            tlsd4 = ((sns * qi4_seg) >> 5).astype(jnp.float32)
            tlsd_l = pl._seg_select_p(
                jnp.broadcast_to(tlsd4.T[..., None],
                                 (4, B, n_mb)).reshape(4, L), seg_lane)
        else:
            tlsd_l = None
    else:
        qp_rows = {k: tuple(jnp.asarray(a, jnp.int32).reshape(16, 1)
                            for a in qp[k]) for k in ("y1", "y2", "uv")}
        lam_l = {"i16": lambdas_j["i16"], "uv": lambdas_j["uv"],
                 "mode": lambdas_j["mode"]}
        _, tlsd_l = fp._tlsd_static(sns, lambdas["q_i4"], n_mb)

    g_modes, g_uv, g_sc = P1.phase1_planar(
        jnp.asarray(Y), jnp.asarray(U), jnp.asarray(V), qp_rows, lam_l, rt,
        mb_w, mb_h, tlsd=tlsd_l, srcs=(srcY, srcU, srcV))
    np.testing.assert_array_equal(np.asarray(r_modes), np.asarray(g_modes))
    np.testing.assert_array_equal(np.asarray(r_uv), np.asarray(g_uv))
    np.testing.assert_array_equal(np.asarray(r_sc), np.asarray(g_sc))
