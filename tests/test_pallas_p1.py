"""Pallas phase-1 I16/UV kernel vs the jnp planar formulation: modes,
uvmodes and I16 scores must be bit-identical (same guarantee as the
I4 kernel's tests/test_pallas.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webp_tpu.lossy import tables as T
from webp_tpu.ops import fastpath as FP
from webp_tpu.ops import phase1p as P1


def _inputs(B, W, H, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (B, H, W), np.uint8)
    # Smooth-ish content so mode choices are not pure noise.
    Y = (base // 2 + np.arange(W, dtype=np.uint8)[None, None, :] // 2)
    U = rng.integers(0, 256, (B, H // 2, W // 2), np.uint8)
    V = rng.integers(0, 256, (B, H // 2, W // 2), np.uint8)
    return (jnp.asarray(Y.astype(np.uint8)), jnp.asarray(U),
            jnp.asarray(V))


def _single_seg_tabs(quality, B):
    qp, lambdas = FP.rd_params(quality)
    one = np.stack([np.stack([np.asarray(qp[k][i], np.int32).reshape(16)
                              for i in range(4)])
                    for k in ("y1", "y2", "uv")])        # [3, 4, 16]
    qtab = np.broadcast_to(np.repeat(one[:, None], 4, axis=1)
                           .reshape(48, 16), (B, 48, 16))
    lam16 = np.full((B, 4), lambdas["i16"], np.float32)
    lamuv = np.full((B, 4), lambdas["uv"], np.float32)
    return qp, lambdas, jnp.asarray(qtab.copy()), lam16, lamuv


def _run_case(geom, quality, use_td, B=2):
    W, H = geom
    mb_w, mb_h = W // 16, H // 16
    n_mb = mb_w * mb_h
    Y, U, V = _inputs(B, W, H)
    qp, lambdas, qtabs, lam16, lamuv = _single_seg_tabs(quality, B)
    rt = FP.RateTables(np.asarray(T.COEFFS_PROBA0))

    qp_rows = {k: tuple(jnp.asarray(a, jnp.int32).reshape(16, 1)
                        for a in qp[k]) for k in ("y1", "y2", "uv")}
    lam_l = {"i16": jnp.float32(lambdas["i16"]),
             "uv": jnp.float32(lambdas["uv"])}
    if use_td:
        tlsd4_s, tlsd_s = FP._tlsd_static(50, lambdas["q_i4"], n_mb)
        tlsd4 = np.broadcast_to(np.asarray(tlsd4_s), (B, 4)).copy()
        tlsd_l = tlsd_s
    else:
        tlsd4, tlsd_l = None, None

    m_ref, uv_ref, sc_ref = P1.phase1_planar(
        Y, U, V, qp_rows, lam_l, rt, mb_w, mb_h, tlsd=tlsd_l)

    seg0 = jnp.zeros((B, n_mb), jnp.int32)
    m_k, uv_k, sc_k = P1.phase1_planar_pallas(
        Y, U, V, qtabs, lam16, lamuv, tlsd4, seg0, rt, mb_w, mb_h,
        interpret=True)

    np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(uv_k), np.asarray(uv_ref))
    # Mode/uv choices are bit-identical; the emitted lambda_mode-rescored
    # score may differ by fma-contraction ulps between Mosaic and XLA.
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_ref),
                               rtol=3e-7)


def test_p1_kernel_matches_jnp_plain():
    _run_case((64, 32), 75, False)


def test_p1_kernel_matches_jnp_tlsd():
    _run_case((64, 32), 75, True)


def test_p1_kernel_matches_jnp_nonpow2_geom():
    _run_case((48, 64), 50, True)


def test_alpha_kernel_matches_jnp():
    """Pallas segment-alpha kernel vs phase1p._alphas_planar."""
    B, W, H = 2, 64, 48
    mb_w, mb_h = W // 16, H // 16
    n_mb = mb_w * mb_h
    Y, U, V = _inputs(B, W, H, seed=5)
    srcY = P1._src_planar(Y, mb_h, mb_w, 16)
    srcU = P1._src_planar(U, mb_h, mb_w, 8)
    srcV = P1._src_planar(V, mb_h, mb_w, 8)
    ref, ref_uv = P1._alphas_planar2(srcY, srcU, srcV, B, n_mb)
    src_rows, _, n_mb_p = P1.build_src_pallas(
        Y, U, V, mb_w, mb_h, srcs=(srcY, srcU, srcV))
    got, got_uv = P1.alphas_planar_pallas(src_rows, B, n_mb, n_mb_p,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got_uv), np.asarray(ref_uv))


def test_p1_kernel_matches_jnp_segments():
    """Per-image segment plans: 4 distinct quant rows + per-seg lambdas."""
    B, W, H = 2, 64, 48
    mb_w, mb_h = W // 16, H // 16
    n_mb = mb_w * mb_h
    Y, U, V = _inputs(B, W, H, seed=3)
    rt = FP.RateTables(np.asarray(T.COEFFS_PROBA0))

    rng = np.random.default_rng(11)
    seg_q = jnp.asarray(rng.integers(20, 100, (B, 4), np.int32))
    seg_map = jnp.asarray(rng.integers(0, 4, (B, n_mb), np.int32))

    tabs, lam_i16_t, lam_uv_t, lam_i4_t, qi4_t = FP.all_q_tables()
    oh_q = jax.nn.one_hot(seg_q, 128, dtype=jnp.int32)
    seg_rows = {}
    qp_rows = {}
    L = B * n_mb
    seg_lane = seg_map.reshape(L)
    from webp_tpu.ops.planar import _seg_select_p
    for k in ("y1", "y2", "uv"):
        tab = jnp.asarray(tabs[k].reshape(128, 64), jnp.int32)
        rows = jnp.einsum("bsq,qf->bsf", oh_q, tab)
        seg_rows[k] = rows.reshape(B, 4, 4, 16)
        r4 = jnp.broadcast_to(
            seg_rows[k].transpose(1, 2, 3, 0)[..., None],
            (4, 4, 16, B, n_mb)).reshape(4, 4, 16, L)
        qp_rows[k] = tuple(_seg_select_p(r4[:, i], seg_lane)
                           for i in range(4))

    def lane_of(tab_t):
        segv = (oh_q * jnp.asarray(tab_t, jnp.float32)).sum(axis=2)
        r = jnp.broadcast_to(segv.T[..., None], (4, B, n_mb)).reshape(4, L)
        return segv, _seg_select_p(r, seg_lane)

    lam16_4b, lam16_l = lane_of(lam_i16_t)
    lamuv_4b, lamuv_l = lane_of(lam_uv_t)
    sns = 50
    qi4_seg = jnp.take(jnp.asarray(qi4_t, jnp.int32), seg_q)
    tlsd4 = ((sns * qi4_seg) >> 5).astype(jnp.float32)
    tlsd_l = _seg_select_p(
        jnp.broadcast_to(tlsd4.T[..., None], (4, B, n_mb)).reshape(4, L),
        seg_lane)

    m_ref, uv_ref, sc_ref = P1.phase1_planar(
        Y, U, V, qp_rows, {"i16": lam16_l, "uv": lamuv_l}, rt,
        mb_w, mb_h, tlsd=tlsd_l)

    qtabs = jnp.stack([seg_rows[k] for k in ("y1", "y2", "uv")],
                      axis=1).reshape(B, 48, 16)
    m_k, uv_k, sc_k = P1.phase1_planar_pallas(
        Y, U, V, qtabs, lam16_4b, lamuv_4b, tlsd4, seg_map, rt,
        mb_w, mb_h, interpret=True)

    np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(uv_k), np.asarray(uv_ref))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_ref),
                               rtol=3e-7)
