"""Pallas I4-search kernel (ops/pallas_i4.py) vs the jnp formulation:
bit-identical modes and scores (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from webp_tpu.ops import fastpath as fp, i4 as I4
from webp_tpu.lossy import tables as T


@pytest.mark.parametrize("use_td", [False, True])
def test_pallas_luma_analysis_matches_jnp(use_td):
    """Fused natural-layout analysis kernel (ops/pallas_analysis.py):
    I16 modes/scores and I4 modes/scores bit-identical to the jnp
    phase-1 luma + open-loop i4_search."""
    from webp_tpu.ops import pallas_analysis as PA

    mbw, mbh = 8, 6
    rng = np.random.default_rng(2 if use_td else 0)
    H, W = mbh * 16, mbw * 16
    n_mb = mbw * mbh
    Y = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    U = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.int32)
    V = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.int32)
    qp, lambdas = fp.rd_params(75)
    rt = fp.RateTables(np.asarray(T.COEFFS_PROBA0))
    tlsd = jnp.float32(7.0) if use_td else None
    tlsd4 = jnp.full((4,), 7.0, jnp.float32) if use_td else None

    modes, _, i16_score = fp._phase1(Y, U, V, qp, lambdas, rt, mbw, mbh,
                                     tlsd=tlsd)
    src_b = fp._block(
        Y.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
        .reshape(n_mb, 16, 16), 16)
    inf = jnp.full((n_mb,), 1e18, jnp.float32)
    _, i4m_ref, i4s_ref = I4.i4_search(
        Y, src_b, qp["y1"], jnp.float32(lambdas["i4"]), rt, mbw, mbh,
        inf, fp.approx_block_rate, tlsd=tlsd,
        lam_mode=jnp.float32(lambdas["mode"]))

    qtab_y1 = jnp.tile(jnp.stack(
        [jnp.asarray(a, jnp.int32).reshape(16) for a in qp["y1"]]), (4, 1))
    y2q = tuple(a[:, 0] if getattr(a, "ndim", 0) == 3 else a
                for a in qp["y2"])
    qtab_y2 = jnp.tile(jnp.stack(
        [jnp.asarray(a, jnp.int32).reshape(16) for a in y2q]), (4, 1))
    lam16_4 = jnp.full((4,), lambdas["i16"], jnp.float32)
    lam4_4 = jnp.full((4,), lambdas["i4"], jnp.float32)
    lammd_4 = jnp.full((4,), lambdas["mode"], jnp.float32)
    i16m, i16s, i4m, i4s = PA.luma_analysis(
        Y, None, qtab_y1, qtab_y2, lam16_4, lam4_4, tlsd4, rt, mbw, mbh,
        interpret=True, lam_mode4=lammd_4)

    assert np.array_equal(np.asarray(modes), np.asarray(i16m))
    assert np.allclose(np.asarray(i16_score), np.asarray(i16s))
    assert np.array_equal(np.asarray(i4m_ref), np.asarray(i4m))
    delta = np.asarray(I4.ctx_mode_rate_delta(
        jnp.asarray(np.asarray(i4m)), mbw, mbh))
    got = (np.asarray(i4s).sum(axis=1)
           + (I4.I4_OVERHEAD + delta) * float(lambdas["mode"]))
    assert np.allclose(np.asarray(i4s_ref), got, rtol=1e-6)


@pytest.mark.parametrize("mbw,mbh", [(8, 6), (5, 3)])
def test_pallas_i4_matches_jnp(mbw, mbh):
    rng = np.random.default_rng(0)
    H, W = mbh * 16, mbw * 16
    n_mb = mbw * mbh
    Y = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    src_b = fp._block(
        Y.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
        .reshape(n_mb, 16, 16), 16)
    qp, lambdas = fp.rd_params(75)
    rt = fp.RateTables(np.asarray(T.COEFFS_PROBA0))
    i16 = jnp.full((n_mb,), 1e18, jnp.float32)
    ref = I4.i4_search(Y, src_b, qp["y1"], jnp.float32(lambdas["i4"]),
                       rt, mbw, mbh, i16, fp.approx_block_rate)
    one = jnp.stack([jnp.asarray(a, jnp.int32).reshape(16)
                     for a in qp["y1"]])
    qtab = jnp.tile(one, (4, 1))
    lam4 = jnp.full((4,), lambdas["i4"], jnp.float32)
    seg = jnp.zeros((n_mb,), jnp.int32)
    got = I4.i4_search_pallas(Y, src_b, seg, qtab, lam4, rt, mbw, mbh,
                              i16, interpret=True)
    assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    assert np.allclose(np.asarray(ref[2]), np.asarray(got[2]))
    assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
