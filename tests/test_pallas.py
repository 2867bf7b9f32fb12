"""Pallas I4-search kernel (ops/pallas_i4.py) vs the jnp formulation:
bit-identical modes and scores (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from webp_tpu.ops import fastpath as fp, i4 as I4
from webp_tpu.lossy import tables as T


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
