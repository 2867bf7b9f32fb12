"""Planar Viterbi trellis (ops/trellis.py) parity with the host oracle.

The device trellis must reproduce lossy/quant.py trellis_quantize_block
(itself parity with reference encode_trellis.go) for realistic
coefficient magnitudes; the float32 score accumulation only diverges on
pathological all-huge-coefficient blocks (documented in the module).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from webp_tpu.lossy import tables as T
from webp_tpu.lossy.quant import SegmentQuant, trellis_quantize_block
from webp_tpu.ops.trellis import tlam_i4, trellis_p


def _tlam(sq):
    return max((7 * ((int(sq.q[0]) + 15 * int(sq.q[1]) + 8) >> 4) ** 2) >> 3,
               1)


@pytest.mark.parametrize("dc,ac", [(8, 10), (40, 52), (120, 140)])
def test_trellis_planar_matches_oracle(dc, ac):
    rng = np.random.default_rng(dc)
    N = 256
    sq = SegmentQuant.make(dc, ac, 0, sharpen=True)
    tl = _tlam(sq)
    coeffs = rng.integers(-240, 241, (N, 16)).astype(np.int64)
    # sprinkle some larger outliers (single big coefficient per block)
    coeffs[:: 4, rng.integers(0, 16)] = rng.integers(-2000, 2000)
    ctx0 = rng.integers(0, 3, N)

    ref = np.zeros((N, 16), np.int32)
    ref_dq = np.zeros((N, 16), np.int32)
    for i in range(N):
        lv, dq = trellis_quantize_block(coeffs[i], sq, 0, 3, int(ctx0[i]),
                                        T.COEFFS_PROBA0, tl)
        ref[i], ref_dq[i] = lv, dq

    rows = lambda a: jnp.asarray(a, jnp.int32).reshape(16, 1)
    lv, dq = trellis_p(jnp.asarray(coeffs.T), rows(sq.q), rows(sq.iq),
                       rows(sq.sharpen), float(tl), jnp.asarray(ctx0))
    np.testing.assert_array_equal(np.asarray(lv).T, ref)
    np.testing.assert_array_equal(np.asarray(dq).T, ref_dq)


def test_tlam_matches_host():
    sq = SegmentQuant.make(40, 52, 0)
    got = float(tlam_i4(jnp.asarray(sq.q, jnp.int32).reshape(16, 1))[0])
    assert got == _tlam(sq)


def test_trellis_respects_ctx_chain():
    """Different ctx0 must be able to change the output levels."""
    sq = SegmentQuant.make(40, 52, 0, sharpen=True)
    tl = _tlam(sq)
    rng = np.random.default_rng(7)
    coeffs = rng.integers(-60, 61, (64, 16)).astype(np.int64)
    rows = lambda a: jnp.asarray(a, jnp.int32).reshape(16, 1)
    outs = []
    for c in range(3):
        lv, _ = trellis_p(jnp.asarray(coeffs.T), rows(sq.q), rows(sq.iq),
                          rows(sq.sharpen), float(tl),
                          jnp.full((64,), c, jnp.int32))
        outs.append(np.asarray(lv))
    assert any((outs[0] != o).any() for o in outs[1:])
