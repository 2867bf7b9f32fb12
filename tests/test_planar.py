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
            seg_map, seg_q, _ = fp._segment_plan_device(
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
