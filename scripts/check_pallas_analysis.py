"""Parity check: ops/pallas_analysis.luma_analysis vs the jnp phase-1
luma (I16) + ops/i4.i4_search (open-loop), interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp

from webp_tpu.ops import fastpath as fp, i4 as I4
from webp_tpu.ops import pallas_analysis as PA
from webp_tpu.lossy import tables as T


def run(mbw, mbh, quality=75, seed=0, use_td=False):
    rng = np.random.default_rng(seed)
    H, W = mbh * 16, mbw * 16
    n_mb = mbw * mbh
    Y = jnp.asarray(rng.integers(0, 256, (H, W)), jnp.int32)
    U = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.int32)
    V = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)), jnp.int32)
    qp, lambdas = fp.rd_params(quality)
    rt = fp.RateTables(np.asarray(T.COEFFS_PROBA0))

    tlsd = None
    tlsd4 = None
    if use_td:
        tlsd = jnp.float32(7.0)
        tlsd4 = jnp.full((4,), 7.0, jnp.float32)

    # --- jnp reference.
    modes, uvmodes, i16_score = fp._phase1(Y, U, V, qp, lambdas, rt,
                                           mbw, mbh, tlsd=tlsd)
    src_b = fp._block(
        Y.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
        .reshape(n_mb, 16, 16), 16)
    inf = jnp.full((n_mb,), 1e18, jnp.float32)
    _, i4m_ref, i4s_ref = I4.i4_search(
        Y, src_b, qp["y1"], jnp.float32(lambdas["i4"]), rt, mbw, mbh,
        inf, fp.approx_block_rate, tlsd=tlsd)

    # --- fused kernel.
    qtab_y1 = jnp.tile(jnp.stack(
        [jnp.asarray(a, jnp.int32).reshape(16) for a in qp["y1"]]), (4, 1))
    y2q = tuple(a[:, 0] if getattr(a, "ndim", 0) == 3 else a
                for a in qp["y2"])
    qtab_y2 = jnp.tile(jnp.stack(
        [jnp.asarray(a, jnp.int32).reshape(16) for a in y2q]), (4, 1))
    lam16_4 = jnp.full((4,), lambdas["i16"], jnp.float32)
    lam4_4 = jnp.full((4,), lambdas["i4"], jnp.float32)
    i16m, i16s, i4m, i4s = PA.luma_analysis(
        Y, None, qtab_y1, qtab_y2, lam16_4, lam4_4, tlsd4, rt, mbw, mbh,
        interpret=True)

    ok = True
    if not np.array_equal(np.asarray(modes), np.asarray(i16m)):
        d = np.flatnonzero(np.asarray(modes) != np.asarray(i16m))
        print(f"I16 modes differ at {d[:8]}: ref {np.asarray(modes)[d[:8]]} "
              f"got {np.asarray(i16m)[d[:8]]}")
        ok = False
    if not np.allclose(np.asarray(i16_score), np.asarray(i16s)):
        d = np.flatnonzero(~np.isclose(np.asarray(i16_score),
                                       np.asarray(i16s)))
        print(f"I16 scores differ at {d[:8]}: "
              f"ref {np.asarray(i16_score)[d[:4]]} got {np.asarray(i16s)[d[:4]]}")
        ok = False
    if not np.array_equal(np.asarray(i4m_ref), np.asarray(i4m)):
        d = np.argwhere(np.asarray(i4m_ref) != np.asarray(i4m))
        print(f"I4 modes differ at {d[:8].tolist()}")
        for (mb, sb) in d[:4]:
            print(f"  mb {mb} sb {sb}: ref {np.asarray(i4m_ref)[mb, sb]} "
                  f"got {np.asarray(i4m)[mb, sb]}")
        ok = False
    s_ref = np.asarray(i4s_ref)
    s_got = (np.asarray(i4s).sum(axis=1)
             + I4.I4_OVERHEAD * float(lambdas["i4"]))
    if not np.allclose(s_ref, s_got, rtol=1e-6):
        d = np.flatnonzero(~np.isclose(s_ref, s_got))
        print(f"I4 scores differ at {d[:8]}: ref {s_ref[d[:4]]} got {s_got[d[:4]]}")
        ok = False
    print(f"mbw={mbw} mbh={mbh} td={use_td}: {'OK' if ok else 'MISMATCH'}")
    return ok


if __name__ == "__main__":
    ok = run(8, 6)
    ok &= run(5, 3, seed=1)
    ok &= run(8, 6, use_td=True, seed=2)
    raise SystemExit(0 if ok else 1)
