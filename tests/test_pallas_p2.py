"""Pallas phase-2 wavefront kernel vs the jnp planar scan: the unpacked
levels, y2 blocks, skips and escape contents must match exactly (the
packed REPRESENTATION differs only in that fully-escaped blocks ship
zeroed nibbles; unpacking resolves both forms to the same levels)."""

import numpy as np

import jax
import jax.numpy as jnp

from webp_tpu.ops import fastpath as FP
from webp_tpu.ops import planar as PL
from webp_tpu.ops import pallas_p2 as P2


def _unpack(out, n_mb):
    lv = FP.unpack_levels(np.asarray(out["packed"]),
                          np.asarray(out["esc_idx"]),
                          np.asarray(out["esc_val"]),
                          int(out["esc_cnt"]), n_mb)
    return lv


def _run(seed, B, W, H, quality, segments, i4_on, rd_drop):
    mb_w, mb_h = W // 16, H // 16
    n_mb = mb_w * mb_h
    rng = np.random.default_rng(seed)
    Y = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    U = jnp.asarray(rng.integers(0, 256, (B, H // 2, W // 2), np.uint8))
    V = jnp.asarray(rng.integers(0, 256, (B, H // 2, W // 2), np.uint8))
    modes = jnp.asarray(rng.integers(0, 4, (B, n_mb), np.uint8))
    uvmodes = jnp.asarray(rng.integers(0, 4, (B, n_mb), np.uint8))
    qp, _ = FP.rd_params(quality)
    esc_cap = max(1024, FP.ESC_BLOCKS_PER_MB * n_mb)

    if segments:
        seg_q = jnp.asarray(rng.integers(20, 100, (B, 4), np.int32))
        seg_map = jnp.asarray(rng.integers(0, 4, (B, n_mb), np.int32))
        tabs = FP.all_q_tables()[0]
        oh_q = jax.nn.one_hot(seg_q, 128, dtype=jnp.int32)
        seg_rows = {}
        for k in ("y1", "y2", "uv"):
            tab = jnp.asarray(tabs[k].reshape(128, 64), jnp.int32)
            seg_rows[k] = jnp.einsum("bsq,qf->bsf", oh_q, tab) \
                .reshape(B, 4, 4, 16)
        seg = (seg_map, seg_rows)
    else:
        seg = None
    if i4_on:
        is_i4 = jnp.asarray(rng.integers(0, 2, (B, n_mb)).astype(bool))
        # Rightmost subblock column: no TR modes at skew 1 (i4_search's
        # TR ban); emulate with modes < 10 that exclude 2/6/7 on c3.
        im = rng.integers(0, 10, (B, n_mb, 16))
        c3 = (np.arange(16) % 4) == 3
        im[..., c3] = np.where(np.isin(im[..., c3], (2, 6, 7)), 1,
                               im[..., c3])
        i4_modes = jnp.asarray(im.astype(np.uint8))
        i4 = (is_i4, i4_modes)
    else:
        i4 = None

    lv_ref, y2_ref, _, _ = PL.phase2_planar(
        Y, U, V, modes, uvmodes, qp, mb_w, mb_h, rd_drop=rd_drop,
        seg=seg, i4=i4, sk=1)
    skip_ref = (np.asarray(lv_ref) == 0).all(axis=(-2, -1)) \
        & (np.asarray(y2_ref) == 0).all(axis=-1)

    out = P2.phase2_pack_pallas(
        Y, U, V, modes, uvmodes, qp, mb_w, mb_h, rd_drop=rd_drop,
        seg=seg, i4=i4, esc_cap=esc_cap, interpret=True)

    for b in range(B):
        one = {k: (v[b] if k != "esc_cnt" else v[b]) for k, v in out.items()}
        cnt = int(out["esc_cnt"][b])
        assert cnt <= esc_cap, "unexpected per-MB escape overflow in test"
        lv = FP.unpack_levels(np.asarray(out["packed"][b]),
                              np.asarray(out["esc_idx"][b]),
                              np.asarray(out["esc_val"][b]),
                              cnt, n_mb)
        np.testing.assert_array_equal(lv, np.asarray(lv_ref[b]))
    np.testing.assert_array_equal(np.asarray(out["y2"]),
                                  np.asarray(y2_ref))
    np.testing.assert_array_equal(np.asarray(out["skip"]), skip_ref)


def test_p2_kernel_plain():
    _run(1, 2, 64, 32, 75, False, False, 0.0)


def test_p2_kernel_i4_rd_drop():
    _run(2, 2, 64, 48, 75, False, True, 1024.0)


def test_p2_kernel_segments_i4():
    _run(3, 2, 48, 64, 50, True, True, 1024.0)
