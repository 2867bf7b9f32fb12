"""Exact band-pipelined multi-chip encoder vs the single-chip flagship."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _photo_batch(B, H, W):
    from PIL import Image

    im = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    base = np.asarray(im.resize((W, H)))
    return np.stack([np.roll(base, 7 * i, axis=1) for i in range(B)])


def test_exact_pipeline_matches_single_chip():
    """Phase-1 context via source-halo extension + phase-2 recon halos over
    ICI must reproduce the single-chip fast_encode_fn levels bit-for-bit
    (parallel/exact.py; the mesh.py band path is a 1-row approximation)."""
    from webp_tpu.ops.fastpath import fast_encode_fn, unpack_levels
    from webp_tpu.parallel.exact import (make_exact_encode_fn,
                                         make_pipeline_mesh)

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    mesh = make_pipeline_mesh(4)
    sp = mesh.shape["sp"]
    B, H, W = 3, 16 * 2 * sp, 64  # 2 MB rows per band
    rgb = _photo_batch(B, H, W)

    step = make_exact_encode_fn(mesh, B, quality=75, segments=4,
                                sns_strength=50, i4_blocks=True)
    out = [np.asarray(o) for o in step(rgb)]
    (packed, esc_idx, esc_val, esc_cnt, y2, modes, uvm, skip, is_i4,
     imodes, seg_map, seg_q, seg_beta, dq_uv, hist) = out

    fn = fast_encode_fn(W // 16, H // 16, 75, 4, 50, True)
    ref = fn.rgb(rgb)
    ref_lv = np.stack([
        unpack_levels(np.asarray(ref["packed"])[b],
                      np.asarray(ref["esc_idx"])[b],
                      np.asarray(ref["esc_val"])[b],
                      np.asarray(ref["esc_cnt"])[b], fn.n_mb)
        for b in range(B)])

    n_mb = W // 16 * (H // 16)
    n_loc = n_mb // sp
    cap = esc_idx.shape[1] // sp
    for b in range(B):
        lv = np.empty((n_mb, 24, 16), np.int16)
        for s in range(sp):
            sl = slice(s * n_loc, (s + 1) * n_loc)
            lv[sl] = unpack_levels(
                packed[b, sl], esc_idx[b, s * cap:(s + 1) * cap],
                esc_val[b, s * cap:(s + 1) * cap], esc_cnt[b, s], n_loc)
        assert np.array_equal(seg_map[b], np.asarray(ref["seg_map"])[b]), b
        assert np.array_equal(modes[b], np.asarray(ref["modes"])[b]), b
        assert np.array_equal(is_i4[b], np.asarray(ref["is_i4"])[b]), b
        assert np.array_equal(y2[b], np.asarray(ref["y2"])[b]), b
        assert np.array_equal(dq_uv[b], np.asarray(ref["dq_uv"])[b]), b
        assert np.array_equal(lv, ref_lv[b]), f"levels differ, image {b}"

    # The hard part must actually be exercised: I4 macroblocks on band
    # boundary rows (their reconstruction context and above-right strips
    # arrive over the ICI halo).
    rows = is_i4.reshape(B, H // 16, W // 16)
    boundary = [r for r in range(H // 16) if r % (H // 16 // sp) == 0 and r]
    assert rows[:, boundary].sum() > 0, "no boundary-row I4 coverage"
