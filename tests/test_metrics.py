"""Device metric kernels (ops/metrics.py) vs independent numpy oracles.

The TDisto oracle is a direct port of the reference tTransform /
tDisto4x4Go (/root/reference/internal/dsp/ssim.go:265-335, itself
matching libwebp's C TTransform); SSIM is cross-checked against a
direct per-window evaluation with the hat kernel.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from webp_tpu.ops import metrics as M


def _ttransform_np(blk, w):
    """blk [4,4] uint8, w [4,4] -> weighted Hadamard abs sum (oracle)."""
    tmp = np.zeros((4, 4), np.int64)
    for i in range(4):
        r = blk[i].astype(np.int64)
        a0, a1 = r[0] + r[2], r[1] + r[3]
        a2, a3 = r[1] - r[3], r[0] - r[2]
        tmp[i] = [a0 + a1, a3 + a2, a3 - a2, a0 - a1]
    total = 0
    for i in range(4):
        c = tmp[:, i]
        a0, a1 = c[0] + c[2], c[1] + c[3]
        a2, a3 = c[1] - c[3], c[0] - c[2]
        b = np.array([a0 + a1, a3 + a2, a3 - a2, a0 - a1])
        total += int(np.sum(w[:, i].astype(np.int64) * np.abs(b)))
    return total


def _tdisto_np(a, b):
    w = np.asarray(M.WEIGHT_Y)
    return abs(_ttransform_np(b, w) - _ttransform_np(a, w)) >> 5


def test_tdisto4x4_matches_reference_oracle():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 4, 4), np.uint8)
    b = rng.integers(0, 256, (64, 4, 4), np.uint8)
    got = np.asarray(M.tdisto4x4(jnp.asarray(a), jnp.asarray(b)))
    ref = np.asarray([_tdisto_np(a[i], b[i]) for i in range(64)])
    np.testing.assert_array_equal(got, ref)


def test_tdisto_zero_on_identical():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (8, 4, 4), np.uint8)
    assert np.asarray(M.tdisto4x4(jnp.asarray(a), jnp.asarray(a))).max() == 0


def test_sse_psnr():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (32, 32), np.uint8)
    b = a.copy()
    b[0, 0] += 10
    s = int(np.asarray(M.sse(jnp.asarray(a), jnp.asarray(b))))
    assert s == 100
    p = float(np.asarray(M.psnr_from_sse(jnp.float32(s), 32 * 32)))
    assert abs(p - 10 * np.log10(255 ** 2 / (100 / 1024))) < 1e-3
    assert float(np.asarray(M.psnr_from_sse(jnp.float32(0), 1024))) == 99.0


def _ssim_window_np(a, b):
    k = np.array([1, 2, 3, 4, 3, 2, 1], np.float64)
    kern = np.outer(k, k)
    N = kern.sum()
    w2 = N * N
    C1, C2 = 20.0 * w2, 60.0 * w2
    xm = (kern * a).sum()
    ym = (kern * b).sum()
    xxm = (kern * a * a).sum()
    yym = (kern * b * b).sum()
    xym = (kern * a * b).sum()
    sxy = xym * N - xm * ym
    sxx = xxm * N - xm * xm
    syy = yym * N - ym * ym
    return ((2 * xm * ym + C1) * (2 * max(sxy, 0.0) + C2)
            / ((xm * xm + ym * ym + C1) * (sxx + syy + C2)))


def test_ssim_plane_matches_windowed_oracle():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (16, 16)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 8, a.shape), 0, 255).round()
    got = float(np.asarray(M.ssim_plane(jnp.asarray(a), jnp.asarray(b))))
    wins = [_ssim_window_np(a[y:y + 7, x:x + 7], b[y:y + 7, x:x + 7])
            for y in range(10) for x in range(10)]
    # jax runs f32 unless x64 is enabled; oracle is true f64
    assert abs(got - np.mean(wins)) < 1e-5


def test_ssim_bounds():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (24, 24)).astype(np.float64)
    assert float(np.asarray(M.ssim_plane(jnp.asarray(a),
                                         jnp.asarray(a)))) == pytest.approx(1.0)
    inv = 255.0 - a
    assert float(np.asarray(M.ssim_plane(jnp.asarray(a),
                                         jnp.asarray(inv)))) < 0.5
