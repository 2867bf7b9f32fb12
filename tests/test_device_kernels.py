"""Compiled-kernel device parity (model: the reference's SIMD-vs-Go
conformance, /root/reference/internal/dsp/simd_test.go:8-40).

The Pallas kernel tests elsewhere run in interpret mode; nothing there
would catch a Mosaic miscompile or a silently-slower kernel shipping
default-on (that is exactly how round 4's P2 regression landed). These
tests run the REAL compiled kernels on the chip in subprocesses (the
suite itself is pinned to the CPU backend by conftest.py) and assert the
produced bitstreams are byte-identical to the jnp fallback's.

Skipped when no TPU answers (CI / CPU-only environments).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import json, sys
sys.path.insert(0, %r)
try:
    import jax
    print(json.dumps({"platform": jax.devices()[0].platform}))
except Exception as e:
    print(json.dumps({"platform": "none"}))
""" % (REPO,)

_RUN = """
import json, sys, time
sys.path.insert(0, %r)
import numpy as np
from PIL import Image
import webp_tpu

rgb = np.asarray(Image.open(
    "/root/reference/testdata/test_color.png").convert("RGB")
    .resize((256, 192)))
t0 = time.perf_counter()
blob = webp_tpu.encode(rgb, quality=75, method=4, backend="device")
warm = time.perf_counter() - t0
t0 = time.perf_counter()
blob2 = webp_tpu.encode(rgb, quality=75, method=4, backend="device")
steady = time.perf_counter() - t0
assert blob == blob2, "device encode is nondeterministic"
print(json.dumps({"n": len(blob), "sha": __import__("hashlib")
                  .sha256(blob).hexdigest(), "steady_s": steady}))
""" % (REPO,)


def _clean_env():
    env = dict(os.environ)
    # Undo the suite's CPU pinning so the subprocess reaches the chip.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "host_platform_device_count" not in f)
    return env


def _tpu_available():
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE],
                           capture_output=True, text=True, timeout=300,
                           env=_clean_env())
        out = r.stdout.strip().splitlines()
        return out and json.loads(out[-1]).get("platform") == "tpu"
    except Exception:
        return False


def _run_device(extra_env):
    env = _clean_env()
    env.update(extra_env)
    r = subprocess.run([sys.executable, "-c", _RUN], capture_output=True,
                       text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-4000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(not _tpu_available(), reason="no TPU reachable")
def test_compiled_kernels_bit_identical_to_fallback():
    """Default-on Pallas kernels (P1 mode search, segment alphas, I4
    search), compiled by Mosaic on the chip, must produce the same
    bitstream as the jnp fallback compiled by XLA."""
    on = _run_device({})
    off = _run_device({"WEBPTPU_NO_PALLAS": "1"})
    assert on["sha"] == off["sha"], (
        f"kernels-on bitstream differs from fallback "
        f"({on['n']}B vs {off['n']}B)")


@pytest.mark.slow
@pytest.mark.skipif(not _tpu_available(), reason="no TPU reachable")
def test_compiled_kernels_not_slower_than_fallback():
    """A default-on kernel must not lose to its own fallback (the round-4
    P2 kernel shipped as a 23% regression; this makes that structurally
    unrepeatable). Steady-state single-image encode at 256x192; 1.3x
    headroom for timing noise on the shared dev harness."""
    on = _run_device({})
    off = _run_device({"WEBPTPU_NO_PALLAS": "1"})
    assert on["steady_s"] < off["steady_s"] * 1.3, (
        f"kernels-on {on['steady_s']:.3f}s vs fallback "
        f"{off['steady_s']:.3f}s")
