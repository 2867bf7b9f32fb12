"""Batched device entropy-coder experiment (SURVEY.md §7 design stance
(a); VERDICT r4 task #6): can the TPU run the VP8 boolean arithmetic
coder's bit-serial recurrence fast enough to beat shipping levels to the
host C++ coder?

The coder state (range, value, pending-bit count) is a strict serial
recurrence over the bit stream — one renormalizing step per bit. The only
TPU-shaped formulation is a `lax.scan` over bit positions with the batch
(images × token partitions) riding the lane axis. This prototype runs the
REAL VP8 renorm arithmetic (reader_bool.go:100 / our bitio/bool.py
BoolWriter.put_bit, minus the carry-run byte resolution, which only makes
it cheaper here — so the measured number is an UPPER bound on a correct
coder) and measures steady-state bits/s on the chip.

Outcome recorded in README.md §"Device entropy coding: measured no-go".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

# Log2 renorm shift table (reader_bool.go kVP8Log2Range analog): shift
# needed to bring range back above 128.
_SHIFT = np.zeros(256, np.int32)
for r in range(1, 256):
    s = 0
    while (r << s) < 128:
        s += 1
    _SHIFT[r] = s
SHIFT = jnp.asarray(_SHIFT)


def coder_step(carry, inputs):
    rng, val, nbits, out_acc = carry
    bit, proba = inputs
    split = (rng * proba) >> 8
    # Branchless arithmetic-coder update.
    val = jnp.where(bit != 0, val + split + 1, val)
    rng = jnp.where(bit != 0, rng - split - 1, split)
    # Renormalize: shift range to [128, 255]; matching bits leave the
    # register (byte resolution + carry runs are host-side bookkeeping
    # and would only add work — omitted, making this an optimistic bound).
    s = SHIFT[rng]
    rng = (rng << s) | ((1 << s) - 1)
    val = (val << s) & 0x7FFFFFF  # keep the live window; bytes above
    # this point are resolved host-side in a real coder
    nbits = nbits + s
    out_acc = out_acc ^ (val * 40503 % (1 << 29))  # keep val live
    return (rng, val, nbits, out_acc), None


def main():
    rng0 = jnp.full((LANES,), 254, jnp.int32)
    val0 = jnp.zeros((LANES,), jnp.int32)
    nb0 = jnp.zeros((LANES,), jnp.int32)
    acc0 = jnp.zeros((LANES,), jnp.int32)
    r = np.random.default_rng(0)
    bits = jnp.asarray(r.integers(0, 2, (T, LANES), np.int32))
    probas = jnp.asarray(r.integers(1, 255, (T, LANES), np.int32))

    @jax.jit
    def run(b, p):
        c, _ = jax.lax.scan(coder_step, (rng0, val0, nb0, acc0), (b, p))
        return c

    out = run(bits, probas)
    _ = np.asarray(out[0])
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(bits, probas)
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        best = max(best, T * LANES / dt)
    print(f"lanes={LANES} steps={T}: {best/1e6:.1f} Mbit/s aggregate, "
          f"{best/LANES/1e3:.1f} kbit/s per lane, "
          f"{T/ (T*LANES/best) * LANES / T:.0f}", flush=True)
    # A 1536x1024 q75 frame is ~1.7 Mbit of boolean-coded tokens split
    # over <=8 partitions; express the implied frames/s at this rate.
    frame_bits = 1.7e6
    print(f"implied lossy-frame entropy throughput at B={LANES//8} images"
          f" x 8 partitions: {best/frame_bits:.1f} frames/s "
          f"({best/frame_bits*1.573:.1f} Mpx/s)", flush=True)


if __name__ == "__main__":
    main()
