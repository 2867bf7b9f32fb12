"""Benchmark: end-to-end lossy encode throughput at Q75 (the reference's
headline metric, BASELINE.md: 32.9 Mpx/s on Apple M5 Max).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

The headline value is honest end-to-end pipelined throughput on a stream
of 1536x1024 images: host->device upload, device two-phase encode (mode
search + closed-loop wavefront), device->host packed-level fetch, and host
entropy coding, all overlapped. `detail` separates the device-compute
throughput from the link: in this harness the TPU is reached over a
tunnel whose bandwidth (~10-30 MB/s aggregate) is ~100x below a real PCIe
attach, so the end-to-end number is link-bound, not chip-bound.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image

BASELINE_MPX_S = 32.9  # reference lossy encode Q75 (BASELINE.md)


def _timed(f, mpx: float) -> float:
    t0 = time.perf_counter()
    f()
    return mpx / (time.perf_counter() - t0)


def _device_available() -> bool:
    """True only when a real accelerator answers. Probed in a subprocess
    with a timeout: a dead tunnel can hang jax init indefinitely, and a
    CPU-only jax should take the host fallback, not compile the device
    program on one CPU core."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=300, text=True)
        if r.returncode != 0 or not r.stdout.strip():
            return False
        return r.stdout.strip().splitlines()[-1] != "cpu"
    except Exception:
        return False


def main() -> None:
    src = Image.open("/root/reference/testdata/test_color.png").convert(
        "RGB").resize((1536, 1024))
    device = _device_available()
    if not device:
        # Host-only fallback (tunnel down): full-size host C++ path, with
        # same-host libwebp comparators so the number is interpretable.
        # The chip-side numbers measured when the tunnel was up are in
        # README.md ("Measured on 1536x1024": 215/160 Mpx/s device).
        import io

        import webp_tpu

        rgb = np.asarray(src)
        h, w = rgb.shape[:2]
        mpx = w * h / 1e6
        data = webp_tpu.encode(rgb, quality=75, method=4)
        assert len(data) > 0
        value = max(_timed(lambda: webp_tpu.encode(rgb, quality=75, method=4),
                           mpx) for _ in range(3))

        def _pil_enc():
            b = io.BytesIO()
            src.save(b, format="WEBP", quality=75, method=4)
            return b
        lw = _pil_enc()
        lw_speed = max(_timed(_pil_enc, mpx) for _ in range(3))
        print(json.dumps({
            "metric": "lossy_encode_q75_mpx_per_s",
            "value": round(value, 4),
            "unit": f"Mpx/s ({w}x{h}, q75 m4, host C++ path — no device "
                    "reachable this run; see README for chip numbers)",
            "vs_baseline": round(value / BASELINE_MPX_S, 4),
            "detail": {
                "speed_vs_libwebp_same_host": round(value / lw_speed, 2),
                "size_vs_libwebp_m4": round(len(data) / lw.tell(), 4),
            },
        }))
        return

    import jax

    from webp_tpu.lossy.device_encode import encode_lossy_stream
    from webp_tpu.ops.fastpath import fast_encode_fn

    rgb = np.asarray(src)
    h, w = rgb.shape[:2]
    mpx = w * h / 1e6
    variants = [rgb, rgb[::-1].copy(), rgb[:, ::-1].copy(),
                np.rot90(rgb, 2).copy()]
    imgs = ([v for v in variants]
            + [np.roll(v, 7, axis=1) for v in variants]) * 4  # 32 distinct-ish

    # Device-compute-only throughput first (input resident, scalar
    # readback), before any bulk transfers congest the tunnel. Batch 128:
    # the closed-loop wavefront is latency-bound over its scan steps and
    # the planar formulation fuses batch x mb_h into the lane axis, so
    # throughput keeps climbing with lane count until HBM pressure bites
    # (measured r5: 459 / 485 / 517 / 587 / 460 / 527 Mpx/s at
    # B=32/64/96/128/192/256 — 128*64 lanes is the sweet spot).
    DB = 128
    H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    fn = fast_encode_fn(W // 16, H // 16, 75, 4, 50, True)
    pad = np.zeros((DB, H, W, 3), np.uint8)
    reps = -(-DB // len(imgs))
    pad[:, :h, :w] = np.stack((imgs * reps)[:DB])
    # Planar upload ([3, H, W] per image): the channel-last de-interleave
    # was ~2/3 of the on-device import cost; production uploads planar.
    dev_in = jax.device_put(np.ascontiguousarray(pad.transpose(0, 3, 1, 2)))

    # rgbp_blob is the production program (the stream path below reuses
    # the same compile family). Sync by fetching its trailing tiny
    # esc_cnt output (block_until_ready returns early on this dev
    # harness's tunnel platform; a direct buffer fetch fences correctly).
    def sync(out):
        _ = np.asarray(out[-1])

    sync(fn.rgbp_blob(dev_in))  # + compile
    # Steady-state throughput: dispatch K batches back-to-back (JAX
    # dispatch is async) and sync once at the end, so the ~27 ms
    # tunnel round-trip latency of this dev harness amortizes the way a
    # production pipeline amortizes it.
    K = 4
    dev_mpx_s = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn.rgbp_blob(dev_in) for _ in range(K)]
        for o in outs:
            sync(o)
        dev_mpx_s = max(dev_mpx_s,
                        K * DB * mpx / (time.perf_counter() - t0))

    # Warmup / compile.
    out = encode_lossy_stream(imgs[:16], quality=75, batch=16)
    assert all(len(o) > 0 for o in out)

    # Host-side companion paths first (before the stream loops so leftover
    # transfer threads can't contaminate the single-core timings).
    import webp_tpu
    from webp_tpu.container import riff as r

    ll = webp_tpu.encode(rgb, lossless=True)
    ll_enc = max(_timed(lambda: webp_tpu.encode(rgb, lossless=True), mpx)
                 for _ in range(2))
    ll_dec = max(_timed(lambda: webp_tpu.decode(ll), mpx) for _ in range(2))
    # Same-host libwebp (Pillow) comparator: the M5-Max Go baseline is not
    # comparable for single-core host paths, libwebp on this machine is.
    import io

    def _libwebp_ll():
        b = io.BytesIO()
        src.save(b, format="WEBP", lossless=True, quality=75, method=4)
        return b
    lw_size = _libwebp_ll().tell()
    lw_enc = max(_timed(_libwebp_ll, mpx) for _ in range(2))
    _ll_buf = io.BytesIO(ll)

    def _pil_dec(buf):
        buf.seek(0)
        np.asarray(Image.open(buf).convert("RGB"))
    lw_ll_dec = max(_timed(lambda: _pil_dec(_ll_buf), mpx) for _ in range(3))
    lossy = r.assemble_riff([r.Chunk(r.VP8, out[0])])
    webp_tpu.decode(lossy)
    lossy_dec = max(_timed(lambda: webp_tpu.decode(lossy), mpx)
                    for _ in range(2))
    _lossy_buf = io.BytesIO(lossy)
    lw_lossy_dec = max(_timed(lambda: _pil_dec(_lossy_buf), mpx)
                       for _ in range(3))
    # Core native decode (tokens + recon + loop filter, no RGB convert) —
    # the number comparable to the reference's 167 Mpx/s YUV decode.
    from webp_tpu.lossy.decode import decode_vp8_yuv

    decode_vp8_yuv(out[0])
    lossy_dec_yuv = max(_timed(lambda: decode_vp8_yuv(out[0]), mpx)
                        for _ in range(3))

    # End-to-end pipelined stream (the honest headline).
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = encode_lossy_stream(imgs, quality=75, batch=16)
        times.append(time.perf_counter() - t0)
    assert len(res) == len(imgs) and all(len(o) > 0 for o in res)
    value = len(imgs) * mpx / min(times)

    print(json.dumps({
        "metric": "lossy_encode_q75_mpx_per_s",
        "value": round(value, 4),
        "unit": f"Mpx/s ({w}x{h} stream of {len(imgs)}, q75, pipelined "
                f"end-to-end incl. tunnel transfers, 1 chip)",
        "vs_baseline": round(value / BASELINE_MPX_S, 4),
        "detail": {
            "device_compute_mpx_per_s": round(dev_mpx_s, 2),
            "device_compute_vs_baseline": round(dev_mpx_s / BASELINE_MPX_S, 3),
            "lossless_encode_mpx_per_s": round(ll_enc, 2),
            "lossless_speed_vs_libwebp_same_host": round(ll_enc / lw_enc, 2),
            "lossless_size_vs_libwebp_m4": round(len(ll) / lw_size, 4),
            "lossless_decode_mpx_per_s": round(ll_dec, 2),
            "lossless_decode_vs_libwebp_same_host": round(ll_dec / lw_ll_dec,
                                                          2),
            "lossy_decode_mpx_per_s": round(lossy_dec, 2),
            "lossy_decode_vs_libwebp_same_host": round(
                lossy_dec / lw_lossy_dec, 2),
            "lossy_decode_yuv_mpx_per_s": round(lossy_dec_yuv, 2),
            "note": "end-to-end is bound by the dev-harness tunnel "
                    "(~10-30 MB/s to the chip, ~100x below PCIe); "
                    "device_compute is the chip-side encode throughput; "
                    "host-side paths run on this harness's single CPU core "
                    "(reference numbers use all M5 Max cores)",
        },
    }))


if __name__ == "__main__":
    main()
