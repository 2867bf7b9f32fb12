"""Device VP8 decode driver: native token parse on host, reconstruction +
loop filter + upsample on chip (ops/decode.py).

The split mirrors the encoder's phase A/B inversion of the reference's
design (SURVEY.md §7): entropy decoding is bit-serial and stays on the
host CPU (native vp8_dec.cc TokenPass); every pixel-shaped stage runs as
batched device tensor work. The stream path overlaps the host parse of
batch i+1 with the device reconstruction of batch i.

Reference hot loops replaced on-device: internal/lossy/decode_frame.go:83
(reconstructRow), :293 (doFilter), internal/dsp/upsample.go:45.
"""

from __future__ import annotations

import concurrent.futures

import numpy as np

from ..native import api as native


def _parse_inputs(data: bytes):
    P = native.vp8_parse(data)
    if P is None:
        return None
    tab = P["finfo"][1:].reshape(4, 2, 4)
    fi = tab[P["segment"] & 3, P["is_i4"]]
    inner = P["is_i4"].astype(bool) | P["has_nz"].astype(bool)
    return (P, fi, inner)


def _run_device(parsed, upsample: bool):
    from ..ops.decode import decode_fn

    P, fi, inner = parsed
    mbw, mbh, w, h = P["dims"]
    fn = decode_fn(mbw, mbh, int(P["finfo"][0]), upsample=upsample,
                   width=w, height=h)
    return fn(P["coeffs"][None], P["is_i4"][None].astype(bool),
              P["imodes"][None], P["uvmode"][None],
              fi[None, :, 0].astype(np.int32),
              fi[None, :, 1].astype(np.int32),
              fi[None, :, 2].astype(np.int32), inner[None])


def decode_vp8_yuv_device(data: bytes):
    """Single-image device decode -> cropped (Y, U, V) planes, or None
    when the native parser is unavailable."""
    parsed = _parse_inputs(data)
    if parsed is None:
        return None
    out = _run_device(parsed, upsample=False)
    _, _, w, h = parsed[0]["dims"]
    Y, U, V = (np.asarray(o[0]) for o in out)
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return Y[:h, :w], U[:ch, :cw], V[:ch, :cw]


def decode_vp8_rgb_device(data: bytes):
    """Single-image device decode straight to RGB uint8 [h, w, 3]
    (device fancy upsample + YUV->RGB), or None when unavailable."""
    parsed = _parse_inputs(data)
    if parsed is None:
        return None
    out = _run_device(parsed, upsample=True)
    return np.asarray(out[0])


def decode_lossy_stream_device(datas, upsample: bool = True):
    """Pipelined device decode of many same-sized VP8 bitstreams: host
    token parse of image i+1 overlaps device reconstruction of image i
    (the decode-side analog of encode_lossy_stream's P2 overlap).
    Returns a list of RGB arrays (or (Y, U, V) tuples)."""
    results = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=2) as ex:
        fut = ex.submit(_parse_inputs, datas[0]) if datas else None
        inflight = None
        for i in range(len(datas)):
            parsed = fut.result()
            fut = ex.submit(_parse_inputs, datas[i + 1]) \
                if i + 1 < len(datas) else None
            if parsed is None:
                raise RuntimeError("native parser unavailable")
            out = _run_device(parsed, upsample=upsample)
            if inflight is not None:
                results.append(_fetch_one(*inflight, upsample))
            inflight = (out, parsed[0]["dims"])
        if inflight is not None:
            results.append(_fetch_one(*inflight, upsample))
    return results


def _fetch_one(out, dims, upsample):
    _, _, w, h = dims
    if upsample:
        return np.asarray(out[0])
    Y, U, V = (np.asarray(o[0]) for o in out)
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return Y[:h, :w], U[:ch, :cw], V[:ch, :cw]
