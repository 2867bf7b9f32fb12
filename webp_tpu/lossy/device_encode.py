"""Device-accelerated lossy encode: TPU wavefront compute + native entropy.

The split mirrors the reference's Phase A / Phase B pipeline
(encode_parallel.go:168-246): the TPU runs the wavefront mode decision,
transforms, quantization and reconstruction (webp_tpu.ops.wavefront); the
host runs probability optimization and boolean entropy coding (C++ native
fast path when built).
"""

from __future__ import annotations

import functools

import numpy as np

from . import tables as T
from .encode import VP8Encoder, LossyConfig


@functools.lru_cache(maxsize=16)
def _get_fn(mb_w: int, mb_h: int, quality: int):
    from ..ops.wavefront import wavefront_encode_fn

    return wavefront_encode_fn(mb_w, mb_h, quality)


class DeviceVP8Encoder(VP8Encoder):
    """VP8Encoder whose MB loop runs on the device (I16+UV wavefront).

    The wavefront currently quantizes with segment-0 parameters and no UV
    deltas, so the header plan is pinned to a single plain segment
    (multi-segment device support: later round).
    """

    rgb_input = None  # optional uint8 [H, W, 3] (padded); fuses YUV on device

    def __init__(self, y, u, v, width, height, cfg):
        import dataclasses

        cfg = dataclasses.replace(cfg, segments=1, sns_strength=0)
        super().__init__(y, u, v, width, height, cfg)

    def encode(self) -> bytes:
        import jax

        self.proba = T.COEFFS_PROBA0.copy()
        fn = _get_fn(self.mb_w, self.mb_h, self.cfg.quality)
        if self.rgb_input is not None:
            lv, y2, modes, uvm, skip = fn.rgb(self.rgb_input)
        else:
            lv, y2, modes, uvm, skip = fn(self.srcY, self.srcU, self.srcV)
        jax.block_until_ready(lv)
        mb_h, mb_w = self.mb_h, self.mb_w
        self.levels = np.asarray(lv).reshape(mb_h, mb_w, 24, 16)
        self.y2_levels = np.asarray(y2).reshape(mb_h, mb_w, 16)
        self.imodes[..., 0] = np.asarray(modes).reshape(mb_h, mb_w)
        self.uvmode = np.asarray(uvm).reshape(mb_h, mb_w)
        self.skip = np.asarray(skip).reshape(mb_h, mb_w).copy()
        self.is_i4[:] = False
        return self._finish_bitstream()

    def _finish_bitstream(self) -> bytes:
        total = self.mb_h * self.mb_w
        self.num_skip = int(self.skip.sum())
        self.skip_proba = max(1, min(255, (total - self.num_skip) * 255 // total)) \
            if self.num_skip > 0 else 0
        self.use_skip = self.num_skip > 0
        if not self.use_skip:
            self.skip[:] = False

        self._optimize_probas()
        part0 = self._emit_partition0()
        parts = [self._emit_tokens(i) for i in range(self.num_parts)]

        tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
        out = bytearray([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        out += bytes([0x9D, 0x01, 0x2A])
        out += int(self.width & 0x3FFF).to_bytes(2, "little")
        out += int(self.height & 0x3FFF).to_bytes(2, "little")
        out += part0
        for p in parts[:-1]:
            out += len(p).to_bytes(3, "little")
        for p in parts:
            out += p
        return bytes(out)


def encode_lossy_batch(rgbs, quality: int = 75, partitions: int = 0,
                       filter_strength: int = 60, num_threads: int = 8,
                       true_width: int = None, true_height: int = None):
    """Batched device encode: one vmapped wavefront launch over a stack of
    same-sized images, then parallel host entropy coding (the native C++
    calls release the GIL). This is the TPU batching superpower the
    single-image reference cannot express (SURVEY.md §7.9).

    rgbs: uint8 [B, H, W, 3] with H, W multiples of 16 (pre-padded).
    Returns a list of VP8 bitstreams.
    """
    import concurrent.futures

    import jax

    B, H, W, _ = rgbs.shape
    mb_w, mb_h = W // 16, H // 16
    fn = _get_fn(mb_w, mb_h, quality)
    lv, y2, modes, uvm, skip = fn.rgb_batch(rgbs)
    jax.block_until_ready(lv)
    lv = np.asarray(lv)
    y2 = np.asarray(y2)
    modes = np.asarray(modes)
    uvm = np.asarray(uvm)
    skip = np.asarray(skip)

    dummyY = np.zeros((H, W), np.uint8)
    dummyU = np.zeros((H // 2, W // 2), np.uint8)

    tw = true_width or W
    th = true_height or H

    def emit(i):
        enc = DeviceVP8Encoder(dummyY, dummyU, dummyU, tw, th,
                               LossyConfig(quality=quality,
                                           partitions=partitions,
                                           filter_strength=filter_strength))
        enc.proba = T.COEFFS_PROBA0.copy()
        enc.levels = lv[i].reshape(mb_h, mb_w, 24, 16)
        enc.y2_levels = y2[i].reshape(mb_h, mb_w, 16)
        enc.imodes[..., 0] = modes[i].reshape(mb_h, mb_w)
        enc.uvmode = uvm[i].reshape(mb_h, mb_w)
        enc.skip = skip[i].reshape(mb_h, mb_w).copy()
        enc.is_i4[:] = False
        return enc._finish_bitstream()

    with concurrent.futures.ThreadPoolExecutor(max_workers=num_threads) as ex:
        return list(ex.map(emit, range(B)))
