"""Device-accelerated lossy encode: TPU two-phase compute + native entropy.

The split mirrors the reference's Phase A / Phase B pipeline
(encode_parallel.go:168-246): the TPU runs mode decision, transforms,
quantization and closed-loop reconstruction (webp_tpu.ops.fastpath — a
fully-parallel RD search plus a light skew-1 wavefront); the host runs
probability optimization and boolean entropy coding (C++ native fast path
when built). Levels cross the link nibble-packed because host<->device
bandwidth, not chip FLOPs, is the scarce resource.
"""

from __future__ import annotations

import concurrent.futures
import functools

import numpy as np

from . import tables as T
from .encode import VP8Encoder, LossyConfig


@functools.lru_cache(maxsize=16)
def _get_fn(mb_w: int, mb_h: int, quality: int):
    """Exact-parity wavefront (kept for differential tests)."""
    from ..ops.wavefront import wavefront_encode_fn

    return wavefront_encode_fn(mb_w, mb_h, quality)


def _fetch(arrs: dict, pool=None) -> dict:
    """Device->host fetch, one parallel stream per output array.

    The tunnel link caps out per-stream, so concurrent whole-array fetches
    multiply effective bandwidth. Never slice device arrays here: a slice
    is a device computation and serializes the link.
    """
    own_pool = pool is None
    ex = pool or concurrent.futures.ThreadPoolExecutor(max_workers=8)
    try:
        if not isinstance(arrs, dict):
            return list(ex.map(np.asarray, arrs))
        keys = list(arrs.keys())
        vals = list(ex.map(np.asarray, (arrs[k] for k in keys)))
    finally:
        if own_pool:
            ex.shutdown(wait=False)
    return dict(zip(keys, vals))


def _finish_one(out_i: dict, mb_w: int, mb_h: int, width: int, height: int,
                cfg: LossyConfig) -> bytes:
    """Host tail for one image: unpack levels, entropy-code, frame-assemble."""
    from ..ops.fastpath import unpack_levels

    n_mb = mb_w * mb_h
    lv24 = unpack_levels(out_i["packed"], out_i["esc_idx"], out_i["esc_val"],
                         out_i["esc_cnt"], n_mb)
    dummyY = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    dummyU = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    enc = DeviceVP8Encoder(dummyY, dummyU, dummyU, width, height, cfg)
    enc.proba = T.COEFFS_PROBA0.copy()
    enc.levels = lv24.astype(np.int32).reshape(mb_h, mb_w, 24, 16)
    enc.y2_levels = out_i["y2"].astype(np.int32).reshape(mb_h, mb_w, 16)
    enc.imodes = out_i["imodes"].reshape(mb_h, mb_w, 16).copy()
    enc.uvmode = out_i["uvmodes"].reshape(mb_h, mb_w)
    enc.skip = out_i["skip"].reshape(mb_h, mb_w).copy()
    enc.is_i4 = out_i["is_i4"].reshape(mb_h, mb_w).copy()
    enc.apply_device_plan(out_i["seg_map"], out_i["seg_q"],
                          out_i["seg_beta"], dq_uv=out_i.get("dq_uv"))
    return enc._finish_bitstream()


class DeviceVP8Encoder(VP8Encoder):
    """VP8Encoder whose MB loop runs on the device (two-phase fast path).

    Segmentation/SNS runs on the device too (fastpath phase 0); the host
    plan is pinned trivial at init and replaced with the device plan after
    the launch (UV quant deltas stay 0 on this path).
    """

    rgb_input = None  # optional uint8 [H, W, 3] (padded); fuses YUV on device

    def __init__(self, y, u, v, width, height, cfg):
        import dataclasses

        self.dev_segments = max(1, min(4, cfg.segments))
        self.dev_sns = max(0, cfg.sns_strength)
        cfg = dataclasses.replace(cfg, segments=1, sns_strength=0)
        super().__init__(y, u, v, width, height, cfg)

    def apply_device_plan(self, seg_map, seg_q, seg_beta,
                          dq_uv=None) -> None:
        """Installs the device-computed segmentation into the header plan.
        dq_uv: optional (dq_uv_dc, dq_uv_ac) the device quantized chroma
        with — written into the frame header (encode.py:809)."""
        if self.dev_segments <= 1 or self.mb_h * self.mb_w < 4:
            return
        from .analysis import finalize_device_plan

        plan = finalize_device_plan(seg_map, seg_q, seg_beta,
                                    self.cfg.filter_strength,
                                    self.cfg.filter_sharpness)
        if dq_uv is not None:
            plan.dq_uv_dc = int(dq_uv[0])
            plan.dq_uv_ac = int(dq_uv[1])
        self.plan = plan
        self.num_segments = plan.num_segments
        self.segment_map = plan.segment_map.reshape(self.mb_h, self.mb_w)
        self.base_q = plan.quant[0]
        if self.cfg.filter_strength > 0:
            self.filter_level = plan.fstrength[0]

    def encode(self) -> bytes:
        from ..ops.fastpath import fast_encode_fn, unpack_levels

        use_i4 = bool(self.cfg.i4_blocks) and self.cfg.method >= 3
        sharp = bool(getattr(self.cfg, "sharp_yuv", False)) and \
            self.rgb_input is not None
        # method >= 5: skew-2 closed loop — full I4 mode set on the
        # rightmost subblock column at ~2x scan steps.
        sk = 2 if self.cfg.method >= 5 and use_i4 else 1
        fn = fast_encode_fn(self.mb_w, self.mb_h, self.cfg.quality,
                            self.dev_segments, self.dev_sns, use_i4,
                            sharp_yuv=sharp, sk=sk,
                            trellis=self.cfg.method >= 5 and use_i4,
                            i4_mode_search=self.cfg.method >= 6 and use_i4)
        from ..ops.fastpath import unpack_output_blob

        if self.rgb_input is not None:
            out = fn.rgb_blob(self.rgb_input[None])
        else:
            out = fn.blob(self.srcY[None], self.srcU[None], self.srcV[None])
        host = unpack_output_blob(_fetch(out), fn.blob_spec)
        cnt = int(host["esc_cnt"][0])
        if cnt > fn.esc_cap:  # pathological content: exact host fallback
            srcY, srcU, srcV = self.srcY, self.srcU, self.srcV
            if sharp:
                # self.src* came from plain rgb_to_yuv420 (sharp runs
                # on-chip); recompute with the host sharp converter so the
                # fallback honours use_sharp_yuv.
                from ..sharpyuv.convert import sharp_rgb_to_yuv420
                srcY, srcU, srcV = sharp_rgb_to_yuv420(self.rgb_input)
            return VP8Encoder(srcY, srcU, srcV, self.width,
                              self.height, self.cfg).encode()
        n_mb = self.mb_h * self.mb_w
        lv24 = unpack_levels(host["packed"][0], host["esc_idx"][0],
                             host["esc_val"][0], host["esc_cnt"][0], n_mb)
        self.proba = T.COEFFS_PROBA0.copy()
        self.levels = lv24.astype(np.int32).reshape(
            self.mb_h, self.mb_w, 24, 16)
        self.y2_levels = host["y2"][0].astype(np.int32).reshape(
            self.mb_h, self.mb_w, 16)
        self.imodes = host["imodes"][0].reshape(
            self.mb_h, self.mb_w, 16).copy()
        self.uvmode = host["uvmodes"][0].reshape(self.mb_h, self.mb_w)
        self.skip = host["skip"][0].reshape(self.mb_h, self.mb_w).copy()
        self.is_i4 = host["is_i4"][0].reshape(
            self.mb_h, self.mb_w).copy()
        self.apply_device_plan(host["seg_map"][0], host["seg_q"][0],
                               host["seg_beta"][0],
                               dq_uv=host.get("dq_uv", [[0, 0]])[0])
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
        parts = [self._emit_tokens(i) for i in range(self.num_parts)]
        if self.cfg.autofilter:
            _finish_autofilter(self, parts)
        part0 = self._emit_partition0()
        self.stats_part0 = len(part0)
        self.stats_parts = [len(p) for p in parts]
        return self._assemble_vp8(part0, parts)

    def _assemble_vp8(self, part0, parts) -> bytes:
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


def _finish_autofilter(enc, parts) -> None:
    """Device-path autofilter: the device loop never materializes a host
    reconstruction, so probe-decode the bitstream with the in-loop filter
    disabled to recover the unfiltered recon, then run the host
    filter-strength search on it (VP8Encoder.autofilter_search)."""
    from .decode import decode_vp8_yuv

    saved = (list(enc.plan.fstrength), enc.filter_level)
    for i in range(4):
        enc.plan.fstrength[i] = 0
    enc.filter_level = 0
    try:
        probe = enc._assemble_vp8(enc._emit_partition0(), parts)
        Y, _, _ = decode_vp8_yuv(probe)
        recY = np.zeros((enc.mb_h * 16, enc.mb_w * 16), np.uint8)
        recY[:Y.shape[0], :Y.shape[1]] = Y
        if Y.shape[1] < recY.shape[1]:
            recY[:Y.shape[0], Y.shape[1]:] = Y[:, -1:]
        if Y.shape[0] < recY.shape[0]:
            recY[Y.shape[0]:] = recY[Y.shape[0] - 1]
        enc.recY = recY
        enc.autofilter_search()
    except Exception:
        enc.plan.fstrength[:] = saved[0]
        enc.filter_level = saved[1]


def _fallback_planes(rgb, fn):
    """YUV planes for the exact-host escape-overflow fallback, honouring
    the device fn's sharp_yuv setting (the device computes sharp on-chip,
    so the host copy must re-derive it)."""
    if getattr(fn, "sharp_yuv", False):
        from ..sharpyuv.convert import sharp_rgb_to_yuv420

        return sharp_rgb_to_yuv420(rgb)
    from ..encoder import rgb_to_yuv420

    return rgb_to_yuv420(rgb)


def encode_lossy_batch(rgbs, quality: int = 75, partitions: int = 0,
                       filter_strength: int = 60, num_threads: int = 8,
                       true_width: int = None, true_height: int = None,
                       device_out=None, segments: int = 4,
                       sns_strength: int = 50, sharp_yuv: bool = False):
    """Batched device encode: one vmapped two-phase launch over a stack of
    same-sized images, then parallel host entropy coding (the native C++
    calls release the GIL). This is the TPU batching superpower the
    single-image reference cannot express (SURVEY.md §7.9).

    rgbs: uint8 [B, H, W, 3] with H, W multiples of 16 (pre-padded).
    device_out: optional pre-launched fn.rgb(rgbs) result (for pipelining).
    Returns a list of VP8 bitstreams.
    """
    from ..ops.fastpath import fast_encode_fn, unpack_output_blob

    B, H, W, _ = rgbs.shape
    mb_w, mb_h = W // 16, H // 16
    fn = fast_encode_fn(mb_w, mb_h, quality, segments, sns_strength,
                        sharp_yuv=sharp_yuv)

    tw = true_width or W
    th = true_height or H
    cfg = LossyConfig(quality=quality, partitions=partitions,
                      filter_strength=filter_strength, segments=segments,
                      sns_strength=sns_strength)

    with concurrent.futures.ThreadPoolExecutor(max_workers=num_threads) as ex:
        if device_out is not None:  # legacy pre-launched fn.rgb() dict
            host = _fetch(device_out, pool=ex)
        else:
            host = unpack_output_blob(_fetch(fn.rgb_blob(rgbs), pool=ex),
                                      fn.blob_spec)

        def emit(i):
            if int(host["esc_cnt"][i]) > fn.esc_cap:
                Y, U, V = _fallback_planes(np.asarray(rgbs[i]), fn)
                return VP8Encoder(Y, U, V, tw, th, cfg).encode()
            return _finish_one({k: v[i] for k, v in host.items()},
                               mb_w, mb_h, tw, th, cfg)

        return list(ex.map(emit, range(B)))


def encode_lossy_stream(images, quality: int = 75, batch: int = 8,
                        partitions: int = 0, filter_strength: int = 60,
                        num_threads: int = 12, host_yuv: bool = None,
                        segments: int = 4, sns_strength: int = 50,
                        sharp_yuv: bool = False):
    """Pipelined high-throughput encode of a stream of same-sized images.

    Three overlapped stages, mirroring the reference's Phase A/B overlap
    (encode_parallel.go:238-246) but across the host<->device link:
      upload(i+1)  ||  device compute(i)  ||  fetch+entropy(i-1)
    Uploads and fetches use one stream per image/array because the link
    caps out per-stream. Color conversion runs on the host when the native
    C++ importer is built (bit-exact, ~6 ms/Mpx, halves upload bytes:
    YUV420 is 1.5 B/px vs RGB's 3); otherwise fused on device (host numpy
    YUV is GIL-bound and slower than the upload it saves). Device dispatch
    is async, so the Python loop never blocks on compute — only on the
    result fetch of the *previous* batch.

    images: list of uint8 [h, w, 3] arrays (same size). Returns VP8
    bitstream list in order.
    """
    import jax

    from ..ops.fastpath import fast_encode_fn

    if not images:
        return []
    # Multi-chip: route through the exact band-pipelined mesh path (output
    # is bit-identical to this single-chip path) whenever more than one
    # device is visible and the geometry shards evenly.
    n_dev = len(jax.devices())
    if n_dev > 1 and not sharp_yuv:
        h0 = images[0].shape[0]
        if h0 % 16 == 0 and (h0 // 16) % n_dev == 0:
            from ..parallel.exact import encode_lossy_mesh

            out = []
            for i in range(0, len(images), batch):
                out.extend(encode_lossy_mesh(
                    images[i:i + batch], quality=quality, segments=segments,
                    sns_strength=sns_strength))
            return out
    if sharp_yuv:
        host_yuv = False  # refinement runs on device from RGB
    elif host_yuv is None:
        from ..native import api as native_api

        host_yuv = (native_api.get() is not None
                    and hasattr(native_api.get(), "yuv_import"))
    h, w = images[0].shape[:2]
    H, W = (h + 15) // 16 * 16, (w + 15) // 16 * 16
    mb_w, mb_h = W // 16, H // 16
    fn = fast_encode_fn(mb_w, mb_h, quality, segments, sns_strength,
                        sharp_yuv=sharp_yuv)
    cfg = LossyConfig(quality=quality, partitions=partitions,
                      filter_strength=filter_strength, segments=segments,
                      sns_strength=sns_strength)

    ex = concurrent.futures.ThreadPoolExecutor(max_workers=num_threads)

    def prep_one(img):
        """Pad + (optionally) convert to YUV on host; returns host arrays."""
        if img.shape[0] != H or img.shape[1] != W:
            pad = np.empty((H, W, 3), np.uint8)
            pad[:h, :w] = img[..., :3]
            if H > h:
                pad[h:, :w] = img[h - 1:h, :, :3]
            if W > w:
                pad[:, w:] = pad[:, w - 1:w]
            img = pad
        else:
            img = img[..., :3]
        if not host_yuv:
            return (img,)
        from ..encoder import rgb_to_yuv420

        return rgb_to_yuv420(img)

    def upload(imgs):
        """Threaded host prep + one H2D stream per image (or per plane)."""
        planes = list(ex.map(prep_one, imgs))
        if host_yuv:
            stacks = [np.stack(p) for p in zip(*planes)]
            return list(ex.map(jax.device_put, stacks))
        return list(ex.map(jax.device_put, (p[0] for p in planes)))

    def launch(devs):
        import jax.numpy as jnp

        if host_yuv:
            return fn.blob(*devs)
        return fn.rgb_blob(jnp.stack(devs))

    chunks = [images[i:i + batch] for i in range(0, len(images), batch)]
    results = []
    up = upload(chunks[0])
    inflight = None  # (device outputs, chunk)
    for i, c in enumerate(chunks):
        out = launch(up)
        if i + 1 < len(chunks):
            up_fut = ex.submit(upload, chunks[i + 1])
        else:
            up_fut = None
        if inflight is not None:
            results.extend(_drain(inflight, fn, mb_w, mb_h, w, h, cfg, ex))
        inflight = (out, c)
        if up_fut is not None:
            up = up_fut.result()
    results.extend(_drain(inflight, fn, mb_w, mb_h, w, h, cfg, ex))
    ex.shutdown(wait=False)
    return results


def _drain(inflight, fn, mb_w, mb_h, w, h, cfg, ex):
    """Fetch one batch's device outputs and entropy-code them."""
    from ..ops.fastpath import unpack_output_blob

    out, chunk = inflight
    host = unpack_output_blob(_fetch(out, pool=ex), fn.blob_spec)

    def emit(i):
        if int(host["esc_cnt"][i]) > fn.esc_cap:
            Y, U, V = _fallback_planes(np.asarray(chunk[i])[..., :3], fn)
            return VP8Encoder(Y, U, V, w, h, cfg).encode()
        return _finish_one({k: v[i] for k, v in host.items()},
                           mb_w, mb_h, w, h, cfg)

    return list(ex.map(emit, range(len(chunk))))
