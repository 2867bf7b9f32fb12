"""Top-level WebP encoding API.

Parity with the reference package root (/root/reference/encode.go):
EncoderOptions with C-default resolution, presets, RGB->YUV import
(gamma-correct 2x2 chroma averaging), alpha extraction, simple/extended
RIFF assembly.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import numpy as np

from .container import riff as r
from .container.riff import WebPError

MAX_DIMENSION = 16383


@dataclass
class EncoderOptions:
    """Mirrors reference EncoderOptions (encode.go:42-187)."""

    lossless: bool = False
    quality: float = 75.0
    method: int = 4
    target_size: int = 0
    target_psnr: float = 0.0
    segments: int = 4
    sns_strength: int = 50
    filter_strength: int = 60
    filter_sharpness: int = 0
    filter_type: int = 1
    autofilter: bool = False
    alpha_compression: int = 1
    alpha_filtering: int = 1
    alpha_quality: int = 100
    pass_count: int = 1
    preprocessing: int = 0
    partitions: int = 0
    partition_limit: int = 0
    use_sharp_yuv: bool = False
    exact: bool = False
    near_lossless: int = 100
    backend: str = "host"  # "host" | "device" (TPU wavefront) | "auto"
    dithering: float = 0.0  # 0..1 dither strength for RGB->YUV import
    # Metadata
    iccp: bytes = b""
    exif: bytes = b""
    xmp: bytes = b""


PRESETS = {
    "default": {},
    "picture": dict(sns_strength=80, filter_sharpness=4, filter_strength=35),
    "photo": dict(sns_strength=80, filter_sharpness=3, filter_strength=30),
    "drawing": dict(sns_strength=25, filter_sharpness=6, filter_strength=10),
    "icon": dict(sns_strength=0, filter_strength=0),
    "text": dict(sns_strength=0, filter_strength=0, segments=2),
}


def options_for_preset(preset: str, quality: float = 75.0) -> EncoderOptions:
    if preset not in PRESETS:
        raise WebPError(f"webp: unknown preset {preset!r}")
    return EncoderOptions(quality=quality, **PRESETS[preset])


# --- RGB -> YUV420 import (gamma-correct chroma averaging) -----------------

K_RGB_TO_Y = (16839, 33059, 6420)
K_RGB_TO_U = (-9719, -19081, 28800)
K_RGB_TO_V = (28800, -24116, -4684)
YUV_FIX = 16
YUV_HALF = 1 << (YUV_FIX - 1)

# Gamma tables (libwebp picture_csp_enc.c): gamma 0.80 chroma averaging.
K_GAMMA = 0.80
K_GAMMA_FIX = 12
K_GAMMA_SCALE = (1 << K_GAMMA_FIX) - 1
K_GAMMA_TAB_FIX = 7
K_GAMMA_TAB_SCALE = 1 << K_GAMMA_TAB_FIX
K_GAMMA_TAB_SIZE = 1 << (K_GAMMA_FIX - K_GAMMA_TAB_FIX)

_gamma_to_linear = None
_linear_to_gamma = None


def _init_gamma():
    global _gamma_to_linear, _linear_to_gamma
    if _gamma_to_linear is not None:
        return
    g2l = np.empty(256, dtype=np.int64)
    for v in range(256):
        g2l[v] = int((v / 255.0) ** K_GAMMA * K_GAMMA_SCALE + 0.5)
    l2g = np.empty(K_GAMMA_TAB_SIZE + 2, dtype=np.int64)
    scale = K_GAMMA_TAB_SCALE / K_GAMMA_SCALE
    for v in range(K_GAMMA_TAB_SIZE + 1):
        l2g[v] = int((scale * v) ** (1.0 / K_GAMMA) * 255.0 + 0.5)
    l2g[K_GAMMA_TAB_SIZE + 1] = 255
    _gamma_to_linear = g2l
    _linear_to_gamma = l2g


def _linear_to_gamma_interp(base: np.ndarray, shift: int) -> np.ndarray:
    """LinearToGamma on sum-of-4 linear values; returns 4x-scale gamma values
    in [0..1020] (matches reference dsp/yuv.go LinearToGamma)."""
    _init_gamma()
    v = base << shift  # in [0, 4*K_GAMMA_SCALE]
    tab_pos = np.minimum(v >> (K_GAMMA_TAB_FIX + 2), K_GAMMA_TAB_SIZE - 1)
    x = v & ((K_GAMMA_TAB_SCALE << 2) - 1)
    v0 = _linear_to_gamma[tab_pos]
    v1 = _linear_to_gamma[tab_pos + 1]
    y = v1 * x + v0 * ((K_GAMMA_TAB_SCALE << 2) - x)
    return (y + (K_GAMMA_TAB_SCALE >> 1)) >> K_GAMMA_TAB_FIX


def rgb_to_yuv420(rgb: np.ndarray, dithering: float = 0.0):
    """Converts uint8 RGB [h, w, 3] to YUV420 planes padded to MB multiples.

    Matches the reference's standard import path (lossy/encode.go:671-838):
    per-pixel Y; chroma from gamma-corrected 2x2 RGB accumulation. With
    dithering > 0, the Y rounding term comes from the VP8Random lagged-
    Fibonacci stream (dithered import, encode.go:690-695).
    """
    h, w = rgb.shape[:2]
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    if dithering <= 0.0:
        # C++ fast path (bit-exact with the numpy math below).
        try:
            from .native.api import native_yuv_import

            out = native_yuv_import(rgb)
            if out is not None:
                return out
        except Exception:
            pass
    rgbi = rgb.astype(np.int64)
    red, green, blue = rgbi[..., 0], rgbi[..., 1], rgbi[..., 2]
    if dithering > 0.0:
        from .utils.random import random_stream

        rounding = random_stream(h * w, YUV_FIX, dithering).reshape(h, w)
    else:
        rounding = YUV_HALF
    yy = (K_RGB_TO_Y[0] * red + K_RGB_TO_Y[1] * green + K_RGB_TO_Y[2] * blue
          + rounding + (16 << YUV_FIX)) >> YUV_FIX
    Y = np.zeros((mbh * 16, mbw * 16), dtype=np.uint8)
    Y[:h, :w] = np.clip(yy, 0, 255).astype(np.uint8)

    # Chroma: gamma-correct 2x2 accumulation on an even-padded copy.
    we, he = (w + 1) & ~1, (h + 1) & ~1
    pad = np.empty((he, we, 3), dtype=np.uint8)
    pad[:h, :w] = rgb
    if we > w:
        pad[:h, w:] = rgb[:, w - 1 :]
    if he > h:
        pad[h:, :w] = rgb[h - 1 :, :w]
        if we > w:
            pad[h:, w:] = rgb[h - 1 :, w - 1 :]
    _init_gamma()
    lin = _gamma_to_linear[pad]  # [he, we, 3] linear
    acc = (lin[0::2, 0::2] + lin[0::2, 1::2] + lin[1::2, 0::2] + lin[1::2, 1::2])
    # LinearToGamma(acc, 0) per channel -> gamma-domain averaged values.
    gam = _linear_to_gamma_interp(acc, 0)
    rg, gg, bg = gam[..., 0], gam[..., 1], gam[..., 2]
    # ClipUV with rounding = YUV_HALF << 2.
    ru = (K_RGB_TO_U[0] * rg + K_RGB_TO_U[1] * gg + K_RGB_TO_U[2] * bg
          + (YUV_HALF << 2) + (128 << (YUV_FIX + 2))) >> (YUV_FIX + 2)
    rv = (K_RGB_TO_V[0] * rg + K_RGB_TO_V[1] * gg + K_RGB_TO_V[2] * bg
          + (YUV_HALF << 2) + (128 << (YUV_FIX + 2))) >> (YUV_FIX + 2)
    U = np.zeros((mbh * 8, mbw * 8), dtype=np.uint8)
    V = np.zeros((mbh * 8, mbw * 8), dtype=np.uint8)
    ch, cw = he >> 1, we >> 1
    U[:ch, :cw] = np.clip(ru, 0, 255).astype(np.uint8)
    V[:ch, :cw] = np.clip(rv, 0, 255).astype(np.uint8)

    # Replicate border pixels into padding (matches importImage padding).
    _pad_plane(Y, h, w)
    _pad_plane(U, ch, cw)
    _pad_plane(V, ch, cw)
    return Y, U, V


def _pad_plane(p: np.ndarray, h: int, w: int) -> None:
    if w < p.shape[1]:
        p[:h, w:] = p[:h, w - 1 : w]
    if h < p.shape[0]:
        p[h:, :] = p[h - 1 : h, :]


def _device_ok() -> bool:
    try:
        import jax

        return len(jax.devices()) > 0
    except Exception:
        return False


# --- Encode entry points -----------------------------------------------------


def _to_array(img) -> np.ndarray:
    a = np.asarray(img)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] not in (3, 4):
        raise WebPError("webp: encode expects uint8 [h,w,3|4] array")
    return a


def encode(img, **options) -> bytes:
    """Encodes an RGB(A) uint8 array to a WebP file."""
    a = _to_array(img)
    opts = EncoderOptions(**options) if not isinstance(options.get("options"),
                                                       EncoderOptions) else options["options"]
    h, w = a.shape[:2]
    if w == 0 or h == 0 or w > MAX_DIMENSION or h > MAX_DIMENSION:
        raise WebPError("webp: invalid dimensions")
    if opts.lossless:
        return _encode_lossless(a, opts)
    if opts.target_size > 0 or opts.target_psnr > 0:
        return _encode_lossy_rate_controlled(a, opts)
    return _encode_lossy(a, opts)


@dataclass
class EncStats:
    """Per-encode statistics (parity with reference EncStats,
    lossy/encode.go:326-337, plus the per-stage size breakdown the
    reference's debug tests print)."""

    psnr: float = 0.0
    size: int = 0
    quality: float = 0.0
    passes: int = 1
    part0_size: int = 0         # header+modes+proba partition bytes
    token_sizes: tuple = ()     # per token partition
    alpha_size: int = 0         # ALPH payload bytes


LAST_STATS = EncStats()


def _psnr_of(a: np.ndarray, data: bytes) -> float:
    import io

    import webp_tpu

    out = webp_tpu.decode_rgba(data)[..., : a.shape[2]]
    mse = float(np.mean((out.astype(np.float64) - a.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)


def _encode_lossy_rate_controlled(a: np.ndarray, opts: EncoderOptions) -> bytes:
    """Multi-pass rate control toward target_size / target_psnr.

    Models the size(quality) curve as a power law and steps by secant in
    log-log space (the role of statLoop/computeNextQ in the reference,
    lossy/encode.go:1405-1612, replacing the old 6-pass quality
    bisection): pass 1 probes, pass 2 steps by the power-law exponent,
    pass 3 solves the two-point fit — the target is typically hit within
    5% in <= 3 passes. Works with every backend, including "device".

    In-encoder economics (reference statLoop reuses analysis/import
    across passes, encode.go:1405,1545): the YUV import is computed once
    and reused by every pass, and the curve-navigation probes run at a
    reduced method (<= 2: no trellis, light RD) — only the landing pass
    encodes at the full configured method, so a rate-controlled encode
    costs roughly one full encode plus cheap probes instead of N full
    encodes."""
    from dataclasses import replace

    global LAST_STATS
    q = opts.quality if 0 < opts.quality <= 100 else 75.0
    max_passes = max(3, opts.pass_count) if opts.pass_count > 1 else 3
    yuv_cache: dict = {}
    probe_opts = (replace(opts, method=min(2, opts.method))
                  if opts.method > 2 else opts)
    history = []       # (q, size or psnr)
    best_hit = None    # (q, data, metric) best result satisfying the target
    best_any = None

    def next_q_size(target):
        if len(history) == 1:
            q1, s1 = history[0]
            return q1 * (target / s1) ** 0.8
        (q1, s1), (q2, s2) = history[-2], history[-1]
        if s1 == s2 or q1 == q2:
            return q2 * (target / s2) ** 0.8
        import math

        b = (math.log(s2) - math.log(s1)) / (math.log(q2) - math.log(q1))
        if abs(b) < 1e-6:
            return q2 * (target / s2) ** 0.8
        return math.exp(math.log(q2) + (math.log(target) - math.log(s2)) / b)

    probes_are_full = probe_opts is opts
    for p in range(max_passes):
        data = _encode_lossy(a, replace(probe_opts, quality=q,
                                        target_size=0, target_psnr=0.0),
                             _yuv_cache=yuv_cache)
        if opts.target_size > 0:
            size = len(data)
            history.append((q, size))
            if size <= opts.target_size and \
                    (best_hit is None or q > best_hit[0]):
                best_hit = (q, data)
            if best_any is None or size < len(best_any[1]):
                best_any = (q, data)
            if size <= opts.target_size and \
                    size >= 0.95 * opts.target_size:
                break
            # Aim slightly under so the landing zone is [0.95, 1.0].
            q = max(1.0, min(100.0, next_q_size(0.97 * opts.target_size)))
        else:
            psnr = _psnr_of(a, data)
            history.append((q, 10.0 ** (psnr / 10.0)))
            if psnr >= opts.target_psnr and \
                    (best_hit is None or q < best_hit[0]):
                best_hit = (q, data)
            if best_any is None or psnr > best_any[2]:
                best_any = (q, data, psnr)
            if opts.target_psnr <= psnr <= opts.target_psnr + 0.5:
                break
            q = max(1.0, min(100.0,
                             next_q_size(10.0 ** (opts.target_psnr / 10.0))))
        if history and abs(q - history[-1][0]) < 0.5:
            break
    if not probes_are_full:
        # Landing pass at the full configured method on the probe-chosen
        # quality. Reduced-method probes code slightly LARGER (and lower
        # PSNR) than the full method at equal q, so the chosen q is
        # conservative for both target kinds.
        q_land = (best_hit if best_hit is not None else best_any)[0]
        data = _encode_lossy(a, replace(opts, quality=q_land,
                                        target_size=0, target_psnr=0.0),
                             _yuv_cache=yuv_cache)
        p += 1
        if opts.target_size > 0 and len(data) <= opts.target_size:
            best_hit = (q_land, data)
        elif opts.target_size > 0:
            best_hit = None          # cap violated: corrective loop below
            history.append((q_land, len(data)))
        else:
            best_hit = (q_land, data)
    if opts.target_size > 0 and best_hit is None:
        # The budget is a hard cap: corrective downward passes until under
        # (full method — these results are candidates for return).
        q, size = min(history, key=lambda h: h[1])
        for _ in range(3):
            q = max(1.0, q * min(0.9, (opts.target_size / size) ** 1.2))
            data = _encode_lossy(a, replace(opts, quality=q,
                                            target_size=0, target_psnr=0.0),
                                 _yuv_cache=yuv_cache)
            p += 1
            size = len(data)
            if size <= opts.target_size:
                best_hit = (q, data)
                break
            if q <= 1.0:
                break
        if best_hit is None:
            best_hit = (q, data)  # q=1 floor: smallest achievable
    q_used, data = (best_hit if best_hit is not None else best_any)[:2]
    LAST_STATS = EncStats(psnr=_psnr_of(a, data), size=len(data),
                          quality=q_used, passes=p + 1)
    return data


def _has_alpha(a: np.ndarray) -> bool:
    return a.shape[2] == 4 and bool((a[..., 3] != 255).any())


def _encode_lossy(a: np.ndarray, opts: EncoderOptions,
                  _yuv_cache: dict = None) -> bytes:
    from .lossy.encode import VP8Encoder, LossyConfig

    h, w = a.shape[:2]
    if not opts.exact and _has_alpha(a):
        # Transparent-area cleanup (reference encode.go:788): smooth RGB
        # under invisible pixels so they cost no DCT bits.
        from .utils.alpha import cleanup_transparent_lossy

        a = cleanup_transparent_lossy(a)
    rgb = a[..., :3]
    use_device = opts.backend == "device" or (opts.backend == "auto"
                                              and _device_ok())
    if opts.use_sharp_yuv and not use_device:
        from .sharpyuv.convert import sharp_rgb_to_yuv420

        key = ("sharp",)
        if _yuv_cache is not None and _yuv_cache.get("key") == key:
            Y, U, V = _yuv_cache["planes"]
        else:
            Y, U, V = sharp_rgb_to_yuv420(rgb)
            if _yuv_cache is not None:
                _yuv_cache.update(key=key, planes=(Y, U, V))
    else:
        # Device sharp runs on-chip from rgb_input; these planes only feed
        # the filter-strength plan and the pathological-content fallback.
        dither = opts.dithering
        if opts.preprocessing & 2 and dither <= 0.0:
            # preprocessing bit 1 = pseudo-random dithering, amplitude from
            # quality (reference encode.go:517: 1.0 - 0.5*(q/100)^4).
            x = max(0.0, min(1.0, opts.quality / 100.0))
            dither = 1.0 - 0.5 * x ** 4
        key = ("plain", round(dither, 6))
        if _yuv_cache is not None and _yuv_cache.get("key") == key:
            Y, U, V = _yuv_cache["planes"]
        else:
            Y, U, V = rgb_to_yuv420(rgb, dithering=dither)
            if _yuv_cache is not None:
                _yuv_cache.update(key=key, planes=(Y, U, V))
    cfg = LossyConfig(
        quality=int(opts.quality),
        method=opts.method,
        segments=opts.segments,
        filter_strength=opts.filter_strength,
        filter_sharpness=opts.filter_sharpness,
        filter_type=opts.filter_type,
        partitions=opts.partitions,
        sns_strength=opts.sns_strength,
        sharp_yuv=opts.use_sharp_yuv,
        autofilter=bool(opts.autofilter),
        partition_limit=int(opts.partition_limit),
        preprocessing=int(opts.preprocessing),
    )
    if use_device:
        # TPU wavefront path: RGB import (plain or SharpYUV) fused on
        # device, host entropy coding.
        from .lossy.device_encode import DeviceVP8Encoder

        enc = DeviceVP8Encoder(Y, U, V, w, h, cfg)
        mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
        pad = np.zeros((mbh * 16, mbw * 16, 3), dtype=np.uint8)
        pad[:h, :w] = rgb
        if w < pad.shape[1]:
            pad[:h, w:] = rgb[:, w - 1 :]
        if h < pad.shape[0]:
            pad[h:] = pad[h - 1 : h]
        enc.rgb_input = pad
    else:
        enc = VP8Encoder(Y, U, V, w, h, cfg)

    # ALPH side-encode overlaps the luma encode (reference alpha.go:210
    # runs them concurrently): both paths spend their time inside ctypes
    # calls that release the GIL, so the overlap scales with cores.
    alpha_future = None
    if _has_alpha(a):
        from concurrent.futures import ThreadPoolExecutor

        from .lossy.alpha_enc import encode_alpha

        _alpha_ex = ThreadPoolExecutor(max_workers=1)
        alpha_future = _alpha_ex.submit(
            encode_alpha, a[..., 3],
            quality=opts.alpha_quality,
            method=opts.alpha_compression,
            filtering=opts.alpha_filtering,
            effort=opts.method,
        )
        _alpha_ex.shutdown(wait=False)
    vp8 = enc.encode()

    # Per-encode statistics (reference EncStats, lossy/encode.go:1614-1626):
    # PSNR from the encoder's own reconstruction when it exists on host.
    global LAST_STATS
    psnr = 0.0
    rec = getattr(enc, "recY", None)
    if rec is not None and getattr(enc, "srcY", None) is not None \
            and np.any(rec):
        # float64 BLAS dot: ~6x cheaper than the int64 square-sum and
        # exact for these magnitudes (|diff| <= 255, n ~ 1e6 << 2^52).
        d = (rec.astype(np.float64) - enc.srcY.astype(np.float64)).ravel()
        se = float(np.dot(d, d))
        npx = rec.size
        psnr = 99.0 if se == 0 else 10.0 * np.log10(255.0 ** 2 * npx / se)
    LAST_STATS = EncStats(psnr=psnr, size=len(vp8), quality=opts.quality,
                          passes=1,
                          part0_size=getattr(enc, "stats_part0", 0),
                          token_sizes=tuple(getattr(enc, "stats_parts", ())))

    alpha_payload = b""
    if alpha_future is not None:
        alpha_payload = alpha_future.result()
        LAST_STATS.alpha_size = len(alpha_payload)

    has_meta = bool(opts.iccp or opts.exif or opts.xmp)
    if not alpha_payload and not has_meta:
        return r.assemble_riff([r.Chunk(r.VP8, vp8)])
    return _assemble_extended(w, h, vp8=vp8, alpha=alpha_payload, opts=opts)


def _encode_lossless(a: np.ndarray, opts: EncoderOptions) -> bytes:
    from .lossless.encode import encode_vp8l

    has_alpha = _has_alpha(a)
    payload = encode_vp8l(a, quality=int(opts.quality), method=opts.method,
                          exact=opts.exact, near_lossless=opts.near_lossless)
    has_meta = bool(opts.iccp or opts.exif or opts.xmp)
    if not has_meta:
        return r.assemble_riff([r.Chunk(r.VP8L, payload)])
    h, w = a.shape[:2]
    return _assemble_extended(w, h, vp8l=payload, opts=opts,
                              vp8l_alpha=has_alpha)


def _assemble_extended(w: int, h: int, vp8: bytes = b"", vp8l: bytes = b"",
                       alpha: bytes = b"", opts: Optional[EncoderOptions] = None,
                       vp8l_alpha: bool = False) -> bytes:
    flags = 0
    if alpha or vp8l_alpha:
        flags |= r.FLAG_ALPHA
    if opts and opts.iccp:
        flags |= r.FLAG_ICCP
    if opts and opts.exif:
        flags |= r.FLAG_EXIF
    if opts and opts.xmp:
        flags |= r.FLAG_XMP
    vp8x = flags.to_bytes(4, "little") + (w - 1).to_bytes(3, "little") + \
        (h - 1).to_bytes(3, "little")
    chunks = [r.Chunk(r.VP8X, vp8x)]
    if opts and opts.iccp:
        chunks.append(r.Chunk(r.ICCP, opts.iccp))
    if alpha:
        chunks.append(r.Chunk(r.ALPH, alpha))
    if vp8:
        chunks.append(r.Chunk(r.VP8, vp8))
    if vp8l:
        chunks.append(r.Chunk(r.VP8L, vp8l))
    if opts and opts.exif:
        chunks.append(r.Chunk(r.EXIF, opts.exif))
    if opts and opts.xmp:
        chunks.append(r.Chunk(r.XMP, opts.xmp))
    return r.assemble_riff(chunks)
