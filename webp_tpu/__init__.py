"""webp_tpu — TPU-native WebP codec framework.

A ground-up reimplementation of the WebP format (VP8 lossy, VP8L lossless,
ALPH alpha, VP8X extended container, ANIM animation, mux/demux, sharp-YUV)
designed TPU-first: batched JAX/XLA/Pallas kernels for the pixel compute,
host/native entropy coding, jax.sharding meshes for multi-chip scale-out.

Public API parity with the reference package root
(/root/reference/webp.go, encode.go):

    decode(data)        -> np.ndarray (RGB or RGBA uint8)
    decode_config(data) -> Features (dimensions/format without pixel decode)
    get_features(data)  -> Features
    encode(img, ...)    -> bytes (WebP file)
"""

from __future__ import annotations

import os as _os

import numpy as np


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-out: WEBPTPU_CACHE=0).

    The encoder's fused programs take tens of seconds to compile; caching
    them on disk makes repeat processes (tests, benches, CLI invocations)
    start hot. Mirrors the reference's ahead-of-time Go compilation model
    where startup cost is zero."""
    if _os.environ.get("WEBPTPU_CACHE", "1") == "0":
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "WEBPTPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "webp_tpu", "jax"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .container.parser import Parser, get_features
from .container.riff import Features, FormatType, WebPError

__version__ = "0.1.0"

__all__ = [
    "encode_batch",
    "decode",
    "decode_rgba",
    "decode_config",
    "get_features",
    "encode",
    "Features",
    "FormatType",
    "WebPError",
    "EncoderOptions",
]


def decode_rgba(data: bytes, backend: str = "host") -> np.ndarray:
    """Decodes a WebP file to an RGBA uint8 array [h, w, 4].

    backend="device" runs lossy reconstruction + loop filter + upsample on
    the TPU (host does the token parse); output is bit-identical to the
    host path."""
    p = Parser(data)
    frames = p.frames()
    if not frames:
        raise WebPError("webp: no image frame")
    fr = frames[0]
    if fr.is_lossless:
        from .lossless.decode import decode_vp8l, argb_to_rgba

        argb, _ = decode_vp8l(fr.bitstream)
        return argb_to_rgba(argb)
    if backend == "device":
        from .lossy.device_decode import decode_vp8_rgb_device

        rgb = decode_vp8_rgb_device(fr.bitstream)
        if rgb is not None:
            h, w = rgb.shape[:2]
            rgba = np.empty((h, w, 4), dtype=np.uint8)
            rgba[..., :3] = rgb
            if fr.has_alpha and fr.alpha:
                from .lossy.alpha import decode_alpha

                rgba[..., 3] = decode_alpha(fr.alpha, w, h)
            else:
                rgba[..., 3] = 255
            return rgba
    from .lossy.decode import decode_vp8_rgba

    return decode_vp8_rgba(fr.bitstream, fr.alpha if fr.has_alpha else None)


def decode(data: bytes, backend: str = "host") -> np.ndarray:
    """Decodes a WebP file; returns RGBA if the image has alpha, else RGB."""
    rgba = decode_rgba(data, backend=backend)
    f = get_features(data)
    if f.has_alpha:
        return rgba
    from .container.riff import FormatType

    if f.format == FormatType.VP8:
        # A simple lossy file cannot carry alpha (ALPH needs a VP8X
        # container, which reports has_alpha); skip the full-image scan.
        return rgba[..., :3]
    if bool((rgba[..., 3] != 255).any()):
        return rgba
    return rgba[..., :3]


def decode_config(data: bytes) -> Features:
    """Parses headers only (dimensions, format, alpha) without pixel decode."""
    return get_features(data)


def encode_batch(images, quality: int = 75, **options) -> list:
    """Encodes a batch of same-sized RGB images in one device launch
    (lossy, TPU wavefront) — the batched throughput path."""
    import numpy as np

    from .lossy.device_encode import encode_lossy_batch
    from .container import riff as r

    rgbs = np.stack([np.asarray(im)[..., :3] for im in images])
    B, h, w = rgbs.shape[:3]
    if h % 16 or w % 16:
        pad = np.zeros((B, (h + 15) // 16 * 16, (w + 15) // 16 * 16, 3), np.uint8)
        pad[:, :h, :w] = rgbs
        pad[:, h:, :w] = rgbs[:, h - 1 : h, :]
        pad[:, :, w:] = pad[:, :, w - 1 : w]
        rgbs = pad
    bitstreams = encode_lossy_batch(rgbs, quality=int(quality),
                                    true_width=w, true_height=h, **options)
    return [r.assemble_riff([r.Chunk(r.VP8, b)]) for b in bitstreams]


def encode(img: np.ndarray, **options) -> bytes:
    """Encodes an RGB(A) uint8 array to WebP bytes.

    Keyword options mirror the reference EncoderOptions (encode.go:42-187):
    lossless, quality, method, use_sharp_yuv, exact, alpha_quality, ...
    """
    from .encoder import encode as _encode

    return _encode(img, **options)


def _lazy_encoder_options():
    from .encoder import EncoderOptions

    return EncoderOptions


def __getattr__(name):
    if name == "EncoderOptions":
        return _lazy_encoder_options()
    raise AttributeError(name)
