"""Opt-in Pillow integration: route PIL.Image.open/save through this codec.

The reference registers its decoder with Go's image package so callers get
WebP support transparently (reference webp.go:23-34, image.RegisterFormat).
The Pillow analog is an ImageFile plugin: call register() and Image.open()
on .webp files decodes via webp_tpu, Image.save(..., format="WEBP") encodes
via webp_tpu. register() replaces Pillow's built-in WEBP plugin entries for
the process; unregister() restores them.

    import webp_tpu.pil_plugin
    webp_tpu.pil_plugin.register()
    im = PIL.Image.open("photo.webp")        # decoded by webp_tpu
    im.save("out.webp", quality=80)          # encoded by webp_tpu
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image, ImageFile

import webp_tpu

_MAGIC_RIFF = b"RIFF"
_MAGIC_WEBP = b"WEBP"


def _accept(prefix: bytes) -> bool:
    return prefix[:4] == _MAGIC_RIFF and prefix[8:12] == _MAGIC_WEBP


class WebPTpuImageFile(ImageFile.ImageFile):
    format = "WEBP"
    format_description = "WebP (webp_tpu codec)"

    def _open(self):
        self._webp_data = self.fp.read()
        feats = webp_tpu.get_features(self._webp_data)
        self._size = (feats.width, feats.height)
        self._mode = "RGBA" if feats.has_alpha else "RGB"
        if feats.has_anim:
            from webp_tpu.container.parser import Parser

            self.n_frames = max(1, len(Parser(self._webp_data).frames()))
        else:
            self.n_frames = 1
        self.is_animated = self.n_frames > 1
        self._frame = 0
        self._composited = None
        self.tile = []

    def seek(self, frame: int) -> None:
        if frame == self._frame:
            return
        if frame < 0 or frame >= self.n_frames:
            raise EOFError(f"no frame {frame}")
        self._frame = frame
        self._im = None  # force reload

    def tell(self) -> int:
        return self._frame

    def _decode_frame(self) -> np.ndarray:
        if self.n_frames == 1:
            return webp_tpu.decode(self._webp_data)
        if self._composited is None:
            from webp_tpu.animation.animation import (
                AnimDecoder,
                decode_animation,
            )

            anim = decode_animation(self._webp_data)
            self._composited = list(AnimDecoder(anim))
        canvas, duration = self._composited[self._frame]
        self.info["duration"] = duration
        return canvas

    def load(self):
        if getattr(self, "_im", None) is None and self.tile == []:
            arr = np.asarray(self._decode_frame())
            decoded = Image.fromarray(arr)
            self.im = decoded.im
            self._mode = decoded.mode
            self._size = decoded.size
        return Image.Image.load(self)


def _save(im: Image.Image, fp, filename) -> None:
    params = im.encoderinfo or {}
    if im.mode not in ("RGB", "RGBA"):
        im = im.convert("RGBA" if "A" in im.mode or "transparency" in im.info
                        else "RGB")
    arr = np.asarray(im)
    opts = {}
    for k in ("lossless", "quality", "method", "exact", "alpha_quality"):
        if k in params:
            opts[k] = params[k]
    if "use_sharp_yuv" in params:
        opts["use_sharp_yuv"] = params["use_sharp_yuv"]
    fp.write(webp_tpu.encode(arr, **opts))


_saved_entries: dict = {}


def register() -> None:
    """Installs this codec as Pillow's WEBP handler (process-wide)."""
    Image.init()  # load built-in plugins first so ours replaces theirs
    _saved_entries.setdefault("open", Image.OPEN.get("WEBP"))
    _saved_entries.setdefault("save", Image.SAVE.get("WEBP"))
    Image.register_open(WebPTpuImageFile.format, WebPTpuImageFile, _accept)
    Image.register_save(WebPTpuImageFile.format, _save)
    Image.register_extension(WebPTpuImageFile.format, ".webp")
    Image.register_mime(WebPTpuImageFile.format, "image/webp")


def unregister() -> None:
    """Restores Pillow's own WEBP plugin entries."""
    if _saved_entries.get("open") is not None:
        Image.OPEN["WEBP"] = _saved_entries["open"]
    else:
        Image.OPEN.pop("WEBP", None)
    if _saved_entries.get("save") is not None:
        Image.SAVE["WEBP"] = _saved_entries["save"]
    else:
        Image.SAVE.pop("WEBP", None)
    _saved_entries.clear()


def open_bytes(data: bytes) -> Image.Image:
    """Decodes WebP bytes to a PIL Image via this codec (no registration)."""
    f = WebPTpuImageFile(io.BytesIO(data))
    f.load()
    return f
