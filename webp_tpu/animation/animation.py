"""Animated WebP (ANIM/ANMF): decode compositor + encoder.

Parity with /root/reference/animation/animation.go: frame model, canvas
compositor (dispose-to-background = transparent black, exact integer alpha
blend), and an encoder with identical-frame merging, changed-rect sub-frame
encoding, kmin/kmax keyframe policy, per-frame lossy/lossless choice, and
single-frame simple-WebP fallback.

The compositor is vectorized numpy (device version would be trivial — it is
pure elementwise math; frames shard across hosts per SURVEY.md §2.7 P6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..container import riff as r
from ..container.parser import Parser
from ..container.riff import BlendMethod, DisposeMethod, WebPError
from ..mux.mux import Muxer, MuxFrame


@dataclass
class Frame:
    """One decoded animation frame (pre-composition)."""

    rgba: np.ndarray  # uint8 [h, w, 4]
    x_offset: int = 0
    y_offset: int = 0
    duration_ms: int = 100
    dispose: DisposeMethod = DisposeMethod.NONE
    blend: BlendMethod = BlendMethod.ALPHA
    has_alpha: bool = False


@dataclass
class Animation:
    canvas_width: int = 0
    canvas_height: int = 0
    loop_count: int = 0
    bgcolor: int = 0
    frames: List[Frame] = field(default_factory=list)


def _decode_frame_pixels(fr) -> np.ndarray:
    if fr.is_lossless:
        from ..lossless.decode import decode_vp8l, argb_to_rgba

        argb, _ = decode_vp8l(fr.bitstream)
        return argb_to_rgba(argb)
    from ..lossy.decode import decode_vp8_rgba

    return decode_vp8_rgba(fr.bitstream, fr.alpha if fr.alpha else None)


def decode_animation(data: bytes) -> Animation:
    """Parses + pixel-decodes every frame of an animated WebP.

    Frame pixel decodes are independent (composition happens later in
    FrameIterator), so they run on a worker pool like the reference's
    decoder (animation.go:190-256). The C++ fast path releases the GIL
    for the duration of each ctypes call, so the pool scales with cores.
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    p = Parser(data)
    f = p.features
    anim = Animation(
        canvas_width=f.width or f.canvas_width,
        canvas_height=f.height or f.canvas_height,
        loop_count=f.loop_count,
        bgcolor=f.bgcolor,
    )
    raw = list(p.frames())
    workers = max(1, min(8, _os.cpu_count() or 1, len(raw) or 1))
    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            rgbas = list(ex.map(_decode_frame_pixels, raw))
    else:
        rgbas = [_decode_frame_pixels(fr) for fr in raw]
    for fr, rgba in zip(raw, rgbas):
        anim.frames.append(Frame(
            rgba=rgba, x_offset=fr.x_offset, y_offset=fr.y_offset,
            duration_ms=fr.duration_ms, dispose=fr.dispose, blend=fr.blend,
            has_alpha=fr.has_alpha,
        ))
    if not anim.frames:
        raise WebPError("webp: no animation frames")
    if anim.canvas_width == 0:
        anim.canvas_width = anim.frames[0].rgba.shape[1]
        anim.canvas_height = anim.frames[0].rgba.shape[0]
    # Frame rectangles must fit the declared canvas (reference
    # animation.go frame validation / libwebp demux CreateRawImageDemuxer
    # checks) — numpy slice-clipping would otherwise composite silently
    # truncated frames from a corrupt file.
    for i, fr in enumerate(anim.frames):
        fh, fw = fr.rgba.shape[:2]
        if (fr.x_offset + fw > anim.canvas_width
                or fr.y_offset + fh > anim.canvas_height):
            raise WebPError(
                f"webp: animation frame {i} exceeds canvas")
    return anim


def alpha_blend(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact integer alpha blend (animation.go:1243-1279), vectorized."""
    src_a = src[..., 3].astype(np.uint32)
    dst_a = dst[..., 3].astype(np.uint32)
    dst_factor_a = (dst_a * (256 - src_a)) >> 8
    blend_a = src_a + dst_factor_a
    scale = np.where(blend_a > 0, (1 << 24) // np.maximum(blend_a, 1), 0)
    out = np.empty_like(src)
    for c in range(3):
        v = ((src[..., c].astype(np.uint64) * src_a
              + dst[..., c].astype(np.uint64) * dst_factor_a)
             * scale.astype(np.uint64)) >> 24
        out[..., c] = np.minimum(v, 255).astype(np.uint8)
    out[..., 3] = np.minimum(blend_a, 255).astype(np.uint8)
    # src fully transparent -> dst; src opaque or dst transparent -> src.
    take_dst = (src_a == 0)[..., None]
    take_src = ((src_a == 255) | (dst_a == 0))[..., None]
    return np.where(take_dst, dst, np.where(take_src, src, out))


class AnimDecoder:
    """Canvas compositor over a decoded Animation (animation.go:279-457)."""

    def __init__(self, anim: Animation):
        if anim.canvas_width <= 0 or anim.canvas_height <= 0:
            raise WebPError("animation: invalid canvas")
        if anim.canvas_width * anim.canvas_height > 1 << 30:
            raise WebPError("animation: canvas too large")
        self.anim = anim
        self.reset()

    def reset(self) -> None:
        h, w = self.anim.canvas_height, self.anim.canvas_width
        self._canvas = np.zeros((h, w, 4), dtype=np.uint8)
        self._prev_disposed = np.zeros((h, w, 4), dtype=np.uint8)
        self._pos = 0

    def has_more(self) -> bool:
        return self._pos < len(self.anim.frames)

    def next(self) -> Tuple[np.ndarray, int]:
        """Returns (composited canvas copy, duration_ms)."""
        if not self.has_more():
            raise WebPError("animation: no more frames")
        f = self.anim.frames[self._pos]
        canvas = self._prev_disposed.copy()
        self._composite(canvas, f)
        snap = canvas.copy()
        # Prepare next iteration's base canvas.
        self._prev_disposed = canvas
        if f.dispose == DisposeMethod.BACKGROUND:
            x0, y0 = f.x_offset, f.y_offset
            fh, fw = f.rgba.shape[:2]
            self._prev_disposed = canvas.copy()
            self._prev_disposed[y0 : y0 + fh, x0 : x0 + fw] = 0
        self._pos += 1
        return snap, f.duration_ms

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int]]:
        self.reset()
        while self.has_more():
            yield self.next()

    def _composite(self, canvas: np.ndarray, f: Frame) -> None:
        ch, cw = canvas.shape[:2]
        fh, fw = f.rgba.shape[:2]
        x0 = max(0, f.x_offset)
        y0 = max(0, f.y_offset)
        x1 = min(cw, f.x_offset + fw)
        y1 = min(ch, f.y_offset + fh)
        if x1 <= x0 or y1 <= y0:
            return
        src = f.rgba[y0 - f.y_offset : y1 - f.y_offset,
                     x0 - f.x_offset : x1 - f.x_offset]
        if f.blend == BlendMethod.NONE:
            canvas[y0:y1, x0:x1] = src
        else:
            canvas[y0:y1, x0:x1] = alpha_blend(src, canvas[y0:y1, x0:x1])


# ---------------------------------------------------------------------------
# Encoding.
# ---------------------------------------------------------------------------

@dataclass
class AnimEncodeOptions:
    """Parity with reference EncodeOptions (animation.go:484-507)."""

    lossless: bool = False
    quality: float = 75.0
    method: int = 4
    kmin: int = 0  # 0 -> derived from kmax
    kmax: int = 0  # 0 -> default (9 lossy / 17 lossless); 1 -> all keyframes
    allow_mixed: bool = False
    loop_count: int = 0
    bgcolor: int = 0
    minimize_size: bool = False


def _snap_to_even(v: int) -> int:
    return v & ~1


def _changed_rect(prev: np.ndarray, cur: np.ndarray) -> Optional[tuple]:
    """Smallest even-aligned rect where cur differs from prev; None if equal."""
    diff = (prev != cur).any(axis=-1)
    if not diff.any():
        return None
    ys, xs = np.nonzero(diff)
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    x0 = _snap_to_even(x0)
    y0 = _snap_to_even(y0)
    return x0, y0, x1, y1


class AnimEncoder:
    """Incremental animated-WebP encoder (animation.go:590-1234)."""

    def __init__(self, width: int, height: int,
                 options: Optional[AnimEncodeOptions] = None):
        self.opts = options or AnimEncodeOptions()
        self.width = width
        self.height = height
        self.mux = Muxer()
        self.mux.loop_count = self.opts.loop_count
        self.mux.bgcolor = self.opts.bgcolor
        self.mux.canvas_width = width
        self.mux.canvas_height = height
        self._prev_canvas: Optional[np.ndarray] = None
        self._frames_since_key = 0
        # kmin/kmax sanitation (reference sanitizeKeyframeOptions,
        # animation.go:546; minimize_size implies no forced keyframes).
        kmax = self.opts.kmax
        if kmax == 0:
            kmax = 17 if self.opts.lossless else 9
        kmin = self.opts.kmin
        if self.opts.minimize_size or kmax < 0:
            kmax = 1 << 30
            kmin = kmax - 1
        elif kmax == 1:
            kmin, kmax = 0, 0
        elif kmin >= kmax:
            kmin = kmax - 1
        else:
            kmin_limit = kmax // 2 + 1
            if kmin < kmin_limit < kmax:
                kmin = kmin_limit
        if kmax - kmin > 30:
            kmin = kmax - 30
        self.kmin, self.kmax = kmin, kmax
        self._count = 0
        self._prev_rect = (0, 0, width, height)
        self._prev_idx = -1

    # -- internals ----------------------------------------------------
    def _encode_rect(self, rgba: np.ndarray) -> MuxFrame:
        o = self.opts
        lossless_mf = lossy_mf = None
        if o.lossless or o.allow_mixed:
            from ..lossless.encode import encode_vp8l

            lossless_mf = MuxFrame(
                bitstream=encode_vp8l(rgba, quality=int(o.quality),
                                      method=o.method),
                is_lossless=True)
            if o.lossless:
                return lossless_mf
        from ..encoder import rgb_to_yuv420
        from ..lossy.encode import VP8Encoder, LossyConfig

        h, w = rgba.shape[:2]
        Y, U, V = rgb_to_yuv420(rgba[..., :3])
        cfg = LossyConfig(quality=int(o.quality), method=o.method)
        vp8 = VP8Encoder(Y, U, V, w, h, cfg).encode()
        alpha = b""
        if rgba.shape[2] == 4 and bool((rgba[..., 3] != 255).any()):
            from ..lossy.alpha_enc import encode_alpha

            alpha = encode_alpha(rgba[..., 3], effort=o.method)
        lossy_mf = MuxFrame(bitstream=vp8, alpha=alpha, is_lossless=False)
        if lossless_mf is not None:
            # Mixed mode: try both codecs, keep the smaller frame
            # (reference encodeFrame, animation.go:638).
            lossless_sz = len(lossless_mf.bitstream)
            lossy_sz = len(lossy_mf.bitstream) + len(lossy_mf.alpha or b"")
            if lossless_sz <= lossy_sz:
                return lossless_mf
        return lossy_mf

    def _blend_possible(self, under_sub: np.ndarray,
                        target_sub: np.ndarray) -> bool:
        """Whether alpha-blending the target rect over `under` reproduces
        the target (reference isLossless/isLossyBlendingPossible,
        animation.go:787/815; lossy uses the qualityToMaxDiff threshold)."""
        not_opaque = target_sub[..., 3] != 255
        if not not_opaque.any():
            return True
        if self.opts.lossless:
            # Stricter than the reference (which accepts under == target at
            # any alpha): blending t-over-t drifts alpha upward unless the
            # pixel is fully transparent or opaque, and lossless output
            # must composite bit-exactly.
            ok = ((under_sub == target_sub).all(axis=-1)
                  & (target_sub[..., 3] == 0))
        else:
            # qualityToMaxDiff (animation.go:743): 31*(1-sqrt(q/100)) + val.
            val = (max(0.0, min(100.0, self.opts.quality)) / 100.0) ** 0.5
            max_diff = int(31.0 * (1.0 - val) + val + 0.5)
            thr = max_diff * 255
            ta = target_sub[..., 3].astype(np.int32)
            d = np.abs(under_sub[..., :3].astype(np.int32)
                       - target_sub[..., :3].astype(np.int32))
            ok = ((under_sub[..., 3] == target_sub[..., 3])
                  & ((d * ta[..., None]) <= thr).all(axis=-1))
        return bool((ok | ~not_opaque).all())

    def _candidate(self, canvas: np.ndarray, under: np.ndarray):
        """Builds one sub-frame candidate against the given underlying
        canvas state: (rect, MuxFrame, payload_size) or None if identical."""
        rect = _changed_rect(under, canvas)
        if rect is None:
            return None
        x0, y0, x1, y1 = rect
        sub = canvas[y0:y1, x0:x1]
        mf = self._encode_rect(sub)
        mf.blend = (BlendMethod.ALPHA
                    if self._blend_possible(under[y0:y1, x0:x1], sub)
                    else BlendMethod.NONE)
        # Transparent-blend candidate (reference increaseTransparency,
        # animation.go:787): unchanged pixels become transparent and the
        # frame alpha-blends over the underlying canvas — long transparent
        # runs compress far better in VP8L. Valid only when every changed
        # pixel is fully opaque (alpha blending must reduce to overwrite).
        if self.opts.lossless or self.opts.allow_mixed:
            under_sub = under[y0:y1, x0:x1]
            changed = (sub != under_sub).any(axis=-1)
            if changed.any() and bool((sub[..., 3][changed] == 255).all()):
                from ..lossless.encode import encode_vp8l

                trans = sub.copy()
                trans[~changed] = 0
                bs = encode_vp8l(trans, quality=int(self.opts.quality),
                                 method=self.opts.method)
                if len(bs) < len(mf.bitstream) + len(mf.alpha or b""):
                    mf = MuxFrame(bitstream=bs, is_lossless=True)
                    mf.blend = BlendMethod.ALPHA
        mf.x_offset, mf.y_offset = x0, y0
        return rect, mf, len(mf.bitstream) + len(mf.alpha or b"")

    def _add_keyframe(self, canvas: np.ndarray, duration_ms: int) -> None:
        mf = self._encode_rect(canvas)
        mf.blend = BlendMethod.NONE
        mf.dispose = DisposeMethod.NONE
        mf.duration_ms = duration_ms
        self.mux.add_frame(mf)
        self._prev_canvas = canvas.copy()
        self._prev_rect = (0, 0, self.width, self.height)
        self._prev_idx = len(self.mux.frames) - 1
        self._frames_since_key = 0
        self._count += 1

    def add_frame(self, canvas: np.ndarray, duration_ms: int) -> None:
        """Adds one full-canvas RGBA frame (reference addOptimizedFrame,
        animation.go:660: identical-frame merge, kmin/kmax keyframe
        policy, dual dispose candidates with retroactive dispose update,
        blend-feasibility flags, >90%-changed keyframe fallback)."""
        canvas = np.asarray(canvas, dtype=np.uint8)
        if canvas.ndim != 3 or canvas.shape[:2] != (self.height, self.width):
            raise WebPError("animation: frame must match canvas size")
        if canvas.shape[2] == 3:
            canvas = np.dstack([canvas, np.full(canvas.shape[:2], 255, np.uint8)])

        if self._prev_canvas is None:
            self._add_keyframe(canvas, duration_ms)
            return

        if np.array_equal(self._prev_canvas, canvas):
            # Identical frame: extend previous duration (animation.go:974),
            # with 24-bit overflow spilling into a 1x1 transparent filler.
            MAXD = (1 << 24) - 1
            prev = self.mux.frames[self._prev_idx]
            new_dur = prev.duration_ms + duration_ms
            if new_dur <= MAXD:
                prev.duration_ms = new_dur
            else:
                rem = new_dur - MAXD
                prev.duration_ms = MAXD
                filler = self._encode_rect(np.zeros((2, 2, 4), np.uint8))
                filler.blend = BlendMethod.ALPHA
                filler.dispose = DisposeMethod.NONE
                filler.duration_ms = rem
                self.mux.add_frame(filler)
                self._prev_idx = len(self.mux.frames) - 1
                self._prev_rect = (0, 0, 2, 2)
            self._frames_since_key += 1
            self._count += 1
            return

        self._frames_since_key += 1
        if self._frames_since_key >= self.kmax:
            self._add_keyframe(canvas, duration_ms)
            return

        # Candidate 1: previous frame keeps DISPOSE_NONE.
        cand_none = self._candidate(canvas, self._prev_canvas)
        # Candidate 2: previous frame retroactively DISPOSE_BACKGROUND.
        px0, py0, px1, py1 = self._prev_rect
        disposed = self._prev_canvas.copy()
        disposed[py0:py1, px0:px1] = 0
        cand_bg = self._candidate(canvas, disposed)

        use_bg = (cand_bg is not None
                  and (cand_none is None or cand_bg[2] < cand_none[2]))
        rect, mf, size = cand_bg if use_bg else cand_none

        # >90% changed -> try a full keyframe, take it if smaller and the
        # kmin spacing allows one (animation.go:927).
        x0, y0, x1, y1 = rect
        if ((x1 - x0) * (y1 - y0) > 0.9 * self.width * self.height
                and self._frames_since_key >= self.kmin):
            kf = self._encode_rect(canvas)
            if len(kf.bitstream) + len(kf.alpha or b"") < size:
                self._add_keyframe(canvas, duration_ms)
                return

        if use_bg:
            self.mux.frames[self._prev_idx].dispose = DisposeMethod.BACKGROUND
        mf.duration_ms = duration_ms
        mf.dispose = DisposeMethod.NONE
        self.mux.add_frame(mf)
        self._prev_canvas = canvas.copy()
        self._prev_rect = rect
        self._prev_idx = len(self.mux.frames) - 1
        self._count += 1

    def assemble(self) -> bytes:
        """Finishes the stream (single frame falls back to simple WebP)."""
        if not self.mux.frames:
            raise WebPError("animation: no frames added")
        if self._count == 1 and len(self.mux.frames) == 1:
            f = self.mux.frames[0]
            if f.x_offset == 0 and f.y_offset == 0 and not f.alpha:
                tag = r.VP8L if f.is_lossless else r.VP8
                return r.assemble_riff([r.Chunk(tag, f.bitstream)])
        return self.mux.assemble()

    close = assemble  # reference naming parity (AnimEncoder.Close)


def encode_animation(frames: List[np.ndarray], durations, **options) -> bytes:
    """Convenience: encodes a list of full-canvas RGBA frames."""
    if not frames:
        raise WebPError("animation: no frames")
    h, w = np.asarray(frames[0]).shape[:2]
    opts = AnimEncodeOptions(**options)
    enc = AnimEncoder(w, h, opts)
    if isinstance(durations, int):
        durations = [durations] * len(frames)
    for f, d in zip(frames, durations):
        enc.add_frame(f, d)
    return enc.assemble()


def encode_animation_device(frames: List[np.ndarray], durations,
                            quality: int = 75, loop_count: int = 0,
                            batch: int = 8) -> bytes:
    """Frame-parallel animated-WebP encode on the device (SURVEY.md §2.7
    P6: animation frames are the temporal data-parallel axis; here they
    ride the encode batch — on a multi-chip mesh the same batch axis is
    sharded over 'dp').

    Every frame is stored as a full-canvas ANMF (no sub-rect diffing:
    frames become independent, which is exactly what makes them
    device-batchable); identical consecutive frames still merge into the
    previous frame's duration. Lossy only, alpha ignored (opaque canvas).
    """
    if not frames:
        raise WebPError("animation: no frames")
    frames = [np.asarray(f, dtype=np.uint8)[..., :3] for f in frames]
    h, w = frames[0].shape[:2]
    if isinstance(durations, int):
        durations = [durations] * len(frames)

    # Identical-frame merge (host, cheap): keep unique runs.
    keep = []      # (frame, duration)
    for f, d in zip(frames, durations):
        if keep and np.array_equal(keep[-1][0], f):
            keep[-1] = (keep[-1][0], keep[-1][1] + d)
        else:
            keep.append((f, int(d)))

    from ..lossy.device_encode import encode_lossy_stream

    bitstreams = encode_lossy_stream([f for f, _ in keep], quality=quality,
                                     batch=batch)
    mux = Muxer()
    mux.loop_count = loop_count
    mux.canvas_width = w
    mux.canvas_height = h
    for (f, d), bits in zip(keep, bitstreams):
        mux.add_frame(MuxFrame(bitstream=bits, duration_ms=d,
                               blend=BlendMethod.NONE,
                               dispose=DisposeMethod.NONE))
    return mux.assemble()
