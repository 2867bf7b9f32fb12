"""gwebp-equivalent CLI: enc / dec / info subcommands.

Parity with /root/reference/cmd/gwebp/main.go: encode (PNG/JPEG/GIF ->
WebP, animated GIF -> ANIM), decode (WebP -> PNG, animated WebP -> GIF),
info (container summary). stdin/stdout via '-'.

Usage:
  python -m webp_tpu.cli enc [-q N] [-m N] [-lossless] [-sharp_yuv] ... in out
  python -m webp_tpu.cli dec in out
  python -m webp_tpu.cli info in
"""

from __future__ import annotations

import argparse
import io
import sys

import numpy as np


def _read(path: str) -> bytes:
    if path == "-":
        return sys.stdin.buffer.read()
    with open(path, "rb") as f:
        return f.read()


def _write(path: str, data: bytes) -> None:
    if path == "-":
        sys.stdout.buffer.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


def cmd_enc(args) -> int:
    from PIL import Image

    import webp_tpu
    from .animation.animation import AnimEncoder, AnimEncodeOptions

    raw = _read(args.input)
    im = Image.open(io.BytesIO(raw))
    is_anim = getattr(im, "is_animated", False)

    if is_anim:
        # GIF (or any animated input) -> animated WebP with full compositing.
        opts = AnimEncodeOptions(lossless=args.lossless, quality=args.q,
                                 method=args.m,
                                 loop_count=im.info.get("loop", 0))
        w, h = im.size
        enc = AnimEncoder(w, h, opts)
        for i in range(im.n_frames):
            im.seek(i)
            dur = int(im.info.get("duration", 100)) or 100
            enc.add_frame(np.array(im.convert("RGBA")), dur)
        _write(args.output, enc.assemble())
        return 0

    arr = np.array(im.convert("RGBA" if "A" in im.getbands() else "RGB"))
    # Preset defaults first, explicit flags override (cwebp semantics;
    # reference cmd/gwebp/main.go:115-140).
    from .encoder import PRESETS, WebPError

    if args.preset not in PRESETS:
        print(f"enc: unknown preset {args.preset!r}", file=sys.stderr)
        return 2
    kw = dict(PRESETS[args.preset])
    kw.update(lossless=args.lossless, quality=args.q, method=args.m,
              use_sharp_yuv=args.sharp_yuv, exact=args.exact,
              alpha_quality=args.alpha_q, partitions=args.partitions,
              target_size=args.size, target_psnr=args.psnr,
              filter_sharpness=args.sharpness, preprocessing=args.pre,
              near_lossless=args.near_lossless,
              alpha_compression=args.alpha_method,
              autofilter=args.af, partition_limit=args.partition_limit,
              backend=args.backend)
    if args.f >= 0:
        kw["filter_strength"] = args.f
    if args.sns >= 0:
        kw["sns_strength"] = args.sns
    if args.segments >= 0:
        kw["segments"] = args.segments
    if args.passes >= 0:
        kw["pass_count"] = args.passes
    if args.alpha_filter:
        kw["alpha_filtering"] = {"none": 0, "fast": 1,
                                 "best": 2}[args.alpha_filter]
    if args.nostrong:
        kw["filter_type"] = 0
    data = webp_tpu.encode(arr, **kw)
    _write(args.output, data)
    return 0


def cmd_dec(args) -> int:
    from PIL import Image

    import webp_tpu
    from .container.parser import get_features

    data = _read(args.input)
    f = get_features(data)
    if f.has_anim:
        from .animation.animation import decode_animation, AnimDecoder

        anim = decode_animation(data)
        dec = AnimDecoder(anim)
        frames = []
        durations = []
        for canvas, dur in dec:
            frames.append(Image.fromarray(canvas))
            durations.append(max(dur, 10))
        buf = io.BytesIO()
        frames[0].save(buf, format="GIF", save_all=True,
                       append_images=frames[1:], duration=durations,
                       loop=anim.loop_count, disposal=2)
        _write(args.output, buf.getvalue())
        return 0

    fmt = (args.fmt or "").lower() or (
        "jpeg" if args.output.lower().endswith((".jpg", ".jpeg")) else "png")
    img = (webp_tpu.decode(data) if fmt == "jpeg"
           else webp_tpu.decode_rgba(data) if f.has_alpha
           else webp_tpu.decode(data))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format=fmt.upper())
    _write(args.output, buf.getvalue())
    return 0


def cmd_info(args) -> int:
    from .container.parser import Parser

    data = _read(args.input)
    p = Parser(data)
    f = p.features
    print(f"format:      {f.format.name}")
    print(f"dimensions:  {f.width}x{f.height}")
    print(f"alpha:       {f.has_alpha}")
    print(f"animation:   {f.has_anim}")
    if f.has_anim:
        print(f"frames:      {len(p.frames())}")
        print(f"loop count:  {f.loop_count}")
    meta = [name for name, present in
            (("ICCP", f.has_iccp), ("EXIF", f.has_exif), ("XMP", f.has_xmp))
            if present]
    print(f"metadata:    {', '.join(meta) if meta else 'none'}")
    print(f"file size:   {len(data)} bytes")
    print("chunks:      " + " ".join(
        f"{c.tag.decode('ascii', 'replace').strip()}({len(c.payload)})"
        for c in p.chunks()))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="webp_tpu",
                                 description="TPU-native WebP codec CLI")
    sub = ap.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("enc", help="encode image to WebP")
    enc.add_argument("-q", type=float, default=75, help="quality 0-100")
    enc.add_argument("-m", type=int, default=4, help="method 0-6")
    enc.add_argument("-lossless", action="store_true")
    enc.add_argument("-preset", default="default",
                     help="default/picture/photo/drawing/icon/text")
    enc.add_argument("-sharp_yuv", action="store_true")
    enc.add_argument("-exact", action="store_true")
    enc.add_argument("-size", type=int, default=0,
                     help="target size in bytes (0=use quality)")
    enc.add_argument("-psnr", type=float, default=0.0,
                     help="target PSNR in dB (0=use quality)")
    enc.add_argument("-sns", type=int, default=-1,
                     help="spatial noise shaping 0-100 (-1=preset)")
    enc.add_argument("-f", type=int, default=-1,
                     help="filter strength 0-100 (-1=preset)")
    enc.add_argument("-sharpness", type=int, default=0,
                     help="filter sharpness 0-7")
    enc.add_argument("-strong", action="store_true",
                     help="strong filter (default)")
    enc.add_argument("-nostrong", action="store_true",
                     help="simple filter instead of strong")
    enc.add_argument("-segments", type=int, default=-1,
                     help="segments 1-4 (-1=preset)")
    enc.add_argument("-pass", dest="passes", type=int, default=-1,
                     help="analysis passes 1-10 (-1=default)")
    enc.add_argument("-alpha_q", type=int, default=100)
    enc.add_argument("-alpha_method", type=int, default=1,
                     help="alpha compression 0-1")
    enc.add_argument("-alpha_filter", default="",
                     help="alpha filter: none/fast/best")
    enc.add_argument("-pre", type=int, default=0,
                     help="pre-processing filter 0-3")
    enc.add_argument("-near_lossless", type=int, default=100,
                     help="near-lossless strength 0-100")
    enc.add_argument("-partitions", type=int, default=0)
    enc.add_argument("-af", action="store_true",
                     help="autofilter: search the loop-filter strength")
    enc.add_argument("-partition_limit", type=int, default=0,
                     help="0-100: degrade I4 headers to fit partition 0")
    enc.add_argument("-backend", default="host",
                     choices=("host", "device", "auto"),
                     help="encode backend (device = TPU wavefront)")
    enc.add_argument("input")
    enc.add_argument("output")
    enc.set_defaults(fn=cmd_enc)

    dec = sub.add_parser("dec", help="decode WebP to PNG (or GIF if animated)")
    dec.add_argument("-fmt", default="",
                     help="output format: png/jpeg (default: by extension)")
    dec.add_argument("input")
    dec.add_argument("output")
    dec.set_defaults(fn=cmd_dec)

    info = sub.add_parser("info", help="show WebP file info")
    info.add_argument("input")
    info.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
