"""Mux/demux round-trips (reference tier: mux/mux_test.go, 1059 LoC):
frame metadata survives assemble -> demux, metadata chunks round-trip,
canvas inference, error paths, and Pillow accepts every assembly."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.container.parser import Parser
from webp_tpu.container.riff import BlendMethod, DisposeMethod, WebPError
from webp_tpu.mux.mux import Demuxer, Muxer, MuxFrame


def _lossless_frame(w, h, color):
    from webp_tpu.lossless.encode import encode_vp8l

    img = np.full((h, w, 3), color, np.uint8)
    return MuxFrame(bitstream=encode_vp8l(img, quality=75, method=2),
                    is_lossless=True)


def _lossy_frame(w, h, seed=0):
    from webp_tpu.container.parser import Parser as P

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    data = webp_tpu.encode(img, quality=60)
    return MuxFrame(bitstream=P(data).frames()[0].bitstream,
                    is_lossless=False)


def test_muxer_accessors_and_clamping():
    """API-surface parity (mux.go:85-185): duration/loop clamping, blend
    accessor, num_frames, add_chunk routing, canvas priority."""
    m = Muxer()
    m.add_frame(_lossless_frame(8, 8, 10))
    m.add_frame(_lossless_frame(8, 8, 20))
    assert m.num_frames() == 2
    m.set_frame_duration(0, -5)
    assert m.frame_duration(0) == 0
    m.set_frame_duration(1, 1 << 30)
    assert m.frame_duration(1) == (1 << 24) - 1
    assert m.frame_blend_mode(0) == BlendMethod.ALPHA
    m.set_loop_count(1 << 20)
    assert m.loop_count == (1 << 16) - 1
    m.add_chunk(b"ICCP", b"icc")
    m.add_chunk(b"EXIF", b"Exif\x00\x00x")
    m.add_chunk(b"XMP ", b"<x/>")
    assert (m.iccp, m.exif, m.xmp) == (b"icc", b"Exif\x00\x00x", b"<x/>")
    with pytest.raises(WebPError):
        m.add_chunk(b"JUNK", b"zz")
    # Explicit canvas takes priority over frame extents...
    m.set_canvas_size(32, 32)
    data = m.assemble()
    d = Demuxer(data)
    assert (d.features.width, d.features.height) == (32, 32)
    # ...and a frame exceeding the explicit canvas fails validation.
    m.set_canvas_size(4, 4)
    with pytest.raises(WebPError):
        m.assemble()


def test_demuxer_loop_count_background_color():
    m = Muxer()
    for c in (10, 80):
        m.add_frame(_lossless_frame(8, 8, c))
    m.set_loop_count(7)
    m.bgcolor = 0x80FF00FF
    d = Demuxer(m.assemble())
    assert d.loop_count() == 7
    assert d.background_color() == 0x80FF00FF
    still = Muxer()
    still.add_frame(_lossless_frame(8, 8, 10))
    d2 = Demuxer(still.assemble())
    assert d2.loop_count() == 0 and d2.background_color() == 0


@pytest.mark.parametrize("lossless", [False, True])
def test_encode_with_metadata(lossless):
    """Encoder-level metadata (reference webp_test.go
    TestEncodeWithMetadata_Lossy/_Lossless): iccp/exif/xmp ride the VP8X
    container, flags are set, blobs round-trip, and Pillow still decodes
    the pixels and reads the ICC profile."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
    icc = b"\x00\x00\x02\x00fake-icc" + bytes(500)
    exif = b"Exif\x00\x00II*\x00" + bytes(16)
    xmp = b"<x:xmpmeta xmlns:x='adobe:ns:meta/'/>"
    data = webp_tpu.encode(img, lossless=lossless, quality=80,
                           iccp=icc, exif=exif, xmp=xmp)
    f = webp_tpu.get_features(data)
    assert f.has_iccp and f.has_exif and f.has_xmp
    d = Demuxer(data)
    assert (d.iccp, d.exif, d.xmp) == (icc, exif, xmp)
    pil = Image.open(io.BytesIO(data))
    assert pil.info.get("icc_profile") == icc
    got = np.array(pil.convert("RGB"))
    if lossless:
        assert np.array_equal(got, img)
    else:
        assert got.shape == img.shape


def test_encode_with_large_icc():
    """1 MB ICC blob (webp_test.go TestEncodeWithMetadata_LargeICC)."""
    img = np.full((16, 16, 3), 77, np.uint8)
    icc = bytes(range(256)) * 4096  # 1 MiB
    data = webp_tpu.encode(img, lossless=True, iccp=icc)
    assert Demuxer(data).iccp == icc
    assert np.array_equal(np.array(Image.open(io.BytesIO(data))
                                   .convert("RGB")), img)


def test_single_lossless_simple_format():
    m = Muxer()
    m.add_frame(_lossless_frame(16, 16, 30))
    data = m.assemble()
    assert data[12:16] == b"VP8L"
    Image.open(io.BytesIO(data)).load()


def test_animation_roundtrip_metadata():
    m = Muxer()
    for i, (x, y, dur, disp, blend) in enumerate([
            (0, 0, 40, DisposeMethod.NONE, BlendMethod.NONE),
            (16, 8, 70, DisposeMethod.BACKGROUND, BlendMethod.ALPHA),
            (2, 4, 1000, DisposeMethod.NONE, BlendMethod.ALPHA)]):
        f = _lossless_frame(32, 24, 50 + i * 40)
        f.x_offset, f.y_offset = x, y
        f.duration_ms = dur
        f.dispose = disp
        f.blend = blend
        m.add_frame(f)
    m.loop_count = 5
    m.canvas_width, m.canvas_height = 64, 48
    data = m.assemble()
    d = Demuxer(data)
    assert d.num_frames() == 3
    feats = d.features
    assert (feats.canvas_width, feats.canvas_height) == (64, 48)
    assert feats.loop_count == 5
    for i, fr in enumerate(d.frames()):
        assert (fr.x_offset, fr.y_offset) == [(0, 0), (16, 8), (2, 4)][i]
        assert fr.duration_ms == [40, 70, 1000][i]
        assert fr.dispose == [DisposeMethod.NONE, DisposeMethod.BACKGROUND,
                              DisposeMethod.NONE][i]
        assert fr.blend == [BlendMethod.NONE, BlendMethod.ALPHA,
                            BlendMethod.ALPHA][i]
    im = Image.open(io.BytesIO(data))
    assert im.n_frames == 3


def test_metadata_chunks_roundtrip():
    m = Muxer()
    m.add_frame(_lossless_frame(8, 8, 99))
    m.iccp = b"fake-icc-profile-bytes"
    m.exif = b"Exif\x00\x00fake"
    m.xmp = b"<x:xmpmeta/>"
    data = m.assemble()
    d = Demuxer(data)
    assert d.iccp == m.iccp
    assert d.exif == m.exif
    assert d.xmp == m.xmp
    Image.open(io.BytesIO(data)).load()


def test_canvas_inference():
    m = Muxer()
    f = _lossless_frame(20, 10, 1)
    f.x_offset, f.y_offset = 12, 6
    m.add_frame(f)
    m.add_frame(_lossless_frame(8, 30, 2))
    data = m.assemble()
    feats = Demuxer(data).features
    assert (feats.canvas_width, feats.canvas_height) == (32, 30)


def test_odd_offsets_rejected():
    m = Muxer()
    f = _lossless_frame(8, 8, 0)
    f.x_offset = 3
    with pytest.raises(WebPError):
        m.add_frame(f)


def test_empty_muxer_rejected():
    with pytest.raises(WebPError):
        Muxer().assemble()


def test_lossy_alpha_split():
    """Lossy frame + ALPH payload produce a VP8X container with the
    alpha flag; our decoder and Pillow agree on the pixels."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 32, 4), np.uint8)
    img[..., 3] = 255
    img[4:12, 4:20, 3] = 128
    data = webp_tpu.encode(img, quality=80)
    assert data[12:16] == b"VP8X"
    ours = webp_tpu.decode(data)
    ref = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    assert np.array_equal(ours, ref)
    d = Demuxer(data)
    assert d.features.has_alpha


def test_demuxer_get_chunk():
    m = Muxer()
    m.add_frame(_lossless_frame(8, 8, 7))
    m.exif = b"Exif\x00\x00x"
    data = m.assemble()
    assert Demuxer(data).get_chunk(b"EXIF") == b"Exif\x00\x00x"
    assert Demuxer(data).get_chunk(b"ICCP") is None
