"""Device VP8 decode (ops/decode.py): bit-exact vs the native/host decoder
through the public API, across filter types, I4/I16 mixes and odd sizes.
Reference parity targets: internal/lossy/decode_frame.go:83 (recon),
:293 (loop filter), internal/dsp/upsample.go:45 (fancy upsample)."""

import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu


@pytest.fixture(scope="module")
def base():
    return np.array(
        Image.open("/root/reference/testdata/test.png").convert("RGB"))


@pytest.mark.parametrize("size,quality", [((120, 90), 50), ((64, 48), 85)])
def test_device_decode_matches_host(base, size, quality):
    img = np.array(Image.fromarray(base).resize(size))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", quality=quality)
    data = buf.getvalue()
    host = webp_tpu.decode(data)
    dev = webp_tpu.decode(data, backend="device")
    assert np.array_equal(host, dev)


def test_device_decode_odd_size(base):
    img = np.array(Image.fromarray(base).resize((33, 17)))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", quality=40)
    data = buf.getvalue()
    assert np.array_equal(webp_tpu.decode(data),
                          webp_tpu.decode(data, backend="device"))


def test_device_decode_own_bitstream(base):
    """Our device-encoded bitstream through the device decoder."""
    img = np.array(Image.fromarray(base).resize((96, 64)))
    data = webp_tpu.encode(img, quality=70, backend="device")
    assert np.array_equal(webp_tpu.decode(data),
                          webp_tpu.decode(data, backend="device"))


def test_device_decode_planes_exact(base):
    """Pre-upsample planes match the native decoder exactly (the strict
    recon + loop-filter writeback check)."""
    from webp_tpu.container.parser import Parser
    from webp_tpu.lossy.device_decode import decode_vp8_yuv_device
    from webp_tpu.lossy.decode import decode_vp8_yuv

    img = np.array(Image.fromarray(base).resize((120, 90)))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", quality=30, method=6)
    data = Parser(buf.getvalue()).frames()[0].bitstream
    dev = decode_vp8_yuv_device(data)
    host = decode_vp8_yuv(data)
    for a, b in zip(dev, host):
        assert np.array_equal(a, b)


def test_device_decode_stream(base):
    from webp_tpu.container.parser import Parser
    from webp_tpu.lossy.device_decode import decode_lossy_stream_device

    img = np.array(Image.fromarray(base).resize((64, 48)))
    datas = []
    for q in (40, 60, 80):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="WEBP", quality=q)
        datas.append(Parser(buf.getvalue()).frames()[0].bitstream)
    outs = decode_lossy_stream_device(datas)
    for data, rgb in zip(datas, outs):
        from webp_tpu.lossy.decode import decode_vp8_rgba

        assert np.array_equal(rgb, decode_vp8_rgba(data)[..., :3])
