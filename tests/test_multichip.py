"""Multi-chip sharding: the production two-phase encoder over a ('dp','sp')
mesh must compile, run, and produce conformant bitstreams with cross-band
halo exchange (SURVEY.md §2.7 P1 mapping)."""

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from tests.conftest import pil_decode_rgba


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse else 99.0


@pytest.fixture(scope="module")
def mesh22():
    import jax

    from webp_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh(4, dp=2)  # dp=2 x sp=2


def test_sharded_encode_bitstream_conformant(mesh22):
    from webp_tpu.parallel.mesh import (assemble_from_sharded,
                                        make_sharded_encode_fn)
    from webp_tpu.lossy.device_encode import DeviceVP8Encoder
    from webp_tpu.lossy.encode import LossyConfig
    from webp_tpu.lossy import tables as T
    from webp_tpu.container import riff as r

    img = np.array(Image.open("/root/reference/testdata/test.png")
                   .convert("RGB").resize((96, 64)))
    h, w = img.shape[:2]
    rgb = np.stack([img, img[::-1].copy()])
    step = make_sharded_encode_fn(mesh22, quality=75)
    outputs = step(rgb)
    mb_w, mb_h = w // 16, h // 16
    per_image = assemble_from_sharded(outputs, sp=2, mb_w=mb_w, mb_h=mb_h)
    for i, dat in enumerate(per_image):
        dummyY = np.zeros((h, w), np.uint8)
        dummyU = np.zeros((h // 2, w // 2), np.uint8)
        enc = DeviceVP8Encoder(dummyY, dummyU, dummyU, w, h,
                               LossyConfig(quality=75, segments=4,
                                           sns_strength=50))
        enc.proba = T.COEFFS_PROBA0.copy()
        enc.levels = dat["lv24"].astype(np.int32).reshape(mb_h, mb_w, 24, 16)
        enc.y2_levels = dat["y2"].astype(np.int32).reshape(mb_h, mb_w, 16)
        enc.imodes = dat["imodes"].reshape(mb_h, mb_w, 16).copy()
        enc.uvmode = dat["uvmodes"].reshape(mb_h, mb_w)
        enc.skip = dat["skip"].reshape(mb_h, mb_w).copy()
        enc.is_i4 = dat["is_i4"].reshape(mb_h, mb_w).copy()
        enc.apply_device_plan(dat["seg_map"], dat["seg_q"], dat["seg_beta"],
                          dq_uv=dat.get("dq_uv"))
        data = r.assemble_riff([r.Chunk(r.VP8, enc._finish_bitstream())])
        ref = pil_decode_rgba(data)[..., :3]   # libwebp decodes our bytes
        assert np.array_equal(webp_tpu.decode(data), ref)
        src = rgb[i]
        assert _psnr(src, ref) > 26, f"image {i}: {_psnr(src, ref):.2f}dB"


def test_sharded_matches_single_device_quality(mesh22):
    """Band sharding only approximates the one boundary MB row; overall
    PSNR must stay within 0.5 dB of the unsharded fast path (this tiny
    image puts 1 of its 4 MB rows on a band boundary; real images have
    ~1/16th the boundary fraction)."""
    from webp_tpu.parallel.mesh import (assemble_from_sharded,
                                        make_sharded_encode_fn)

    img = np.array(Image.open("/root/reference/testdata/test.png")
                   .convert("RGB").resize((96, 64)))
    h, w = img.shape[:2]
    single = webp_tpu.encode(img, quality=75, backend="device")
    p_single = _psnr(img, pil_decode_rgba(single)[..., :3])

    from webp_tpu.lossy.device_encode import DeviceVP8Encoder
    from webp_tpu.lossy.encode import LossyConfig
    from webp_tpu.lossy import tables as T
    from webp_tpu.container import riff as r

    step = make_sharded_encode_fn(mesh22, quality=75)
    outputs = step(np.stack([img, img]))
    mb_w, mb_h = w // 16, h // 16
    dat = assemble_from_sharded(outputs, sp=2, mb_w=mb_w, mb_h=mb_h)[0]
    dummyY = np.zeros((h, w), np.uint8)
    dummyU = np.zeros((h // 2, w // 2), np.uint8)
    enc = DeviceVP8Encoder(dummyY, dummyU, dummyU, w, h,
                           LossyConfig(quality=75, segments=4,
                                       sns_strength=50))
    enc.proba = T.COEFFS_PROBA0.copy()
    enc.levels = dat["lv24"].astype(np.int32).reshape(mb_h, mb_w, 24, 16)
    enc.y2_levels = dat["y2"].astype(np.int32).reshape(mb_h, mb_w, 16)
    enc.imodes = dat["imodes"].reshape(mb_h, mb_w, 16).copy()
    enc.uvmode = dat["uvmodes"].reshape(mb_h, mb_w)
    enc.skip = dat["skip"].reshape(mb_h, mb_w).copy()
    enc.is_i4 = dat["is_i4"].reshape(mb_h, mb_w).copy()
    enc.apply_device_plan(dat["seg_map"], dat["seg_q"], dat["seg_beta"],
                          dq_uv=dat.get("dq_uv"))
    data = r.assemble_riff([r.Chunk(r.VP8, enc._finish_bitstream())])
    p_shard = _psnr(img, pil_decode_rgba(data)[..., :3])
    assert p_shard > p_single - 0.5, f"{p_shard:.2f} vs {p_single:.2f}"


def test_sharded_sharp_yuv_compiles_and_runs():
    """The sharded step with band-local SharpYUV compiles and executes on
    the virtual mesh and produces usable levels (band-boundary chroma is a
    clamp approximation; see mesh.py docstring)."""
    import numpy as np

    from webp_tpu.parallel.mesh import make_mesh, make_sharded_encode_fn

    mesh = make_mesh(8)
    step = make_sharded_encode_fn(mesh, quality=75, sharp_yuv=True)
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    rng = np.random.default_rng(1)
    B, H, W = max(2 * dp, dp), 32 * sp, 32
    rgb = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    out = step(rgb)
    packed, hist = np.asarray(out[0]), np.asarray(out[-1])
    assert packed.shape[0] == B
    assert hist.sum() > 0


def test_production_mesh_encode_bit_identical():
    """encode_lossy_mesh (the wired production multi-chip path) emits
    bitstreams BIT-IDENTICAL to the single-chip device path and decodable
    by libwebp."""
    import io

    import jax
    from PIL import Image

    from webp_tpu.parallel.exact import encode_lossy_mesh
    from webp_tpu.lossy.device_encode import encode_lossy_batch
    from webp_tpu.container import riff as r

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >= 4 virtual devices")
    im = Image.open("/root/reference/testdata/test_color.png").convert("RGB")
    base = np.asarray(im.resize((64, 16 * 2 * 4)))
    imgs = [np.roll(base, 5 * i, axis=1) for i in range(3)]
    blobs = encode_lossy_mesh(imgs, quality=75, n_devices=4)
    single = encode_lossy_batch(np.stack(imgs), quality=75)
    assert all(a == b for a, b in zip(blobs, single))
    for blob, img in zip(blobs, imgs):
        data = r.assemble_riff([r.Chunk(r.VP8, blob)])
        ref = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.mean((ref.astype(float) - img.astype(float)) ** 2) < 300
