"""Tier-5 tests (SURVEY.md §4): fuzz-style corrupt-input handling,
deterministic output, and concurrency determinism (the reference's
race_test.go analog)."""

import concurrent.futures
import io

import numpy as np
import pytest
from PIL import Image

import webp_tpu
from webp_tpu.container.riff import WebPError


@pytest.fixture(scope="module")
def photo():
    return np.array(Image.open("/root/reference/testdata/test.png")
                    .convert("RGB").resize((64, 48)))


@pytest.fixture(scope="module")
def valid_files(photo):
    rgba = np.dstack([photo, np.full(photo.shape[:2], 200, np.uint8)])
    return [
        webp_tpu.encode(photo, quality=60),
        webp_tpu.encode(photo, lossless=True),
        webp_tpu.encode(rgba, quality=60),
    ]


def test_fuzz_decode_mutations(valid_files):
    """Randomly corrupted files must raise WebPError subclasses or decode
    to SOME image — never crash the process or loop forever."""
    rng = np.random.default_rng(42)
    for data in valid_files:
        buf = bytearray(data)
        for trial in range(60):
            b = bytearray(buf)
            n_mut = int(rng.integers(1, 8))
            for _ in range(n_mut):
                pos = int(rng.integers(0, len(b)))
                b[pos] = int(rng.integers(0, 256))
            try:
                out = webp_tpu.decode_rgba(bytes(b))
                assert out.dtype == np.uint8
            except (WebPError, ValueError, IndexError, KeyError, OverflowError):
                pass


def test_fuzz_truncations(valid_files):
    for data in valid_files:
        for cut in range(0, len(data), max(1, len(data) // 23)):
            try:
                webp_tpu.decode_rgba(data[:cut])
            except (WebPError, ValueError, IndexError, KeyError, OverflowError):
                pass


def test_encode_deterministic(photo):
    a = webp_tpu.encode(photo, quality=75)
    b = webp_tpu.encode(photo, quality=75)
    assert a == b
    a = webp_tpu.encode(photo, lossless=True)
    b = webp_tpu.encode(photo, lossless=True)
    assert a == b


def test_concurrent_encode_determinism(photo):
    """16 concurrent encodes must produce byte-identical output
    (race_test.go:33-60 analog — shared tables/caches must be read-only)."""
    expected = webp_tpu.encode(photo, quality=70)

    def worker(_):
        return webp_tpu.encode(photo, quality=70)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(worker, range(16)))
    assert all(r == expected for r in results)


def test_concurrent_decode_determinism(valid_files):
    data = valid_files[0]
    expected = webp_tpu.decode_rgba(data)

    def worker(_):
        return webp_tpu.decode_rgba(data)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(worker, range(16)))
    assert all(np.array_equal(r, expected) for r in results)


def test_roundtrip_fuzz_random_images():
    rng = np.random.default_rng(7)
    for _ in range(6):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        data = webp_tpu.encode(img, lossless=True, exact=True)
        out = webp_tpu.decode_rgba(data)
        assert np.array_equal(out, img)


def test_rate_control_targets(photo):
    data = webp_tpu.encode(photo, target_size=1200)
    assert len(data) <= 1300  # small tolerance over the budget
    from webp_tpu import encoder as E

    data = webp_tpu.encode(photo, target_psnr=26.0)
    assert E.LAST_STATS.psnr >= 25.5


def test_fuzz_whole_files_never_crash():
    """Mutated/truncated whole WebP files through the public decode API:
    every outcome must be a decode or a WebPError, never a crash/hang
    (FuzzDecode analog at the container level)."""
    import io

    import numpy as np
    from PIL import Image

    import webp_tpu

    rng = np.random.default_rng(5)
    img = Image.open("/root/reference/testdata/test.png")
    files = []
    b = io.BytesIO(); img.convert("RGB").resize((48, 32)).save(b, "WEBP", quality=70)
    files.append(bytearray(b.getvalue()))
    b = io.BytesIO(); img.convert("RGBA").resize((40, 28)).save(b, "WEBP", lossless=True)
    files.append(bytearray(b.getvalue()))
    b = io.BytesIO()
    frames = [img.convert("RGBA").resize((32, 24)) for _ in range(3)]
    frames[0].save(b, "WEBP", save_all=True, append_images=frames[1:],
                   duration=50)
    files.append(bytearray(b.getvalue()))
    for payload in files:
        for _ in range(80):
            mut = bytearray(payload)
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
            try:
                webp_tpu.decode(bytes(mut))
            except webp_tpu.WebPError:
                pass
        for cut in range(0, len(payload), 13):
            try:
                webp_tpu.decode(bytes(payload[:cut]))
            except webp_tpu.WebPError:
                pass
