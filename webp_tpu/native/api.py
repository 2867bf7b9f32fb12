"""ctypes bindings for the native fast paths (libwebptpu.so)."""

from __future__ import annotations

import ctypes as ct

import numpy as np

from . import loader


def _setup(lib):
    lib.bw_new.restype = ct.c_void_p
    lib.bw_free.argtypes = [ct.c_void_p]
    lib.bw_put_bit.argtypes = [ct.c_void_p, ct.c_int, ct.c_int]
    lib.bw_put_bits.argtypes = [ct.c_void_p, ct.c_uint32, ct.c_int]
    lib.bw_put_signed_bits.argtypes = [ct.c_void_p, ct.c_int, ct.c_int]
    lib.bw_size.argtypes = [ct.c_void_p]
    lib.bw_size.restype = ct.c_long
    lib.bw_finish.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_long]
    lib.bw_finish.restype = ct.c_long
    lib.bw_write_mb_modes.argtypes = [
        ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
        ct.c_int, ct.c_int, ct.c_void_p, ct.c_void_p, ct.c_int, ct.c_int,
    ]
    if hasattr(lib, "bw_write_mb_modes_seg"):
        lib.bw_write_mb_modes_seg.argtypes = [
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
            ct.c_int, ct.c_int, ct.c_void_p, ct.c_void_p, ct.c_int, ct.c_int,
            ct.c_void_p, ct.c_void_p, ct.c_int,
        ]
    lib.vp8_emit_tokens.argtypes = [
        ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
        ct.c_int, ct.c_int, ct.c_int, ct.c_int, ct.c_int, ct.c_void_p,
        ct.c_long,
    ]
    lib.vp8_emit_tokens.restype = ct.c_long
    lib.vp8_record_stats.argtypes = [
        ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
        ct.c_int, ct.c_int, ct.c_int, ct.c_void_p,
    ]
    try:
        lib.yuv_import.argtypes = [
            ct.c_void_p, ct.c_int, ct.c_int,
            ct.c_void_p, ct.c_void_p, ct.c_void_p,
        ]
    except AttributeError:  # older prebuilt .so without the symbol
        pass
    return lib


_lib = None


def get():
    global _lib
    if _lib is None:
        raw = loader.load()
        if raw is not None:
            _lib = _setup(raw)
    return _lib


def available() -> bool:
    return get() is not None


class NativeBoolWriter:
    """Drop-in replacement for bitio.bool.BoolWriter backed by C++."""

    def __init__(self):
        self._lib = get()
        self._h = self._lib.bw_new()

    def put_bit(self, prob: int, bit: int) -> int:
        self._lib.bw_put_bit(self._h, prob, 1 if bit else 0)
        return bit

    def put_bits(self, value: int, nbits: int) -> None:
        self._lib.bw_put_bits(self._h, value, nbits)

    def put_signed_bits(self, value: int, nbits: int) -> None:
        self._lib.bw_put_signed_bits(self._h, value, nbits)

    def num_bytes(self) -> int:
        return int(self._lib.bw_size(self._h))

    def write_mb_modes(self, imodes, is_i4, uvmode, skip, use_skip, skip_prob,
                       bmode_prob, tree, mb_w, mb_h, seg_map=None,
                       seg_probas=None, num_segments=1) -> None:
        if num_segments > 1:
            self._lib.bw_write_mb_modes_seg(
                self._h,
                _ptr(imodes), _ptr(is_i4), _ptr(uvmode), _ptr(skip),
                int(use_skip), int(skip_prob), _ptr(bmode_prob), _ptr(tree),
                mb_w, mb_h, _ptr(seg_map), _ptr(seg_probas),
                int(num_segments))
            return
        self._lib.bw_write_mb_modes(
            self._h,
            _ptr(imodes), _ptr(is_i4), _ptr(uvmode), _ptr(skip),
            int(use_skip), int(skip_prob), _ptr(bmode_prob), _ptr(tree),
            mb_w, mb_h)

    def finish(self) -> bytes:
        cap = self.num_bytes() + 64
        out = np.zeros(cap, dtype=np.uint8)
        n = self._lib.bw_finish(self._h, _ptr(out), cap)
        assert n >= 0
        data = bytes(out[:n].tobytes())
        self._lib.bw_free(self._h)
        self._h = None
        return data


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ct.c_void_p)


def emit_tokens(levels: np.ndarray, y2_levels: np.ndarray, is_i4: np.ndarray,
                skip: np.ndarray, proba: np.ndarray, mb_w: int, mb_h: int,
                use_skip: bool, part_idx: int, num_parts: int) -> bytes:
    lib = get()
    levels = np.ascontiguousarray(levels, dtype=np.int32)
    y2 = np.ascontiguousarray(y2_levels, dtype=np.int32)
    i4 = np.ascontiguousarray(is_i4, dtype=np.uint8)
    sk = np.ascontiguousarray(skip, dtype=np.uint8)
    pr = np.ascontiguousarray(proba, dtype=np.uint8)
    cap = levels.size * 4 + 65536
    out = np.zeros(cap, dtype=np.uint8)
    n = lib.vp8_emit_tokens(_ptr(levels), _ptr(y2), _ptr(i4), _ptr(sk),
                            _ptr(pr), mb_w, mb_h, int(use_skip), part_idx,
                            num_parts, _ptr(out), cap)
    if n < 0:
        raise RuntimeError("native token emission overflow")
    return bytes(out[:n].tobytes())


def record_stats(levels, y2_levels, is_i4, skip, mb_w, mb_h,
                 use_skip) -> np.ndarray:
    lib = get()
    levels = np.ascontiguousarray(levels, dtype=np.int32)
    y2 = np.ascontiguousarray(y2_levels, dtype=np.int32)
    i4 = np.ascontiguousarray(is_i4, dtype=np.uint8)
    sk = np.ascontiguousarray(skip, dtype=np.uint8)
    stats = np.zeros((4, 8, 3, 11, 2), dtype=np.int64)
    lib.vp8_record_stats(_ptr(levels), _ptr(y2), _ptr(i4), _ptr(sk),
                         mb_w, mb_h, int(use_skip), _ptr(stats))
    return stats


def vp8_encode_mbs(srcY, srcU, srcV, mb_w, mb_h, seg_map, quant, lambdas,
                   proba, cost_tables, method, i4_blocks, i4_header_cap):
    """Native closed-loop MB encode (mode RD + quant + reconstruction),
    bit-exact vs lossy/encode.py's Python loop. Returns dict of per-MB
    outputs + reconstructed planes, or None when unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8_encode_mbs"):
        return None
    if not getattr(lib, "_enc_loop_ready", False):
        lib.vp8_encode_mbs.argtypes = [ct.c_void_p] * 3 + [ct.c_int] * 2 + \
            [ct.c_void_p] * 8 + [ct.c_int, ct.c_int, ct.c_int64] + \
            [ct.c_void_p] * 9
        lib._enc_loop_ready = True
    from ..lossy import cost as C

    n_mb = mb_w * mb_h
    srcY = np.ascontiguousarray(srcY, dtype=np.uint8)
    srcU = np.ascontiguousarray(srcU, dtype=np.uint8)
    srcV = np.ascontiguousarray(srcV, dtype=np.uint8)
    seg = np.ascontiguousarray(seg_map, dtype=np.uint8).reshape(-1)
    quant = np.ascontiguousarray(quant, dtype=np.int64)
    lam = np.ascontiguousarray(lambdas, dtype=np.int64)
    pr = np.ascontiguousarray(proba, dtype=np.uint8)
    ctab = np.ascontiguousarray(cost_tables, dtype=np.int32)
    ec = np.ascontiguousarray(C.ENTROPY_COST, dtype=np.int32)
    lf = np.ascontiguousarray(C.LEVEL_FIXED_COSTS, dtype=np.int32)
    fc4 = np.ascontiguousarray(C.FIXED_COSTS_I4, dtype=np.int32)
    levels = np.zeros((n_mb, 24, 16), dtype=np.int32)
    y2 = np.zeros((n_mb, 16), dtype=np.int32)
    is_i4 = np.zeros(n_mb, dtype=np.uint8)
    imodes = np.zeros((n_mb, 16), dtype=np.uint8)
    uvmode = np.zeros(n_mb, dtype=np.uint8)
    skip = np.zeros(n_mb, dtype=np.uint8)
    recY = np.zeros_like(srcY)
    recU = np.zeros_like(srcU)
    recV = np.zeros_like(srcV)
    lib.vp8_encode_mbs(
        _ptr(srcY), _ptr(srcU), _ptr(srcV), mb_w, mb_h, _ptr(seg),
        _ptr(quant), _ptr(lam), _ptr(pr), _ptr(ctab), _ptr(ec), _ptr(lf),
        _ptr(fc4), int(method), int(bool(i4_blocks)), int(i4_header_cap),
        _ptr(levels), _ptr(y2), _ptr(is_i4), _ptr(imodes), _ptr(uvmode),
        _ptr(skip), _ptr(recY), _ptr(recU), _ptr(recV))
    return {"levels": levels, "y2_levels": y2, "is_i4": is_i4,
            "imodes": imodes, "uvmode": uvmode, "skip": skip,
            "recY": recY, "recU": recU, "recV": recV}


def vp8_compute_alphas(Y, U, V, mb_w, mb_h):
    """Native analysis-pass alphas -> (mixed [n_mb] i32, global_uv int),
    bit-exact vs lossy/analysis.py compute_alphas. None if unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8_compute_alphas"):
        return None
    if not getattr(lib, "_alphas_ready", False):
        lib.vp8_compute_alphas.argtypes = [ct.c_void_p] * 3 + \
            [ct.c_int] * 2 + [ct.c_void_p] * 2
        lib._alphas_ready = True
    Y = np.ascontiguousarray(Y, dtype=np.uint8)
    U = np.ascontiguousarray(U, dtype=np.uint8)
    V = np.ascontiguousarray(V, dtype=np.uint8)
    mixed = np.zeros(mb_w * mb_h, dtype=np.int32)
    guv = np.zeros(1, dtype=np.int32)
    lib.vp8_compute_alphas(_ptr(Y), _ptr(U), _ptr(V), mb_w, mb_h,
                           _ptr(mixed), _ptr(guv))
    return mixed, int(guv[0])


def _setup_dec(lib):
    if getattr(lib, "_dec_ready", False):
        return lib
    lib.vp8_decode.argtypes = [ct.c_void_p, ct.c_long] + [ct.c_void_p] * 6 + \
        [ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p]
    lib.vp8_decode.restype = ct.c_int
    lib._dec_ready = True
    return lib


def vp8_decode(data: bytes):
    """Native VP8 keyframe decode -> (Y, U, V) mb-padded planes, (w, h).
    Returns None when the native library is unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8_decode"):
        return None
    _setup_dec(lib)
    from ..lossy import tables as T
    from ..container.parser import parse_vp8_dimensions

    w, h = parse_vp8_dimensions(data)
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    Y = np.zeros((mbh * 16, mbw * 16), dtype=np.uint8)
    U = np.zeros((mbh * 8, mbw * 8), dtype=np.uint8)
    V = np.zeros((mbh * 8, mbw * 8), dtype=np.uint8)
    dims = np.zeros(4, dtype=np.int32)
    buf = np.frombuffer(data, dtype=np.uint8)
    cp = np.ascontiguousarray(T.COEFFS_PROBA0, dtype=np.uint8)
    up = np.ascontiguousarray(T.COEFFS_UPDATE_PROBA, dtype=np.uint8)
    dc = np.ascontiguousarray(T.DC_TABLE, dtype=np.int32)
    ac = np.ascontiguousarray(T.AC_TABLE, dtype=np.int32)
    bm = np.ascontiguousarray(T.BMODE_PROBA, dtype=np.uint8)
    tr = np.ascontiguousarray(T.YMODES_INTRA4_TREE, dtype=np.int8)
    rc = lib.vp8_decode(_ptr(buf), len(data), _ptr(cp), _ptr(up), _ptr(dc),
                        _ptr(ac), _ptr(bm), _ptr(tr), _ptr(Y), _ptr(U),
                        _ptr(V), _ptr(dims))
    if rc != 0:
        from ..lossy.decode import VP8Error

        raise VP8Error("vp8: native decode failed" if rc == -1
                       else "vp8: premature EOF in tokens")
    return (Y, U, V), (w, h)


def native_yuv_import(rgb: np.ndarray):
    """RGB [h, w, 3] u8 -> (Y, U, V) planes padded to MB multiples, exact
    parity with encoder.rgb_to_yuv420 (dithering=0). None if unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "yuv_import"):
        return None
    h, w = rgb.shape[:2]
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    rgb = np.ascontiguousarray(rgb[..., :3], dtype=np.uint8)
    Y = np.empty((mbh * 16, mbw * 16), dtype=np.uint8)
    U = np.empty((mbh * 8, mbw * 8), dtype=np.uint8)
    V = np.empty((mbh * 8, mbw * 8), dtype=np.uint8)
    lib.yuv_import(_ptr(rgb), h, w, _ptr(Y), _ptr(U), _ptr(V))
    return Y, U, V


def native_upsample_rgba(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                         nch: int = 4):
    """Fancy-upsampled YUV420 -> RGB(A) u8 [h, w, nch]; None if unavailable.
    Accepts row-strided plane views (e.g. crops of MB-padded planes)."""
    lib = get()
    if lib is None or not hasattr(lib, "yuv420_to_rgb_fancy"):
        return None
    if not getattr(lib, "_ups_ready", False):
        lib.yuv420_to_rgb_fancy.argtypes = [
            ct.c_void_p, ct.c_int, ct.c_void_p, ct.c_void_p, ct.c_int,
            ct.c_int, ct.c_int, ct.c_void_p, ct.c_int,
        ]
        lib._ups_ready = True
    h, w = y.shape
    assert u.strides[0] == v.strides[0] and u.strides[1] == 1
    assert y.strides[1] == 1
    out = np.empty((h, w, nch), dtype=np.uint8)
    lib.yuv420_to_rgb_fancy(_ptr(y), y.strides[0], _ptr(u), _ptr(v),
                            u.strides[0], w, h, _ptr(out), nch)
    return out


def vp8l_encode_entropy_image(argb: np.ndarray, xsize: int, quality: int,
                              is_level0: bool, method: int = 4):
    """Native entropy-coded-image emit -> (bytes, nbits); None if absent."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8l_encode_entropy_image"):
        return None
    if not getattr(lib, "_vp8l_enc_ready", False):
        lib.vp8l_encode_entropy_image.argtypes = [
            ct.c_void_p, ct.c_long, ct.c_int, ct.c_int, ct.c_int, ct.c_int,
            ct.c_void_p, ct.c_long,
        ]
        lib.vp8l_encode_entropy_image.restype = ct.c_long
        lib._vp8l_enc_ready = True
    a = np.ascontiguousarray(argb, dtype=np.uint32)
    cap = a.size * 6 + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    bits = lib.vp8l_encode_entropy_image(_ptr(a), a.size, xsize,
                                         int(quality), int(method),
                                         int(is_level0), _ptr(out), cap)
    if bits < 0:
        return None
    return out[: (bits + 7) // 8].tobytes(), int(bits)


def vp8l_predictor_transform(img: np.ndarray, bits: int):
    """Per-tile best-of-14 predictor residuals -> (out u32 [h,w],
    tile_modes i32 [ty,tx]); None if unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8l_predictor_transform"):
        return None
    if not getattr(lib, "_vp8l_pred_ready", False):
        lib.vp8l_predictor_transform.argtypes = [
            ct.c_void_p, ct.c_long, ct.c_long, ct.c_int,
            ct.c_void_p, ct.c_void_p,
        ]
        lib._vp8l_pred_ready = True
    h, w = img.shape
    img = np.ascontiguousarray(img, dtype=np.uint32)
    tile = 1 << bits
    ty, tx = (h + tile - 1) >> bits, (w + tile - 1) >> bits
    out = np.empty((h, w), dtype=np.uint32)
    modes = np.empty((ty, tx), dtype=np.int32)
    lib.vp8l_predictor_transform(_ptr(img), h, w, bits, _ptr(out), _ptr(modes))
    return out, modes


def vp8l_decode(payload: bytes):
    """Full native VP8L decode -> (argb u32 [h, w], has_alpha) or None.
    Raises BitstreamError on malformed/truncated input (parity with the
    Python decoder's validation)."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8l_decode"):
        return None
    if not getattr(lib, "_vp8l_dec_ready", False):
        lib.vp8l_decode.argtypes = [
            ct.c_void_p, ct.c_long, ct.c_void_p, ct.c_long,
            ct.POINTER(ct.c_int), ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ]
        lib.vp8l_decode.restype = ct.c_int
        lib._vp8l_dec_ready = True
    from ..lossless.decode import BitstreamError

    if len(payload) < 5 or payload[0] != 0x2F:
        raise BitstreamError("webp: bad VP8L signature")
    # Dimensions live in the first 4 bytes after the signature.
    bits = int.from_bytes(payload[1:5], "little")
    w = (bits & 0x3FFF) + 1
    h = ((bits >> 14) & 0x3FFF) + 1
    buf = np.frombuffer(payload, dtype=np.uint8)
    out = np.empty(w * h, dtype=np.uint32)
    ow = ct.c_int(); oh = ct.c_int(); oa = ct.c_int()
    rc = lib.vp8l_decode(_ptr(buf), len(payload), _ptr(out), out.size,
                         ct.byref(ow), ct.byref(oh), ct.byref(oa))
    if rc == -3:
        raise BitstreamError("webp: truncated VP8L stream")
    if rc != 0:
        raise BitstreamError("webp: malformed VP8L stream")
    return out.reshape(h, w), bool(oa.value)


def vp8l_cross_color(img: np.ndarray, bits: int):
    """Cross-color transform search+apply -> (out u32 [h,w],
    tiles u32 [ty,tx], gain_bits float); None if unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8l_cross_color"):
        return None
    if not getattr(lib, "_vp8l_cc_ready", False):
        lib.vp8l_cross_color.argtypes = [
            ct.c_void_p, ct.c_long, ct.c_long, ct.c_int,
            ct.c_void_p, ct.c_void_p,
        ]
        lib.vp8l_cross_color.restype = ct.c_double
        lib._vp8l_cc_ready = True
    h, w = img.shape
    img = np.ascontiguousarray(img, dtype=np.uint32)
    tile = 1 << bits
    ty, tx = (h + tile - 1) >> bits, (w + tile - 1) >> bits
    out = np.empty((h, w), dtype=np.uint32)
    tiles = np.empty((ty, tx), dtype=np.uint32)
    gain = lib.vp8l_cross_color(_ptr(img), h, w, bits, _ptr(out), _ptr(tiles))
    return out, tiles, float(gain)


def vp8_parse(data: bytes):
    """Parse-only native decode for the TPU reconstruction path: headers +
    token pass, exporting dequantized coefficients and per-MB info.
    Returns dict(coeffs i16 [n_mb,24,16], bnz u8 [n_mb,24],
    is_i4/uvmode/segment/has_nz u8 [n_mb], imodes u8 [n_mb,16],
    finfo i32 [1+32], dims (mb_w, mb_h, w, h)) or None when unavailable."""
    lib = get()
    if lib is None or not hasattr(lib, "vp8_parse"):
        return None
    if not getattr(lib, "_parse_ready", False):
        lib.vp8_parse.argtypes = [ct.c_void_p, ct.c_long] + \
            [ct.c_void_p] * 6 + [ct.c_void_p] * 5 + [ct.c_void_p]
        lib.vp8_parse.restype = ct.c_int
        lib._parse_ready = True
    from ..lossy import tables as T
    from ..container.parser import parse_vp8_dimensions

    w, h = parse_vp8_dimensions(data)
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    nmb = mbw * mbh
    coeffs = np.zeros((nmb, 24, 16), dtype=np.int16)
    bnz = np.zeros((nmb, 24), dtype=np.uint8)
    info = np.zeros((nmb, 4), dtype=np.uint8)
    imodes = np.zeros((nmb, 16), dtype=np.uint8)
    finfo = np.zeros(1 + 4 * 2 * 4, dtype=np.int32)
    dims = np.zeros(4, dtype=np.int32)
    buf = np.frombuffer(data, dtype=np.uint8)
    cp = np.ascontiguousarray(T.COEFFS_PROBA0, dtype=np.uint8)
    up = np.ascontiguousarray(T.COEFFS_UPDATE_PROBA, dtype=np.uint8)
    dc = np.ascontiguousarray(T.DC_TABLE, dtype=np.int32)
    ac = np.ascontiguousarray(T.AC_TABLE, dtype=np.int32)
    bm = np.ascontiguousarray(T.BMODE_PROBA, dtype=np.uint8)
    tr = np.ascontiguousarray(T.YMODES_INTRA4_TREE, dtype=np.int8)
    rc = lib.vp8_parse(_ptr(buf), len(data), _ptr(cp), _ptr(up), _ptr(dc),
                       _ptr(ac), _ptr(bm), _ptr(tr), _ptr(coeffs),
                       _ptr(bnz), _ptr(info), _ptr(imodes), _ptr(finfo),
                       _ptr(dims))
    if rc != 0:
        from ..lossy.decode import VP8Error

        raise VP8Error("vp8: native parse failed" if rc == -1
                       else "vp8: premature EOF in tokens")
    return {"coeffs": coeffs, "bnz": bnz, "is_i4": info[:, 0],
            "uvmode": info[:, 1], "segment": info[:, 2],
            "has_nz": info[:, 3], "imodes": imodes, "finfo": finfo,
            "dims": (int(dims[0]), int(dims[1]), int(dims[2]),
                     int(dims[3]))}
