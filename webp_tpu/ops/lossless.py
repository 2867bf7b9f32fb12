"""Device-side VP8L transforms (JAX): the tile/row-parallel pieces of the
lossless pipeline — subtract-green both directions, cross-color inverse
and forward application, palette expansion — exact-integer mirrors of
webp_tpu.lossless.transforms (the numpy oracle).

Reference behavior: internal/dsp/lossless_dsp.go (AddGreenToBlueAndRed,
SubtractGreen, TransformColor{,Inverse}), decode_transform.go:456
(colorSpaceInverseTransform, row-parallel in the reference too). The
predictor inverse stays a host transform: its left-dependent modes make
each output pixel a function of the previous one along the row — a
serial chain per row that a TPU cannot batch (the reference also runs it
serially, decode_transform.go:202).

The split keeps bit I/O and LZ77 on the host (SURVEY.md §7) while the
whole-image pixel transforms ride the 8x128 VPU, which is where the
tile-parallel work of SURVEY §2.7 P3/P4 lands on a chip.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sub_sample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def add_green_inverse(argb: jnp.ndarray) -> jnp.ndarray:
    """r += g; b += g (mod 256): [h, w] uint32 ARGB."""
    a = argb.astype(jnp.uint32)
    g = (a >> 8) & 0xFF
    r = (((a >> 16) & 0xFF) + g) & 0xFF
    b = ((a & 0xFF) + g) & 0xFF
    return (a & jnp.uint32(0xFF00FF00)) | (r << 16) | b


def subtract_green(argb: jnp.ndarray) -> jnp.ndarray:
    """Forward transform: r -= g; b -= g (mod 256)."""
    a = argb.astype(jnp.uint32)
    g = (a >> 8) & 0xFF
    r = (((a >> 16) & 0xFF) - g) & 0xFF
    b = ((a & 0xFF) - g) & 0xFF
    return (a & jnp.uint32(0xFF00FF00)) | (r << 16) | b


def _signed8(v):
    """Low byte as int8-style signed int32."""
    v = v & 0xFF
    return v.astype(jnp.int32) - ((v.astype(jnp.int32) >> 7) << 8)


def _tile_map(tiles: jnp.ndarray, h: int, w: int, bits: int) -> jnp.ndarray:
    tx = _sub_sample_size(w, bits)
    ty = _sub_sample_size(h, bits)
    grid = tiles.reshape(ty, tx)
    return jnp.repeat(jnp.repeat(grid, 1 << bits, axis=0),
                      1 << bits, axis=1)[:h, :w]


def color_space_inverse(argb: jnp.ndarray, bits: int,
                        tiles: jnp.ndarray) -> jnp.ndarray:
    """Inverse cross-color: per-tile (g2r, g2b, r2b) multipliers applied
    per pixel (decode_transform.go:456)."""
    h, w = argb.shape
    a = argb.astype(jnp.uint32)
    tmap = _tile_map(tiles.astype(jnp.uint32), h, w, bits)
    g2r = _signed8(tmap)
    g2b = _signed8(tmap >> 8)
    r2b = _signed8(tmap >> 16)

    gs = _signed8(a >> 8)
    red = ((a >> 16) & 0xFF).astype(jnp.int32)
    blue = (a & 0xFF).astype(jnp.int32)
    red = (red + ((g2r * gs) >> 5)) & 0xFF
    blue = blue + ((g2b * gs) >> 5)
    rs = red - ((red >> 7) << 8)
    blue = (blue + ((r2b * rs) >> 5)) & 0xFF
    return ((a & jnp.uint32(0xFF00FF00))
            | (red.astype(jnp.uint32) << 16) | blue.astype(jnp.uint32))


def color_space_forward(argb: jnp.ndarray, bits: int,
                        tiles: jnp.ndarray) -> jnp.ndarray:
    """Forward cross-color application with given per-tile multipliers
    (the encoder-side transform the per-tile search emits,
    encode_predictor.go:715 — the search itself picks the multipliers;
    this applies them to every pixel)."""
    h, w = argb.shape
    a = argb.astype(jnp.uint32)
    tmap = _tile_map(tiles.astype(jnp.uint32), h, w, bits)
    g2r = _signed8(tmap)
    g2b = _signed8(tmap >> 8)
    r2b = _signed8(tmap >> 16)

    gs = _signed8(a >> 8)
    red = ((a >> 16) & 0xFF).astype(jnp.int32)
    blue = (a & 0xFF).astype(jnp.int32)
    new_red = (red - ((g2r * gs) >> 5)) & 0xFF
    rs = _signed8(a >> 16)
    blue = (blue - ((g2b * gs) >> 5) - ((r2b * rs) >> 5)) & 0xFF
    return ((a & jnp.uint32(0xFF00FF00))
            | (new_red.astype(jnp.uint32) << 16) | blue.astype(jnp.uint32))


def color_index_inverse(packed: jnp.ndarray, bits: int,
                        palette: jnp.ndarray, out_width: int) -> jnp.ndarray:
    """Palette lookup with pixel unbundling: packed [h, w] uint32 whose
    green bytes hold indices; palette [n] uint32."""
    h, w = packed.shape
    idx = ((packed.astype(jnp.uint32) >> 8) & 0xFF).astype(jnp.int32)
    n = palette.shape[0]
    if bits == 0:
        safe = jnp.where(idx < n, idx, 0)
        return jnp.where(idx < n, palette[safe], jnp.uint32(0))
    per = 1 << bits
    bpp = 8 >> bits
    mask = (1 << bpp) - 1
    shifts = (jnp.arange(per) * bpp).astype(jnp.int32)
    expanded = (idx[:, :, None] >> shifts[None, None, :]) & mask
    expanded = expanded.reshape(h, w * per)[:, :out_width]
    safe = jnp.where(expanded < n, expanded, 0)
    return jnp.where(expanded < n, palette[safe], jnp.uint32(0))


# ---------------------------------------------------------------------------
# Encoder-side per-tile predictor search (SURVEY §2.7 P4 on the chip).
#
# Exact mirror of native/src/vp8l_predictor.cc vp8l_predictor_transform
# (reference encode_predictor.go ResidualImage): interior-rule neighbors
# (missing = 0, TR at the last column = the current row's pixel 0), cost
# proxy sum(min(byte, 256-byte)) per tile per mode, ties to the lowest
# mode, then the row-0/col-0 edge overwrite. Unlike the predictor
# *inverse* (a serial left-dependency chain), the forward search predicts
# from original pixels, so all h*w*14 predictions are independent — the
# embarrassingly tile-parallel work the VPU is for.
# ---------------------------------------------------------------------------

def _channels(a: jnp.ndarray):
    """u32 ARGB [h, w] -> int32 [4, h, w] (a, r, g, b)."""
    a = a.astype(jnp.uint32)
    return jnp.stack([(a >> 24) & 0xFF, (a >> 16) & 0xFF,
                      (a >> 8) & 0xFF, a & 0xFF]).astype(jnp.int32)


def _neighbors(ch: jnp.ndarray):
    """Interior-rule L/T/TL/TR for planar channels [4, h, w]: missing
    neighbors read 0; TR at the last column wraps to the CURRENT row's
    pixel 0 (the reference's quirk), and row 0 has no above -> 0."""
    zrow = jnp.zeros_like(ch[:, :1, :])
    zcol = jnp.zeros_like(ch[:, :, :1])
    L = jnp.concatenate([zcol, ch[:, :, :-1]], axis=2)
    T = jnp.concatenate([zrow, ch[:, :-1, :]], axis=1)
    TL = jnp.concatenate([zcol, T[:, :, :-1]], axis=2)
    TR = jnp.concatenate([T[:, :, 1:], ch[:, :, :1]], axis=2)
    TR = TR.at[:, 0, :].set(0)
    return L, T, TL, TR


def _avg2(a, b):
    return (a + b) >> 1


def _predict_mode(m: int, ch, L, T, TL, TR):
    """Predicted channels [4, h, w] for mode m (int32, exact)."""
    if m == 0:
        p = jnp.zeros_like(ch)
        return p.at[0].set(255)
    if m == 1:
        return L
    if m == 2:
        return T
    if m == 3:
        return TR
    if m == 4:
        return TL
    if m == 5:
        return _avg2(_avg2(L, TR), T)
    if m == 6:
        return _avg2(L, TL)
    if m == 7:
        return _avg2(L, T)
    if m == 8:
        return _avg2(TL, T)
    if m == 9:
        return _avg2(T, TR)
    if m == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if m == 11:
        # Select: per-pixel sum over channels of |L-TL| - |T-TL|.
        pa = (jnp.abs(L - TL) - jnp.abs(T - TL)).sum(axis=0)
        return jnp.where(pa[None] <= 0, T, L)
    if m == 12:
        return jnp.clip(L + T - TL, 0, 255)
    # 13: ClampAddSubHalf with trunc-toward-zero halving of the delta.
    avg = _avg2(L, T)
    d = avg - TL
    return jnp.clip(avg + jnp.sign(d) * (jnp.abs(d) >> 1), 0, 255)


def predictor_search(argb: jnp.ndarray, bits: int):
    """Per-tile best-of-14 predictor search + residual emission on device.

    argb: u32 [h, w] (after subtract-green). Returns (residuals u32
    [h, w], tile_modes int32 [ty, tx]) bit-identical to the host
    vp8l_predictor_transform.
    """
    h, w = argb.shape
    tile = 1 << bits
    ty, tx = _sub_sample_size(h, bits), _sub_sample_size(w, bits)
    ch = _channels(argb)
    L, T, TL, TR = _neighbors(ch)

    ph, pw = ty * tile, tx * tile

    def tile_cost(res_ch):
        # cost byte = min(b, 256-b), except byte 0 costs 0.
        b = res_ch & 0xFF
        c = jnp.minimum(b, 256 - b).sum(axis=0)
        pad = jnp.zeros((ph, pw), c.dtype).at[:h, :w].set(c)
        return pad.reshape(ty, tile, tx, tile).sum(axis=(1, 3))

    costs = []
    residuals = []
    for m in range(14):
        pred = _predict_mode(m, ch, L, T, TL, TR)
        res = (ch - pred) & 0xFF
        residuals.append(res)
        costs.append(tile_cost(res))
    costs = jnp.stack(costs)                     # [14, ty, tx]
    modes = jnp.argmin(costs, axis=0).astype(jnp.int32)  # ties -> lowest

    mode_map = jnp.repeat(jnp.repeat(modes, tile, axis=0),
                          tile, axis=1)[:h, :w]
    sel = residuals[0]
    for m in range(1, 14):
        sel = jnp.where(mode_map[None] == m, residuals[m], sel)

    # Edge rules (applied after selection, matching the host order):
    # (0,0) predicts black, row 0 uses L, column 0 uses T.
    row0 = (ch[:, 0, :] - L[:, 0, :]) & 0xFF
    col0 = (ch[:, :, 0] - T[:, :, 0]) & 0xFF
    sel = sel.at[:, 0, :].set(row0)
    sel = sel.at[:, :, 0].set(col0)
    p00 = (ch[:, 0, 0] - jnp.array([255, 0, 0, 0], jnp.int32)) & 0xFF
    sel = sel.at[:, 0, 0].set(p00)

    out = ((sel[0].astype(jnp.uint32) << 24) |
           (sel[1].astype(jnp.uint32) << 16) |
           (sel[2].astype(jnp.uint32) << 8) |
           sel[3].astype(jnp.uint32))
    return out, modes
