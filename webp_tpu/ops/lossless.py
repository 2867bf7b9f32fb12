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
