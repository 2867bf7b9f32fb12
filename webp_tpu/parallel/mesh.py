"""Multi-chip sharding for the encode pipeline (jax.sharding + shard_map).

Mapping of the reference's concurrency structures (SURVEY.md §2.7) onto a
device mesh:
  - 'dp' : image-batch data parallelism (P3/P6 analog — frames/images).
  - 'sp' : spatial row-band parallelism (P1 wavefront analog). Each band
           runs the production two-phase encoder (ops/fastpath); the
           1-pixel source context row + corner crossing the band boundary
           travels via lax.ppermute over ICI — one hop, no per-step
           synchronization, because phase 1 searches modes against source
           pixels and phase 2's closed loop is internal to the band (the
           band's first MB row predicts from the source halo; see
           fastpath._phase2 for the one-row approximation note).
Level-histogram statistics are all-reduced with psum over the whole mesh
(the ProbaStats merge point, reference encode_proba.go:171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import fastpath


def make_mesh(n_devices: int = None, dp: int = None) -> Mesh:
    """Builds a ('dp', 'sp') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 1
        for cand in (4, 2, 1):
            if n % cand == 0 and cand <= n:
                dp = cand if n // cand >= 1 else 1
                break
        if n % dp:
            dp = 1
    sp = n // dp
    grid = np.array(devs).reshape(dp, sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def make_sharded_encode_fn(mesh: Mesh, quality: int = 75,
                           segments: int = 4, sns_strength: int = 50,
                           i4_blocks: bool = True, sharp_yuv: bool = False):
    """Returns a jitted multi-chip encode step over rgb [B, H, W, 3] uint8.

    B must divide by mesh 'dp', H by 16 * mesh 'sp'. Runs the full flagship
    config per band: device segmentation (alpha histograms all-reduced over
    'sp' so every band derives the identical global plan), I16+I4 search,
    closed-loop wavefront. Output levels stay sharded (batch over dp, MB
    rows over sp); the level histogram is replicated.

    sharp_yuv runs the SharpYUV refinement band-locally: each band refines
    its own rows with clamp semantics at the band boundary (the same
    approximation class as the 1-row reconstruction halo — a few boundary
    pixels of chroma differ from the single-chip result, conformance is
    unaffected).
    """
    rt = fastpath.RateTables(np.asarray(fastpath.T.COEFFS_PROBA0))
    sp_size = mesh.shape["sp"]

    def band_fn(rgb_band):
        # rgb_band: [b_local, H_band, W, 3] on each device.
        if sharp_yuv:
            from ..ops import sharpyuv as devsharp

            Y, U, V = jax.vmap(devsharp.sharp_yuv420)(rgb_band)
        else:
            from ..ops import yuv as devyuv

            Y, U, V = jax.vmap(devyuv.rgb_to_yuv420)(rgb_band)
        b, Hb, W = Y.shape
        mb_w, mb_h = W // 16, Hb // 16

        # Cross-band source context: bottom pixel rows ride one ICI hop.
        def pass_down(row):
            if sp_size == 1:
                return jnp.zeros_like(row)
            perm = [(i, i + 1) for i in range(sp_size - 1)]
            return jax.lax.ppermute(row, "sp", perm)

        hy = pass_down(Y[:, -1, :])
        hu = pass_down(U[:, -1, :])
        hv = pass_down(V[:, -1, :])
        has_above = jax.lax.axis_index("sp") > 0

        esc_cap = max(1024, fastpath.ESC_BLOCKS_PER_MB * mb_w * mb_h)
        out = jax.vmap(
            lambda y, u, v, a, bb, c: fastpath.encode_band(
                y, u, v, a, bb, c, has_above, rt, mb_w, mb_h, esc_cap,
                quality, segments, sns_strength, i4_blocks,
                psum_axis="sp")
        )(Y, U, V, hy, hu, hv)
        # Mesh-wide probability statistics (psum over sp then dp).
        hist = jax.lax.psum(jax.lax.psum(out.pop("hist").sum(0), "sp"), "dp")
        return (out["packed"], out["esc_idx"], out["esc_val"],
                out["esc_cnt"][:, None], out["y2"], out["modes"],
                out["uvmodes"], out["skip"], out["is_i4"], out["imodes"],
                out["seg_map"], out["seg_q"], out["seg_beta"],
                out["dq_uv"], hist)

    fn = shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(P("dp", "sp", None, None),),
        out_specs=(
            P("dp", "sp", None, None),   # packed nibble planes
            P("dp", "sp"),               # escape block indices
            P("dp", "sp", None),         # escape blocks
            P("dp", "sp"),               # escape counts (per band)
            P("dp", "sp", None),         # y2
            P("dp", "sp"),               # modes
            P("dp", "sp"),               # uv modes
            P("dp", "sp"),               # skip
            P("dp", "sp"),               # is_i4
            P("dp", "sp", None),         # imodes
            P("dp", "sp"),               # segment map
            P("dp", None),               # segment quant indices (replicated/sp)
            P("dp", None),               # segment betas
            P("dp", None),               # UV quant deltas
            P(),                         # replicated histogram
        ),
    )

    @jax.jit
    def step(rgb):
        return fn(rgb)

    return step


def training_step_spec(mesh: Mesh):
    """Input/output shardings for the multi-chip step (for inspection)."""
    return {
        "rgb": P("dp", "sp", None, None),
        "levels_packed": P("dp", "sp", None, None),
        "modes": P("dp", "sp"),
        "histogram": P(),
    }


def assemble_from_sharded(outputs, sp: int, mb_w: int, mb_h: int):
    """Host-side: turns the sharded step's outputs into per-image level
    arrays (numpy). Escape indices are band-local, so unpacking happens
    per band before stitching."""
    import numpy as np

    from ..ops.fastpath import unpack_levels

    (packed, esc_idx, esc_val, esc_cnt, y2, modes, uvm, skip, is_i4,
     imodes, seg_map, seg_q, seg_beta, dq_uv, hist) = [np.asarray(o)
                                                       for o in outputs]
    B = packed.shape[0]
    n_mb = mb_w * mb_h
    n_loc = n_mb // sp
    cap = esc_idx.shape[1] // sp
    out = []
    for b in range(B):
        lv = np.empty((n_mb, 24, 16), np.int16)
        for s in range(sp):
            sl = slice(s * n_loc, (s + 1) * n_loc)
            cnt = int(esc_cnt[b, s])
            if cnt > cap:
                # A band overflowed its escape budget: unpack_levels would
                # silently decode the unrecovered blocks as all-zero levels
                # (corrupt image). Mirror the single-chip paths, which
                # detect cnt > esc_cap and fall back to the exact host
                # encoder (lossy/device_encode.py).
                raise OverflowError(
                    f"escape-block overflow in band {s} of image {b}: "
                    f"{cnt} > capacity {cap}; re-encode on the host path")
            lv[sl] = unpack_levels(
                packed[b, sl], esc_idx[b, s * cap:(s + 1) * cap],
                esc_val[b, s * cap:(s + 1) * cap], esc_cnt[b, s], n_loc)
        out.append({"lv24": lv, "y2": y2[b], "modes": modes[b],
                    "uvmodes": uvm[b], "skip": skip[b], "is_i4": is_i4[b],
                    "imodes": imodes[b], "seg_map": seg_map[b],
                    "seg_q": seg_q[b][:4], "seg_beta": seg_beta[b][:4],
                    "dq_uv": dq_uv[b][:2]})
    return out
