"""Multi-chip sharding for the encode pipeline (jax.sharding + shard_map).

Mapping of the reference's concurrency structures (SURVEY.md §2.7) onto a
device mesh:
  - 'dp'  : image-batch data parallelism (P3/P6 analog — frames/images).
  - 'sp'  : spatial row-band parallelism (P1 wavefront analog) with a
            1-pixel-row reconstructed-context halo exchanged via
            lax.ppermute over ICI.
Histogram/probability statistics are all-reduced with psum (the ProbaStats
merge point, reference encode_proba.go:171).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import pipeline


def make_mesh(n_devices: int = None, dp: int = None) -> Mesh:
    """Builds a ('dp', 'sp') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        # Favor spatial parallelism; dp absorbs what divides the batch.
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


def make_sharded_encode_fn(mesh: Mesh, quality: int = 75):
    """Returns a pjit-ted multi-chip encode step.

    Input rgb [B, H, W, 3] is sharded batch->dp, rows->sp. Each sp shard
    encodes its row band using the reconstructed bottom row of the band
    above (ppermute halo), mirroring the reference's wavefront row pipeline
    context flow (encode_parallel.go:168-341).
    """
    qp = pipeline.quant_params(quality)
    sp_size = mesh.shape["sp"]

    def band_step(rgb_band):
        # rgb_band: [b_local, H_band, W, 3] on each device.
        B, Hb, W, _ = rgb_band.shape
        # First pass: encode with flat context to produce the halo row.
        levels, rec, halo, stats = pipeline.encode_core(rgb_band, qp)
        # Shift each band's bottom context row to the band below (ICI ring).
        perm = [(i, i + 1) for i in range(sp_size - 1)]
        top_ctx = jax.lax.ppermute(halo, "sp", perm) if sp_size > 1 else None
        if top_ctx is not None:
            idx = jax.lax.axis_index("sp")
            top_ctx = jnp.where(idx == 0, jnp.full_like(top_ctx, 127), top_ctx)
        # Second pass with real cross-band context (the wavefront step).
        levels, rec, halo, stats = pipeline.encode_core(rgb_band, qp, top_ctx)
        # Global probability statistics: all-reduce over the whole mesh.
        hist = jax.lax.psum(jax.lax.psum(stats["hist"], "sp"), "dp")
        sse = jax.lax.psum(jax.lax.psum(stats["sse_y"].sum(), "sp"), "dp")
        return levels["y1"], rec, hist, sse

    fn = shard_map(
        band_step,
        mesh=mesh,
        in_specs=(P("dp", "sp", None, None),),
        out_specs=(
            P("dp", "sp", None, None),  # levels: MB axis split over sp
            P("dp", "sp", None),   # recon rows split over sp
            P(),                    # replicated histogram
            P(),                    # replicated sse
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
        "levels": P("dp", None, "sp"),
        "recon": P("dp", "sp", None),
    }
