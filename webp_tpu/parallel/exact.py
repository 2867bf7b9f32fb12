"""Exact multi-chip closed loop: band-pipelined phase 2 over image streams.

`make_sharded_encode_fn` (mesh.py) approximates the band boundary: each
band's first MB row predicts from the *source* pixel row above. This module
removes the approximation the way a TPU pipeline should — not by
synchronizing bands per wavefront step (which would put every ICI hop on
the critical path), but by pipelining bands over a STREAM of images, the
multi-chip analog of the reference's Phase A/Phase B overlap
(encode_parallel.go:238-246):

  Phase A (parallel): YUV import, segmentation (alpha histograms psum'd
    over 'sp' per image), I16/UV mode search and the I4 subblock search
    run for ALL images at once, each band extended with a 16-pixel source
    halo row so every mode decision sees exactly the context the
    single-chip encoder sees.

  Phase B (pipelined): a lax.scan over T = B + sp - 1 steps. At step t,
    device s runs the closed-loop wavefront for band s of image t-s, using
    the RECONSTRUCTED bottom rows of band s-1 (same image) that arrived
    over ICI at the end of step t-1. Steady-state efficiency approaches
    sp/(1 + (sp-1)/B): every chip busy, one ppermute per step off the
    critical path.

The result is bit-identical to the single-chip `fast_encode_fn` output
(asserted in tests/test_exact_pipeline.py): phase-1 context, segment plans
and phase-2 reconstruction all match exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import fastpath as fp
from ..ops import i4 as I4


def make_pipeline_mesh(n_devices: int = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("sp",))


def _pass_down(x, sp):
    """One ICI hop toward higher band index (band s -> s+1)."""
    if sp == 1:
        return jnp.zeros_like(x)
    return jax.lax.ppermute(x, "sp", [(i, i + 1) for i in range(sp - 1)])


def make_exact_encode_fn(mesh: Mesh, n_images: int, quality: int = 75,
                         segments: int = 4, sns_strength: int = 50,
                         i4_blocks: bool = True, rd_drop: float = 1024.0):
    """Jitted exact multi-chip encode over rgb [B, H, W, 3] uint8.

    B = n_images (static), H must divide by 16 * sp. Returns the same
    output tuple layout as make_sharded_encode_fn with the batch dim
    unsharded (assemble with assemble_from_sharded after inserting the
    batch axis handling there expects).
    """
    sp = mesh.shape["sp"]
    B = n_images
    rt = fp.RateTables(np.asarray(fp.T.COEFFS_PROBA0))

    def band_prog(rgb_local):
        # rgb_local: [B, Hb, W, 3] on each device (band of every image).
        from ..ops import yuv as devyuv

        idx = jax.lax.axis_index("sp")
        has_above = idx > 0
        Bn, Hb, W, _ = rgb_local.shape
        mb_w, mb_h = W // 16, Hb // 16
        n_mb = mb_w * mb_h
        esc_cap = max(1024, fp.ESC_BLOCKS_PER_MB * n_mb)

        Yb, Ub, Vb = jax.vmap(devyuv.rgb_to_yuv420)(rgb_local)
        Y = Yb.astype(jnp.int32)
        U = Ub.astype(jnp.int32)
        V = Vb.astype(jnp.int32)

        # Source halo band: the last 16 luma / 8 chroma pixel rows of the
        # band above (per image), one hop down. Mode search on the first
        # MB row runs on a 2-MB-row extension so it sees the exact
        # single-chip context.
        ext_y = _pass_down(Y[:, -16:], sp)
        ext_u = _pass_down(U[:, -8:], sp)
        ext_v = _pass_down(V[:, -8:], sp)

        # --- Phase 0: segmentation (global per image). ---
        if segments > 1 and n_mb * sp >= 4:
            def plan_one(y, u, v):
                alphas, uv_al = fp._mb_alphas2(y, u, v, mb_w, mb_h)
                histo = (alphas[None, :] == jnp.arange(256)[:, None]).sum(1)
                histo = jax.lax.psum(histo, "sp")
                # Image-global mean UV alpha (feeds dq_uv_ac); the sum is
                # all-reduced so every band derives the identical delta.
                guv = jax.lax.psum(uv_al.sum(), "sp") // (n_mb * sp)
                return fp._plan_from_histo(histo, alphas, quality,
                                           sns_strength, segments) + (guv,)

            seg_map, seg_q, seg_beta, guv_b = jax.vmap(plan_one)(Y, U, V)
            sns_i = max(0, int(sns_strength))
            dq_dc, dq_ac = fp._uv_deltas(guv_b, sns_i)          # [B]
            qp_b, lam_b, seg_rows = jax.vmap(
                lambda sm, sq, da: fp._mb_quant(sm, sq, n_mb,
                                                dq_uv=(dq_dc, da)))(
                seg_map, seg_q, dq_ac)
            dq_uv_b = jnp.stack([jnp.full((B,), dq_dc, jnp.int32),
                                 dq_ac.astype(jnp.int32)], axis=1)
            use_seg = True
        else:
            qp_i, lam_i = fp.rd_params(quality)
            _, tlsd_static = fp._tlsd_static(
                max(0, int(sns_strength)), lam_i["q_i4"], n_mb)
            lam_i = {k: jnp.float32(v) for k, v in lam_i.items()}
            seg_map = jnp.zeros((B, n_mb), jnp.int32)
            seg_q = jnp.zeros((B, 4), jnp.int32)
            seg_beta = jnp.zeros((B, 4), jnp.int32)
            dq_uv_b = jnp.zeros((B, 2), jnp.int32)
            use_seg = False

        sns = max(0, int(sns_strength))

        # --- Phase 1: mode search, exact context via the extension. ---
        def p1_one(y, u, v, ey, eu, ev, qp1, lam1, qp_top, lam_top,
                   tlsd1=None, tlsd_top=None):
            modes, uvmodes, i16s = fp._phase1(y, u, v, qp1, lam1, rt,
                                              mb_w, mb_h, tlsd=tlsd1)
            # 2-MB-row extended run for the band's first MB row.
            y2r = jnp.concatenate([ey, y[:16]], axis=0)
            u2r = jnp.concatenate([eu, u[:8]], axis=0)
            v2r = jnp.concatenate([ev, v[:8]], axis=0)
            m_t, uvm_t, i16s_t = fp._phase1(y2r, u2r, v2r, qp_top, lam_top,
                                            rt, mb_w, 2, tlsd=tlsd_top)
            row0 = jnp.arange(n_mb) < mb_w
            modes = jnp.where(row0 & has_above,
                              jnp.pad(m_t[mb_w:], (0, n_mb - mb_w)), modes)
            uvmodes = jnp.where(row0 & has_above,
                                jnp.pad(uvm_t[mb_w:], (0, n_mb - mb_w)),
                                uvmodes)
            i16s = jnp.where(row0 & has_above,
                             jnp.pad(i16s_t[mb_w:], (0, n_mb - mb_w)), i16s)

            if not i4_blocks:
                return (modes, uvmodes,
                        jnp.zeros((n_mb,), bool),
                        jnp.zeros((n_mb, 16), jnp.uint8))
            src_b = fp._block(y.reshape(mb_h, 16, mb_w, 16)
                              .transpose(0, 2, 1, 3)
                              .reshape(n_mb, 16, 16), 16)
            is_i4, i4m, _ = I4.i4_search(
                y, src_b, qp1["y1"], lam1["i4"], rt, mb_w, mb_h, i16s,
                fp.approx_block_rate, tlsd=tlsd1,
                lam_mode=lam1.get("mode", lam1["i4"]))
            src_b2 = fp._block(y2r.reshape(2, 16, mb_w, 16)
                               .transpose(0, 2, 1, 3)
                               .reshape(2 * mb_w, 16, 16), 16)
            qp1_top = qp_top
            is_i4_t, i4m_t, _ = I4.i4_search(
                y2r, src_b2, qp1_top["y1"], lam_top["i4"], rt, mb_w, 2,
                i16s_t, fp.approx_block_rate, tlsd=tlsd_top,
                lam_mode=lam_top.get("mode", lam_top["i4"]))
            is_i4 = jnp.where(row0 & has_above,
                              jnp.pad(is_i4_t[mb_w:], (0, n_mb - mb_w)),
                              is_i4)
            i4m = jnp.where((row0 & has_above)[:, None],
                            jnp.pad(i4m_t[mb_w:], ((0, n_mb - mb_w),
                                                   (0, 0))), i4m)
            return modes, uvmodes, is_i4, i4m

        if use_seg:
            # Per-MB quant rows for the extended top run: first MB row's
            # rows reused for the halo row (mode search only; the halo
            # row's own results are discarded).
            def qp_top_of(qp1):
                return {k: tuple(
                    jnp.concatenate([a[:mb_w], a[:mb_w]], axis=0)
                    for a in qp1[k]) for k in ("y1", "y2", "uv")}

            def lam_top_of(lam1):
                return {k: jnp.concatenate([v[:mb_w], v[:mb_w]])
                        if hasattr(v, "ndim") and v.ndim == 1 else v
                        for k, v in lam1.items()}

            def tlsd_of(sq, sm):
                if sns <= 0:
                    return None
                return fp._tlsd_from_seg(sns, sq, sm)[1]

            def run_one(y, u, v, ey, eu, ev, qp1, lam1, sq, sm):
                t1 = tlsd_of(sq, sm)
                tt = (jnp.concatenate([t1[:mb_w], t1[:mb_w]])
                      if t1 is not None else None)
                return p1_one(y, u, v, ey, eu, ev, qp1, lam1,
                              qp_top_of(qp1), lam_top_of(lam1),
                              tlsd1=t1, tlsd_top=tt)

            modes, uvmodes, is_i4, i4m = jax.vmap(run_one)(
                Y, U, V, ext_y, ext_u, ext_v, qp_b, lam_b, seg_q, seg_map)
        else:
            modes, uvmodes, is_i4, i4m = jax.vmap(
                lambda y, u, v, ey, eu, ev: p1_one(
                    y, u, v, ey, eu, ev, qp_i, lam_i, qp_i, lam_i,
                    tlsd1=tlsd_static, tlsd_top=tlsd_static)
            )(Y, U, V, ext_y, ext_u, ext_v)

        # --- Phase B: pipelined closed loop. ---
        T = B + sp - 1

        def step(carry, t):
            hy, hu, hv = carry
            i = jnp.clip(t - idx, 0, B - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, i, axis=0, keepdims=False)
            seg_arg = None
            qp_arg = None if use_seg else qp_i
            if use_seg:
                seg_arg = (take(seg_map),
                           {k: take(seg_rows[k]) for k in seg_rows})
            lv24, y2, botY, _, botU, botV = fp._phase2(
                take(Y), take(U), take(V), take(modes), take(uvmodes),
                qp_arg, mb_w, mb_h, rd_drop=rd_drop,
                halos=(hy, hu, hv), has_above=has_above,
                seg=seg_arg, i4=(take(is_i4), take(i4m)))
            new = (_pass_down(botY[n_mb - mb_w:].reshape(-1), sp),
                   _pass_down(botU[n_mb - mb_w:].reshape(-1), sp),
                   _pass_down(botV[n_mb - mb_w:].reshape(-1), sp))
            return new, (lv24, y2)

        z = Y[0, 0, 0] * 0
        carry0 = (jnp.zeros((mb_w * 16,), jnp.int32) + z,
                  jnp.zeros((mb_w * 8,), jnp.int32) + z,
                  jnp.zeros((mb_w * 8,), jnp.int32) + z)
        _, (lv_t, y2_t) = jax.lax.scan(step, carry0, jnp.arange(T))

        # Device s produced image i at step i + s.
        sel = idx + jnp.arange(B)
        lv24 = jnp.take(lv_t, sel, axis=0)          # [B, n_mb, 24, 16]
        y2 = jnp.take(y2_t, sel, axis=0)

        packed, esc_idx, esc_val, esc_cnt = jax.vmap(
            lambda l: fp._pack_levels(l, esc_cap))(lv24)
        skip = (lv24 == 0).all(axis=(-2, -1)) & (y2 == 0).all(axis=-1)
        imodes = jnp.where(is_i4[..., None], i4m,
                           jnp.concatenate(
                               [modes[..., None],
                                jnp.zeros((B, n_mb, 15), jnp.uint8)],
                               axis=-1))
        hist = jnp.histogram(jnp.abs(lv24).astype(jnp.int32), bins=16,
                             range=(0, 16))[0]
        hist = jax.lax.psum(hist, "sp")
        return (packed, esc_idx, esc_val, esc_cnt[:, None], y2, modes,
                uvmodes, skip, is_i4, imodes, seg_map.astype(jnp.uint8),
                seg_q, seg_beta, dq_uv_b, hist)

    fn = shard_map(
        band_prog,
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),),
        out_specs=(
            P(None, "sp", None, None),   # packed
            P(None, "sp"),               # escape indices
            P(None, "sp", None),         # escape blocks
            P(None, "sp"),               # escape counts
            P(None, "sp", None),         # y2
            P(None, "sp"),               # modes
            P(None, "sp"),               # uv modes
            P(None, "sp"),               # skip
            P(None, "sp"),               # is_i4
            P(None, "sp", None),         # imodes
            P(None, "sp"),               # segment map
            P(None, None),               # segment quant indices
            P(None, None),               # segment betas
            P(None, None),               # UV quant deltas
            P(),                         # histogram
        ),
        check_rep=False,
    )

    @jax.jit
    def run(rgb):
        assert rgb.shape[0] == B, (rgb.shape, B)
        return fn(rgb)

    return run


_STEP_CACHE: dict = {}


def encode_lossy_mesh(images, quality: int = 75, segments: int = 4,
                      sns_strength: int = 50, n_devices: int = None,
                      true_width: int = None, true_height: int = None):
    """Production multi-chip lossy encode: band-pipelined exact closed
    loop over all available devices + host entropy coding. Output
    bitstreams are BIT-IDENTICAL to the single-chip device path
    (tests/test_exact_pipeline.py / test_multichip.py assert it).

    images: list/array of same-shaped RGB uint8 [H, W, 3] with H a
    multiple of 16*sp. Returns list[bytes] VP8 frames.
    """
    from ..lossy.encode import LossyConfig
    from .mesh import assemble_from_sharded

    rgbs = np.stack([np.asarray(im)[..., :3] for im in images])
    B, H, W = rgbs.shape[:3]
    mesh = make_pipeline_mesh(n_devices)
    sp = mesh.shape["sp"]
    if H % (16 * sp):
        raise ValueError(f"height {H} must divide by 16*sp={16 * sp}")
    key = (sp, B, H, W, quality, segments, sns_strength)
    step = _STEP_CACHE.get(key)
    if step is None:
        step = make_exact_encode_fn(mesh, B, quality=quality,
                                    segments=segments,
                                    sns_strength=sns_strength)
        _STEP_CACHE[key] = step
    outputs = step(rgbs)
    mb_w, mb_h = W // 16, H // 16
    per_image = assemble_from_sharded(outputs, sp=sp, mb_w=mb_w, mb_h=mb_h)
    cfg = LossyConfig(quality=quality, segments=segments,
                      sns_strength=sns_strength)
    tw, th = true_width or W, true_height or H
    from ..lossy import tables as T
    from ..lossy.device_encode import DeviceVP8Encoder

    blobs = []
    for d in per_image:
        # assemble_from_sharded already unpacked the levels; feed them to
        # the host emitter directly.
        dummyY = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        dummyU = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        enc = DeviceVP8Encoder(dummyY, dummyU, dummyU, tw, th, cfg)
        enc.proba = T.COEFFS_PROBA0.copy()
        enc.levels = d["lv24"].astype(np.int32).reshape(mb_h, mb_w, 24, 16)
        enc.y2_levels = d["y2"].astype(np.int32).reshape(mb_h, mb_w, 16)
        enc.imodes = d["imodes"].reshape(mb_h, mb_w, 16).copy()
        enc.uvmode = d["uvmodes"].reshape(mb_h, mb_w)
        enc.skip = d["skip"].reshape(mb_h, mb_w).copy()
        enc.is_i4 = d["is_i4"].reshape(mb_h, mb_w).copy()
        enc.apply_device_plan(d["seg_map"], d["seg_q"], d["seg_beta"],
                              dq_uv=d.get("dq_uv"))
        blobs.append(enc._finish_bitstream())
    return blobs
