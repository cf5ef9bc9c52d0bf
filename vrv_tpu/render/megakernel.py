"""Fused frame renderer ("megakernel" mode).

The XLA analog of the reference's single dispatch over the whole screen
(reference src/render_system/pathtrace_shader.rs:893-950 +
interactive_rendering.rs:506): raygen, a statically unrolled bounce loop
of trace+shade over the full ray set, radiance accumulation, and BGRA u8
packing. No ray compaction — the parity-first formulation; see
render/wavefront.py for the compaction/perf mode.

Radiance accumulation is the forward-throughput equivalent of the
reference's back-to-front unroll `color = E_i + color * R_i` (:939-943):
color = sum_i E_i * prod_{j<i} R_j, with contributions masked to bounces
the reference would actually have executed (the loop breaks after a miss,
:929-932).

Output packing reproduces quirk Q3: bytes are the *linear* radiance
hard-clipped to [0,255] in BGRA order (:949); the Vulkan swapchain then
interprets them as sRGB — comparisons against reference framebuffer bytes
need no transfer function.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vrv_tpu.config import RenderConfig
from vrv_tpu.ops import dda, rng, shade
from vrv_tpu.ops.camera_rays import raygen


def render_samples(
    grid: jax.Array,
    translucent: jax.Array,
    materials: dict,
    bvh: Optional[dict],
    bvh_max_depth: int,
    dist: Optional[jax.Array],
    inst: Optional[dict],
    rows: Optional[jax.Array],
    eye: jax.Array,
    front: jax.Array,
    right: jax.Array,
    up: jax.Array,
    frame,
    cfg: RenderConfig,
    y0=0,
    local_height: int = 0,
    s0=0,
    local_spp: int = 0,
    proc_static=None,
    proc=None,
    light_tex_set=None,
    inst_static=None,
    occupancy_out=None,
    light_em=None,
) -> jax.Array:
    """Render linear radiance per sample: (spp, H, W, 3) float32.

    occupancy_out: optional list; appends the live-ray count entering
    each bounce (wavefront-mode telemetry — derived from the recorded
    alive masks, zero scatter; see render/wavefront.py).

    `eye` is in grid-local coordinates (world - grid origin); callers use
    render/scene.py which handles the shift. y0/s0 + local extents select
    a row/sample shard (see ops/camera_rays.raygen).
    """
    W = cfg.width
    H = local_height or cfg.height
    S = local_spp or cfg.samples_per_pixel
    # validate the tile knob UNCONDITIONALLY (ADVICE r4): a malformed
    # value must fail even on paths that would silently ignore it, and an
    # A/B that requests a non-default tile without the relayout
    # preconditions (tile2d + prepad) would otherwise measure the 8x128
    # layout while appearing to test the requested one
    if cfg.pallas_tile != "8x128":
        try:
            th_v, tw_v = (int(v) for v in cfg.pallas_tile.split("x"))
        except ValueError:
            raise ValueError(
                f"pallas_tile {cfg.pallas_tile!r}: expected 'THxTW'")
        if th_v * tw_v != 8 * 128:
            raise ValueError(
                f"pallas_tile {cfg.pallas_tile}: TH*TW must be 1024")
        if not (cfg.pallas_tile2d and cfg.pallas_prepad):
            import warnings

            warnings.warn(
                f"pallas_tile {cfg.pallas_tile} requested but "
                "pallas_tile2d/pallas_prepad are off — the fused kernel "
                "will run the 8x128 layout", stacklevel=2)
    # backend resolution for the proc tracer: the Mosaic kernel needs a
    # TPU; 'auto' (the default) picks it exactly there and the XLA
    # while_loop tracer everywhere else. World edits ride into the kernel
    # as an SMEM edit list (ops/pallas/trace_proc.py) — a placed or
    # broken block no longer evicts the fast tracer (the reference keeps
    # full render speed across edits too: chunk_manager.rs:331-392).
    use_pallas = (
        cfg.tracer == "proc"
        and proc_static is not None
        and (
            cfg.proc_backend == "pallas"
            or (cfg.proc_backend == "auto" and jax.default_backend() == "tpu")
        )
    )
    nee_active = bvh is not None and cfg.enable_nee
    # entity instances stay kernel-resident when every instance texture
    # has constant metallicity/alpha (inst_static carries the static
    # texture-id tuple; scene.set_instances verified the constancy) —
    # triangles ride into the fused kernel via SMEM, so the ego cube no
    # longer evicts the fast path (VERDICT r2 item 2; the reference's
    # TLAS carries entity meshes in the same kernel, scene.rs:209-386)
    inst_in_kernel = (
        inst is not None and inst_static is not None and cfg.pallas_inst
    )
    fused_candidate = (
        use_pallas
        and cfg.pallas_fused
        and (inst is None or inst_in_kernel)
        and cfg.debug_view == "none"
        and cfg.rng == "murmur3"
        and proc_static is not None
        and proc_static.lambert_only
        # air / opaque-lambert / constant-material-opaque (mirror-class,
        # ps.edit_mats) edits all stay in-kernel — placing the DEFAULT
        # mirror block (quirk Q7) no longer evicts the fast path; glass
        # still falls back (texel-varying alpha + translucent march)
        and proc_static.edits_fused
    )
    # split (shadow-ray) NEE keeps the fused kernel's cosine chain valid
    # under lights (the reference's mixture NEE redirects the continuation
    # ray, which would invalidate the recorded chain) — 'auto' switches to
    # split exactly where the fused kernel runs, so a lamp no longer
    # evicts the fast path (VERDICT r2 item 2; the reference's 28 fps
    # kernel includes NEE, pathtrace_shader.rs:779-872)
    split_nee = nee_active and (
        cfg.nee_mode == "split"
        or (cfg.nee_mode == "auto" and fused_candidate)
    )
    fused_eligible = fused_candidate and (not nee_active or split_nee)
    # sample-major ray layout for the fused kernel: flattened (H*S, W)
    # rows put the SAME 128 pixels across samples into one (8,128) block
    # (samples differ only by sub-pixel jitter -> in-block divergence
    # drops to a 128-pixel run's). Identical per-ray values either way.
    ray_layout = "hsw" if (fused_eligible and cfg.pallas_tile2d) else "shw"
    o, d, sample_seed = raygen(
        eye, front, right, up, cfg.width, cfg.height, cfg.samples_per_pixel,
        frame, jitter_scale=cfg.jitter_scale,
        y0=y0, local_height=local_height, s0=s0, local_spp=local_spp,
        layout=ray_layout,
    )
    n = S * H * W
    # beam pre-pass: camera rays share an origin, so one conservative cone
    # march per 8x8 pixel tile proves a per-ray air interval [0, adv] and
    # the real trace starts at eye + adv * d (ops/dda.beam_march).
    # Skipped for the pallas proc backend: its VMEM march resolves
    # primaries faster than the XLA cone march costs (measured 594 vs
    # 748 ms/frame — docs/PERF.md round-2 table).
    adv = None
    if (cfg.beam_prepass and dist is not None and cfg.tracer != "exact"
            and not use_pallas):
        with jax.named_scope("beam_prepass"):
            if local_height or local_spp:
                # shards must agree bit-for-bit with the single-chip render
                # on every ray, including corner-tie rays whose DDA
                # resolution legitimately depends on the advanced origin —
                # so the advance always derives from the FULL frame's tile
                # structure (replicated, cheap) and is sliced per shard
                _, d_full, _ = raygen(
                    eye, front, right, up, cfg.width, cfg.height,
                    cfg.samples_per_pixel, frame,
                    jitter_scale=cfg.jitter_scale,
                )
                adv_full = dda.beam_advance(dist, eye, d_full)
                adv = jax.lax.dynamic_slice(
                    adv_full,
                    (jnp.asarray(s0), jnp.asarray(y0), jnp.int32(0)),
                    (S, H, W),
                )
            else:
                adv = dda.beam_advance(dist, eye, d)
            adv = adv.reshape(n)
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    seeds = sample_seed.reshape(n)

    # fused path kernel (ops/pallas/path_proc.py): when no component of
    # shading needs memory inside the march (no lights, no instances,
    # lambert-only worldgen materials, murmur3 draws), trace ALL bounces
    # of every ray in one persistent-state kernel; the loop below then
    # replays shading over the recorded per-bounce hits, consuming the
    # kernel's sampled directions so the path chain is exactly what the
    # kernel marched.
    fused_traces = fused_dirs = fused_ihits = fused_nee = None
    ikr_out = None     # in-kernel-radiance records (replace the replay)
    fused_pad = None   # (Rp, Wp) when shading runs on the padded layout
    if fused_eligible:
        from vrv_tpu.ops.pallas.path_proc import trace_path_pallas

        hw = None
        tile_shape = None
        if cfg.pallas_tile2d and cfg.pallas_prepad and cfg.pallas_tile != "8x128":
            th, tw = (int(v) for v in cfg.pallas_tile.split("x"))
            if th * tw != 8 * 128:
                raise ValueError(f"pallas_tile {cfg.pallas_tile}: TH*TW must be 1024")
            tile_shape = (th, tw)
        if tile_shape is not None:
            # patch re-layout (cfg.pallas_tile): each (8,128) Mosaic block
            # carries a th x tw PIXEL PATCH — flat patch-major order makes
            # every consecutive 1024-lane slab one patch, so the kernel
            # sees hw = (nblocks*8, 128) with zero internal padding.
            # Per-ray values agree across shapes to <=1 ulp (XLA fusion
            # drift; packed frames bit-identical — tests/test_tile_shape);
            # padding pixels are degenerate rays
            th, tw = tile_shape
            R = S * H
            Hp = (R + th - 1) // th * th
            Wp = (W + tw - 1) // tw * tw

            def tile2(x):
                shaped = x.reshape((R, W) + x.shape[1:])
                shaped = jnp.pad(
                    shaped,
                    [(0, Hp - R), (0, Wp - W)] + [(0, 0)] * (x.ndim - 1),
                )
                p = shaped.reshape((Hp // th, th, Wp // tw, tw) + x.shape[1:])
                return jnp.moveaxis(p, 2, 1).reshape(
                    (Hp * Wp,) + x.shape[1:]
                )

            o = tile2(o)
            d = tile2(d)
            seeds = tile2(seeds)
            fused_pad = ("tile", th, tw, Hp, Wp)
            hw = (Hp * Wp // 128, 128)
        elif cfg.pallas_tile2d:
            # pre-pad the ray layout to the kernel's tile grid ONCE and
            # keep the WHOLE bounce loop on the padded layout (padding
            # lanes are degenerate: miss -> masked everywhere) — the
            # kernel's per-array pads and the 17 per-output slices become
            # no-ops, and one slice at the very end recovers the frame
            R = S * H
            Rp = (R + 7) // 8 * 8
            Wp = (W + 127) // 128 * 128
            if not cfg.pallas_prepad:
                Rp, Wp = R, W
            if (Rp, Wp) != (R, W):
                def pad2(x):
                    shaped = x.reshape((R, W) + x.shape[1:])
                    return jnp.pad(
                        shaped,
                        [(0, Rp - R), (0, Wp - W)] + [(0, 0)] * (x.ndim - 1),
                    ).reshape((Rp * Wp,) + x.shape[1:])

                o = pad2(o)
                d = pad2(d)
                seeds = pad2(seeds)
                fused_pad = (Rp, Wp)
            hw = (Rp, Wp)
        # in-kernel NEE: the kernel samples the flat light list and
        # marches shadow rays as sub-phases, recording (index, vis) per
        # bounce — the batched shade below then computes the direct term
        # from the same index and skips the separate shadow kernel
        nee_in_kernel = (
            split_nee
            and cfg.pallas_inkernel_nee
            and cfg.pallas_batched_shade
            and cfg.max_bounces > 1
            and bvh.get("flat") is not None
        )
        # in-kernel RADIANCE (docs/PERF.md round-5 roofline item: the 93 ms
        # of XLA glue): the kernel also resolves the hit material key, the
        # scatter-branch code, and every NEE direct-term factor except the
        # hit reflectivity texel — the XLA side below collapses to one
        # packed-atlas row fetch per bounce + the exact accumulation chain.
        # Needs the static light emissive palettes (Scene.light_em) when
        # lights are on; falls back to the trace-record replay otherwise.
        ikr = (
            cfg.pallas_inkernel_radiance
            and "packed" in materials
            and (
                not split_nee
                or cfg.max_bounces == 1
                or (nee_in_kernel and light_em is not None)
            )
        )
        if ikr:
            with jax.named_scope("fused_path_radiance"):
                ikr_out = trace_path_pallas(
                    proc_static._replace(use_coarse=False), o, d, seeds,
                    cfg.max_bounces,
                    t_min=cfg.t_min, t_max=cfg.t_max, pd=proc,
                    unroll=cfg.pallas_unroll or None,
                    hw=hw,
                    retire_cond=cfg.pallas_retire_cond,
                    inst=inst if inst_in_kernel else None,
                    inst_static=inst_static if inst_in_kernel else None,
                    step_cap=cfg.pallas_step_cap,
                    lights=(
                        bvh["flat"]
                        if (split_nee and cfg.max_bounces > 1) else None
                    ),
                    march_opt=int(cfg.pallas_march_opt),
                    radiance=True, light_em=light_em,
                    nee_scale=cfg.nee_importance_scale,
                    nee_clamp=cfg.nee_mis_clamp,
                    emission_gain=cfg.emission_gain,
                )
        else:
            with jax.named_scope("fused_path_trace"):
                # in-kernel skip certificates OFF here: measured a net
                # loss in the fused kernel (285 vs 303 ms/frame — bounce
                # rays rarely clear the certificates, so the per-step tree
                # cost dominates)
                fused_traces, fused_dirs, fused_ihits, fused_nee = \
                    trace_path_pallas(
                        proc_static._replace(use_coarse=False), o, d, seeds,
                        cfg.max_bounces,
                        t_min=cfg.t_min, t_max=cfg.t_max, pd=proc,
                        unroll=cfg.pallas_unroll or None,
                        hw=hw,
                        retire_cond=cfg.pallas_retire_cond,
                        inst=inst if inst_in_kernel else None,
                        inst_static=inst_static if inst_in_kernel else None,
                        step_cap=cfg.pallas_step_cap,
                        lights=bvh["flat"] if nee_in_kernel else None,
                        nee_pdf=cfg.pallas_nee_record_pdf,
                        march_opt=int(cfg.pallas_march_opt),
                    )
        n = o.shape[0]

    color = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)

    def trace_batch(o_tr, d_tr, hw=None, tcap=None):
        """Dispatch a flat ray batch to the configured tracer — the bounce
        traces and (split mode) the batched shadow rays use the same path.

        tcap (proc tracers): per-lane t ceiling. Shadow rays pass their
        light distance — hits beyond it cannot flip the visibility rule
        below, so the capped trace yields the identical verdict while
        skipping the march past the light (both backends honor the cap
        and produce the same `vis`)."""
        if cfg.tracer == "proc" and proc_static is not None:
            if use_pallas:
                from vrv_tpu.ops.pallas.trace_proc import trace_proc_pallas

                return trace_proc_pallas(
                    proc_static, o_tr, d_tr, t_min=cfg.t_min, t_max=cfg.t_max,
                    pd=proc,
                    unroll=cfg.pallas_unroll or None,
                    hw=hw,
                    tcap=tcap,
                    march_opt=int(cfg.pallas_march_opt),
                )
            from vrv_tpu.ops.dda_proc import trace_proc

            return trace_proc(
                proc_static._replace(use_coarse=cfg.proc_coarse),
                o_tr, d_tr, t_min=cfg.t_min, t_max=cfg.t_max, pd=proc,
                tcap=tcap,
            )
        if (cfg.tracer in ("rows", "proc")) and rows is not None:
            from vrv_tpu.ops.dda_rows import trace_rows_auto as trace_rows

            return trace_rows(
                grid.shape, rows, translucent.shape[0], o_tr, d_tr,
                t_min=cfg.t_min, t_max=cfg.t_max,
            )
        if dist is not None and cfg.tracer != "exact":
            return dda.trace_skip(
                grid, dist, translucent, o_tr, d_tr,
                t_min=cfg.t_min, t_max=cfg.t_max,
            )
        return dda.trace(
            grid, translucent, o_tr, d_tr, t_min=cfg.t_min, t_max=cfg.t_max
        )

    # ray-layout geometry for 2D image-tile blocking: each pallas block is
    # an 8 x 128 PIXEL TILE (bounce rays inherit their pixel's slot, so
    # locality persists across bounces); padded when fused_pad is set
    if fused_pad is not None and fused_pad[0] == "tile":
        layout_w = 128
    else:
        layout_w = fused_pad[1] if fused_pad is not None else W
    layout_rows = n // layout_w if cfg.pallas_tile2d else None
    hw_bounce = (layout_rows, layout_w) if cfg.pallas_tile2d else None

    # fused path: hits can only be grass/stone (lambert worldgen) -> the
    # atlas fetch rides the MXU over that small static texture set
    tex_set = None
    if (fused_traces is not None or ikr_out is not None) \
            and cfg.pallas_onehot_tex:
        blocks = {proc_static.grass, proc_static.stone}
        if proc_static.n_edits:
            # edited cells can carry any opaque-lambert block, plus the
            # mirror-class (edit_mats) and glass-class (edit_glass)
            # constant-material blocks
            blocks |= set(proc_static.lambert_blocks)
            blocks |= {b for b, _ in proc_static.edit_mats}
            blocks |= {b for b, _, _ in proc_static.edit_glass}
        tex_ids = {b * 6 + f for b in sorted(blocks) for f in range(6)}
        if inst_in_kernel:
            tex_ids |= set(inst_static[0])
        # group by atlas content (ProcStatic.tex_dedup): face ids sharing
        # one texture collapse to one fetch column — bit-identical, and
        # the (n, K, C) intermediate shrinks with K
        dd = proc_static.tex_dedup
        tex_groups: dict = {}
        for tid in sorted(tex_ids):
            canon = dd[tid] if tid < len(dd) else tid
            tex_groups.setdefault(canon, []).append(tid)
        tex_set = tuple(tuple(g) for _, g in sorted(tex_groups.items()))

    # split-NEE per-bounce records (batched shadow trace after the loop;
    # split_kvis = in-kernel NEE's recorded visibility, replacing it)
    split_T, split_direct, split_so, split_sd, split_dist = [], [], [], [], []
    split_kvis = []
    w_prev = None

    if ikr_out is not None:
        # --- in-kernel radiance: the whole resolve/shade replay collapses
        # to one packed-atlas row fetch per bounce + the exact
        # accumulation chain over the kernel's records. Formula order
        # mirrors shade.shade_resolved / the batched accumulation exactly
        # (gates: tests/test_inkernel_radiance.py). ---
        codes, cosins, srs, nrecs = ikr_out
        B = cfg.max_bounces
        pk = materials["packed"]
        packed_flat = pk.reshape(-1, pk.shape[-1])
        sky = jnp.full((n, 3), jnp.float32(cfg.sky_emission))
        directs = []
        w_prev_r = None
        for b in range(B):
            if occupancy_out is not None:
                occupancy_out.append(
                    jnp.minimum(alive.sum(), jnp.int32(S * H * W))
                )
            code = codes[b]
            hitb = (code & 1) == 1
            branch = (code >> 1) & 3
            key = (code >> 3) & 0x3FFF
            with jax.named_scope(f"ikr_fetch_b{b}"):
                if tex_set is not None:
                    # the measured-optimal 'split' fusion over the
                    # dedup'd content groups (the take() row gather paid
                    # ~20 ms/frame of layout copies — round-5 xprof)
                    row = shade._fetch_set_texel(
                        pk, key >> 8, key & 255, tex_set)
                else:
                    row = jnp.take(packed_flat, key, axis=0)
            refl = row[:, :3]
            em = row[:, 4:7]
            refl_lambert = refl / shade._PI
            e_hit = (cfg.emission_gain * em) * cosins[b][:, None]
            if split_nee and w_prev_r is not None:
                e_hit = e_hit * (1.0 - w_prev_r)[:, None]
            e_b = jnp.where(hitb[:, None], e_hit, sky)
            r_lam = refl_lambert * srs[b][:, None]
            refl_out = jnp.where(
                hitb[:, None],
                jnp.where(
                    (branch == 1)[:, None], refl,
                    jnp.where(
                        (branch == 2)[:, None], jnp.ones_like(refl), r_lam
                    ),
                ),
                0.0,
            )
            if split_nee and b < B - 1 and nrecs is not None:
                w_b, cxp_b, geo_b, ey0, ey1, ey2 = nrecs[b]
                tmp = w_b[:, None] * refl_lambert
                tmp = tmp * cxp_b[:, None]
                ey = jnp.stack([ey0, ey1, ey2], axis=-1)
                dir_b = (tmp * ey) * geo_b[:, None]
                dir_b = jnp.where((geo_b != 0.0)[:, None], dir_b, 0.0)
                directs.append(
                    (jnp.where(alive[:, None], throughput, 0.0), dir_b)
                )
                w_prev_r = w_b
            color = color + jnp.where(alive[:, None], throughput * e_b, 0.0)
            throughput = jnp.where(alive[:, None], throughput * refl_out, 0.0)
            alive = alive & hitb
        with jax.named_scope("ikr_direct_accum"):
            for T_b, dir_b in directs:
                color = color + T_b * dir_b
        bounce_range = ()
    elif fused_traces is not None and cfg.pallas_batched_shade:
        # --- batched shading over the recorded chain ---
        # Phase 1 (sequential, cheap): resolve the hit geometry per bounce
        # — the origin chain is inherently sequential (bounce b starts at
        # bounce b-1's hit point), but it is only hit merges + one 6-row
        # one-hot matmul per bounce. Phase 2: ONE shade_resolved call over
        # all NEE bounces' concatenated rows — the per-bounce texture/NEE/
        # BSDF fusions (the "~50 ms XLA glue", docs/PERF.md roadmap 2)
        # collapse into one fusion set. Row-independent math makes this
        # bit-identical to the per-bounce loop (tests/test_batched_shade.py).
        B = cfg.max_bounces
        rhs, d_list, seed_list = [], [], []
        o_b, d_b = o, d
        for b in range(B):
            with jax.named_scope(f"resolve_b{b}"):
                rhs.append(shade.resolve_hit(
                    o_b, d_b, fused_traces[b],
                    inst=inst if inst_in_kernel else None,
                    inst_hit=fused_ihits[b] if fused_ihits is not None else None,
                ))
            d_list.append(d_b)
            seed_list.append(rng.murmur3_combine(seeds, jnp.uint32(b)))
            o_b = rhs[b].new_origin
            if b + 1 < B:
                d_b = fused_dirs[b]

        def _cat(xs):
            return xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)

        def _cat_rh(idx):
            return shade.ResolvedHit(*[
                _cat([getattr(rhs[b], f) for b in idx])
                for f in shade.ResolvedHit._fields
            ])

        # the last bounce shades without NEE (split mode truncates there —
        # see the loop below), so it gets its own small call; in no-light
        # scenes one call covers every bounce
        groups = (
            [(list(range(B - 1)), bvh), ([B - 1], None)]
            if (split_nee and B > 1) else [(list(range(B)), None)]
        )
        brs = [None] * B
        for idx, bvh_g in groups:
            with jax.named_scope("shade_batched"):
                br_g = shade.shade_resolved(
                    _cat_rh(idx), _cat([d_list[b] for b in idx]),
                    _cat([seed_list[b] for b in idx]), materials, bvh_g,
                    sky_emission=cfg.sky_emission,
                    emission_gain=cfg.emission_gain,
                    nee_importance_scale=cfg.nee_importance_scale,
                    nee_mis_clamp=cfg.nee_mis_clamp,
                    bvh_max_depth=bvh_max_depth,
                    tex_set=tex_set,
                    nee_mode="split" if split_nee else "mixture",
                    w_prev=None,
                    light_tex_set=light_tex_set if split_nee else None,
                    flat_sel_idx=(
                        _cat([fused_nee[b][0] for b in idx])
                        if (fused_nee is not None and bvh_g is not None)
                        else None
                    ),
                    # with the kernel's recorded (imp_c, W) the sampler
                    # skips the whole (n, L) importance field
                    flat_sel_imp=(
                        _cat([fused_nee[b][2] for b in idx])
                        if (fused_nee is not None and bvh_g is not None
                            and len(fused_nee[0]) > 2)
                        else None
                    ),
                    flat_sel_W=(
                        _cat([fused_nee[b][3] for b in idx])
                        if (fused_nee is not None and bvh_g is not None
                            and len(fused_nee[0]) > 2)
                        else None
                    ),
                    tex_fetch=cfg.tex_fetch,
                )
            for j, b in enumerate(idx):
                brs[b] = jax.tree.map(
                    lambda x, j=j: x[j * n:(j + 1) * n], br_g
                )

        # Phase 3 (sequential, cheap): radiance accumulation — identical
        # op order to the loop below; the (1 - w_prev) emission complement
        # moves here (masked to hits, exactly the in-call multiply)
        for bounce in range(B):
            if occupancy_out is not None:
                occupancy_out.append(
                    jnp.minimum(alive.sum(), jnp.int32(S * H * W))
                )
            br = brs[bounce]
            e_b = br.emissivity
            if split_nee and w_prev is not None:
                e_b = jnp.where(
                    br.miss[:, None], e_b, e_b * (1.0 - w_prev)[:, None]
                )
            if split_nee and bounce < B - 1:
                split_T.append(jnp.where(alive[:, None], throughput, 0.0))
                split_direct.append(br.direct)
                if fused_nee is not None:
                    # in-kernel NEE already marched the shadow rays; only
                    # the recorded visibility feeds the direct term below
                    split_kvis.append(fused_nee[bounce][1])
                else:
                    split_so.append(br.new_origin)
                    split_sd.append(br.shadow_dir)
                    split_dist.append(br.shadow_dist)
            w_prev = br.w
            color = color + jnp.where(alive[:, None], throughput * e_b, 0.0)
            throughput = jnp.where(
                alive[:, None], throughput * br.reflectivity, 0.0
            )
            alive = alive & ~br.miss
        bounce_range = ()
    else:
        bounce_range = range(cfg.max_bounces)

    for bounce in bounce_range:
        if occupancy_out is not None:
            # min() strips the tile-padding lanes, which are alive until
            # bounce 0 shades them as misses (real rays never exceed S*H*W)
            occupancy_out.append(
                jnp.minimum(alive.sum(), jnp.int32(S * H * W))
            )
        # named scopes make the per-stage costs legible in xprof traces —
        # the observability the reference's wavefront branch existed for
        # (reference README.md:40-43)
        with jax.named_scope(f"trace_b{bounce}"):
            o_tr = o + adv[:, None] * d if (bounce == 0 and adv is not None) else o
            if fused_traces is not None:
                tr = fused_traces[bounce]
            else:
                tr = trace_batch(o_tr, d, hw=hw_bounce)
            if bounce == 0 and adv is not None:
                # reconstruct the absolute hit t from the original eye so the
                # result is bit-equal to an unadvanced trace (the tracer's t
                # is always (integer plane - o_axis) * (1/d_axis); recompute
                # the same expression from the eye) — keeps sharded/wavefront
                # renders byte-identical regardless of tile grouping
                axis = tr.face >> 1
                d_a = jnp.take_along_axis(d, axis[:, None], 1)[:, 0]
                o_a = jnp.take_along_axis(o, axis[:, None], 1)[:, 0]
                cell_a = jnp.take_along_axis(tr.cell, axis[:, None], 1)[:, 0]
                plane = cell_a.astype(jnp.float32) + ((d_a > 0) ^ tr.entering)
                safe_d = jnp.where(jnp.abs(d_a) < 1e-12, jnp.float32(1e-12), d_a)
                t_rec = (plane - o_a) * (1.0 / safe_d)
                tr = tr._replace(t=jnp.where(tr.hit, t_rec, tr.t + adv))
        bounce_seed = rng.murmur3_combine(seeds, jnp.uint32(bounce))
        inst_hit = None
        if fused_ihits is not None:
            # the kernel already resolved instance-vs-voxel per bounce and
            # marched the matching continuation; replay its records
            inst_hit = fused_ihits[bounce]
        elif inst is not None:
            from vrv_tpu.ops.instances import trace_instances

            with jax.named_scope(f"instances_b{bounce}"):
                inst_hit = trace_instances(
                    o, d, inst["tri"], inst["valid"], t_min=cfg.t_min, t_max=cfg.t_max
                )
        with jax.named_scope(f"shade_b{bounce}"):
            # split mode truncates NEE at the last bounce: its direct term
            # stands in for the emission the chain would collect one bounce
            # later, and the reference's loop ends here — keeping it would
            # add path-length B+1 light the mixture estimator never sees
            last = bounce == cfg.max_bounces - 1
            bvh_b = None if (split_nee and last) else (
                bvh if cfg.enable_nee else None
            )
            br = shade.do_bounce(
                o, d, tr, bounce_seed, materials,
                bvh_b,
                sky_emission=cfg.sky_emission,
                emission_gain=cfg.emission_gain,
                nee_importance_scale=cfg.nee_importance_scale,
                nee_mis_clamp=cfg.nee_mis_clamp,
                bvh_max_depth=bvh_max_depth,
                inst=inst, inst_hit=inst_hit,
                tex_set=tex_set,
                nee_mode="split" if split_nee else "mixture",
                w_prev=w_prev,
                light_tex_set=light_tex_set if split_nee else None,
                tex_fetch=cfg.tex_fetch,
            )
        if split_nee and not last:
            split_T.append(jnp.where(alive[:, None], throughput, 0.0))
            split_direct.append(br.direct)
            split_so.append(br.new_origin)
            split_sd.append(br.shadow_dir)
            split_dist.append(br.shadow_dist)
        w_prev = br.w
        if cfg.debug_view == "albedo" and bounce == 0:
            # bounce-0 reflectivity visualization: textured surfaces +
            # white sky (the faithful 1-bounce render is E-only and reads
            # as black surfaces — this is the human-checkable albedo view).
            # Reflectivity is linear (textures are sRGB-decoded at load,
            # utils.rs/block.rs semantics); re-encode to sRGB so the view
            # shows the texture art, not near-black linear values.
            albedo = jnp.where(br.miss[:, None], 1.0, br.reflectivity)
            a = jnp.clip(albedo, 0.0, 1.0)
            srgb = jnp.where(
                a <= 0.0031308, a * 12.92, 1.055 * a ** (1.0 / 2.4) - 0.055
            )
            return srgb.reshape(S, H, W, 3)
        if cfg.debug_view in ("prim", "steps", "bvhdepth") and bounce == 0:
            # debugPrim/debugBvh-style colorizers (pathtrace_shader.rs:
            # 583-599) + a march-cost heatmap for divergence work
            if cfg.debug_view == "prim":
                # hash the primitive identity to rgb: voxel face material
                # slot, or instance prim offset past the voxel id space
                pid = tr.block.astype(jnp.int32) * 6 + tr.face
                if inst_hit is not None:
                    use_i = inst_hit.hit & (~tr.hit | (inst_hit.t < tr.t))
                    pid = jnp.where(use_i, (1 << 16) + inst_hit.prim, pid)
                hseed = rng.murmur3_combine(
                    pid.astype(jnp.uint32), jnp.uint32(0x9E3779B9)
                )
                rgb = jnp.stack(
                    [
                        rng.murmur3_finalizef(
                            rng.murmur3_combine(hseed, jnp.uint32(c))
                        )
                        for c in range(3)
                    ],
                    axis=-1,
                )
                any_hit0 = tr.hit if inst_hit is None else (
                    tr.hit | inst_hit.hit
                )
                dbg = jnp.where(any_hit0[:, None], rgb, 0.0)
            elif cfg.debug_view == "steps":
                # cell-crossing count from the (grid-clamped) origin to
                # the hit / grid exit — the geometric march cost a DDA
                # pays before skips; tails in this map are the
                # silhouette/grazing rays that bound fused-block cost
                size = jnp.asarray(grid.shape, jnp.float32)
                safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
                t0s = (0.0 - o) / safe_d
                t1s = (size[None, :] - o) / safe_d
                t_exit = jnp.minimum(
                    jnp.maximum(t0s, t1s).min(-1), jnp.float32(cfg.t_max)
                )
                t_end = jnp.where(tr.hit, tr.t, jnp.maximum(t_exit, 0.0))
                p0 = jnp.clip(o, 0.0, size[None, :] - 1e-3)
                p1 = jnp.clip(
                    o + t_end[:, None] * d, 0.0, size[None, :] - 1e-3
                )
                steps = jnp.abs(
                    jnp.floor(p1) - jnp.floor(p0)
                ).sum(-1)
                x = jnp.clip(steps / jnp.float32(grid.shape[0]), 0.0, 1.0)
                # blue -> green -> red ramp
                dbg = jnp.stack(
                    [
                        jnp.clip(2.0 * x - 1.0, 0.0, 1.0),
                        1.0 - jnp.abs(2.0 * x - 1.0),
                        jnp.clip(1.0 - 2.0 * x, 0.0, 1.0),
                    ],
                    axis=-1,
                )
            else:  # bvhdepth
                if bvh is None:
                    dbg = jnp.zeros((n, 3), jnp.float32)
                else:
                    from vrv_tpu.ops.nee import traverse as _nee_traverse

                    fn0 = (tr.face[:, None] == jnp.arange(6)[None, :]).astype(
                        jnp.float32
                    )
                    nrm = jnp.dot(
                        fn0, jnp.asarray(dda.FACE_NORMALS),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    res = _nee_traverse(
                        br.new_origin, nrm,
                        rng.murmur3_combine(bounce_seed, 2), bvh,
                        bvh_max_depth,
                    )
                    x = res.depth.astype(jnp.float32) / jnp.float32(
                        max(1, bvh_max_depth)
                    )
                    dbg = jnp.where(
                        (tr.hit & res.success)[:, None],
                        jnp.stack([x, 1.0 - x, 0.5 * x], axis=-1),
                        0.0,
                    )
            return dbg.reshape(S, H, W, 3)
        color = color + jnp.where(alive[:, None], throughput * br.emissivity, 0.0)
        throughput = jnp.where(alive[:, None], throughput * br.reflectivity, 0.0)
        alive = alive & ~br.miss
        o = br.new_origin
        if fused_traces is not None and bounce + 1 < cfg.max_bounces:
            # the direction the kernel actually marched for the next bounce
            d = fused_dirs[bounce]
        else:
            d = br.new_direction

    if split_nee and split_direct:
        b_s = len(split_direct)
        if split_kvis:
            # in-kernel NEE already marched every shadow ray as a kernel
            # sub-phase; consume its recorded visibility bits
            vis = jnp.concatenate(split_kvis)
        else:
            # one batched shadow trace for ALL bounces: shadow rays are
            # independent of path continuation, so they never gate the
            # chain — a single kernel launch over (B-1)*n rays instead of
            # a per-bounce trace (the per-launch overhead is what killed
            # the staged path)
            with jax.named_scope("nee_shadow_trace"):
                so_cat = jnp.concatenate(split_so)
                sd_cat = jnp.concatenate(split_sd)
                dist_cat = jnp.concatenate(split_dist)
                hw_shadow = (
                    (b_s * layout_rows, layout_w) if cfg.pallas_tile2d
                    else None
                )
                eps = 1e-3 + 1e-3 * dist_cat
                sh = trace_batch(so_cat, sd_cat, hw=hw_shadow,
                                 tcap=dist_cat - eps)
                # visible iff nothing resolves strictly before the light
                # point (the shadow ray's own hit on the sampled lamp face
                # lands at t == dist up to fp error)
                vis = (~sh.hit) | (sh.t >= dist_cat - eps)
                if inst is not None:
                    # entity instances occlude shadow rays too (the
                    # reference's redirected NEE ray traverses the full
                    # TLAS incl. entity BLASes, pathtrace_shader.rs:652-686)
                    from vrv_tpu.ops.instances import trace_instances

                    ish = trace_instances(
                        so_cat, sd_cat, inst["tri"], inst["valid"],
                        t_min=cfg.t_min, t_max=cfg.t_max,
                    )
                    vis = vis & ~(ish.hit & (ish.t < dist_cat - eps))
        with jax.named_scope("nee_direct_accum"):
            vis3 = vis.astype(jnp.float32)[:, None]
            for b in range(b_s):
                color = color + (
                    split_T[b] * split_direct[b] * vis3[b * n:(b + 1) * n]
                )

    if fused_pad is not None and fused_pad[0] == "tile":
        _, th, tw, Hp, Wp = fused_pad
        p = color.reshape(Hp // th, Wp // tw, th, tw, 3)
        color = jnp.moveaxis(p, 1, 2).reshape(Hp, Wp, 3)[: S * H, :W]
        color = color.reshape(-1, 3)
    elif fused_pad is not None:
        Rp, Wp = fused_pad
        color = color.reshape(Rp, Wp, 3)[: S * H, :W].reshape(-1, 3)
    if ray_layout == "hsw":
        return color.reshape(H, S, W, 3).transpose(1, 0, 2, 3)
    return color.reshape(S, H, W, 3)


def pack_bgra(pixel_color: jax.Array) -> jax.Array:
    """(H, W, 3) linear rgb -> (H, W, 4) u8 BGRA, hard clip (quirk Q3)."""
    c = jnp.nan_to_num(pixel_color, nan=0.0, posinf=255.0, neginf=0.0)
    bgr = jnp.clip(c[..., ::-1] * 255.0, 0.0, 255.0).astype(jnp.uint8)
    a = jnp.full(bgr.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([bgr, a], axis=-1)


def render_frame(
    grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
    eye, front, right, up, frame, cfg: RenderConfig,
    proc_static=None, proc=None, light_tex_set=None, inst_static=None,
    light_em=None,
) -> jax.Array:
    """Full frame: average samples, pack BGRA u8 (H, W, 4)."""
    samples = render_samples(
        grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
        eye, front, right, up, frame, cfg,
        proc_static=proc_static, proc=proc, light_tex_set=light_tex_set,
        inst_static=inst_static, light_em=light_em,
    )
    return pack_bgra(samples.mean(axis=0))
