"""Wavefront frame renderers.

Two formulations:

1. FUSED (cfg.mode='wavefront', the production one): the fused Pallas
   path kernel IS the wavefront idea done TPU-natively — per-ray bounce
   progression inside the core with zero scatter — so wavefront mode
   rides render/megakernel.py's fused dispatch and derives the per-bounce
   live-ray occupancy telemetry from the kernel's recorded alive masks
   (render_samples_wavefront_fused). Identical radiance to megakernel
   mode by construction; the telemetry costs four lazy reductions.
2. COMPACT (cfg.mode='wavefront_compact', telemetry/debug): the literal
   per-bounce dispatch + ray-queue formulation below — the reference's
   GPU-era structure, kept as the structural analog and for foreign
   grids. On v5e its cumsum-scatter compaction floor makes it ~14x
   slower than the fused kernel (docs/PERF.md measurement correction).

The reference's wavefront branch splits the megakernel into per-bounce
dispatches with ray queues and found it "a little faster" at higher memory
cost (reference README.md:28-43). The compaction-formulation TPU analog:

  - bounce 0 runs over the full (coherent) primary-ray buffer;
  - after each bounce, live rays are compacted to a prefix with a
    cumsum-scatter (stable, preserves image-order coherence);
  - subsequent bounces process only ceil(alive / SEGMENT) fixed-size
    segments inside a lax.while_loop — dead-tail segments are never
    touched, so wall-clock tracks the live-ray count while every shape
    stays static (XLA-compatible compaction).

Radiance bookkeeping: each ray carries its pixel's flat index; bounce
contributions are scatter-added into the framebuffer, which is exactly
the forward-throughput accumulation of render/megakernel.py, so both
modes produce identical images for the same seeds (tested).

Per-bounce live-ray occupancy is reported via `occupancy_out` when
requested — the profiling signal the reference's wavefront branch was
built to expose (SURVEY.md section 5, tracing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vrv_tpu.config import RenderConfig
from vrv_tpu.ops import dda, rng, shade
from vrv_tpu.ops.camera_rays import raygen
from vrv_tpu.render.megakernel import pack_bgra

SEGMENT = 1 << 17  # rays per wavefront segment


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def render_samples_wavefront(
    grid: jax.Array,
    translucent: jax.Array,
    materials: dict,
    bvh: Optional[dict],
    bvh_max_depth: int,
    dist: Optional[jax.Array],
    inst: Optional[dict],
    rows: Optional[jax.Array],
    eye, front, right, up, frame,
    cfg: RenderConfig,
    with_occupancy: bool = False,
    proc_static=None,
    proc=None,
):
    """Sample-summed radiance (H, W, 3) float32 (divide by spp for the mean)."""
    W, H, S = cfg.width, cfg.height, cfg.samples_per_pixel
    o, d, sample_seed = raygen(
        eye, front, right, up, W, H, S, frame, jitter_scale=cfg.jitter_scale
    )
    # backend resolution, same predicate as render/megakernel.py: the
    # Mosaic kernel needs a TPU (edits ride in via the SMEM edit list)
    use_pallas = (
        cfg.tracer == "proc"
        and proc_static is not None
        and (
            cfg.proc_backend == "pallas"
            or (cfg.proc_backend == "auto" and jax.default_backend() == "tpu")
        )
    )
    # beam pre-pass (ops/dda.beam_march): primary origins advance to the
    # per-tile proven-safe depth. Unlike megakernel mode, the (origin, t)
    # pair stays self-consistent — downstream shading only ever combines
    # them as o + t * d, so no eye-relative t reconstruction is needed.
    # Skipped under the pallas backend (costs more than it saves there,
    # docs/PERF.md round-2 table).
    if (cfg.beam_prepass and dist is not None and cfg.tracer != "exact"
            and not use_pallas):
        with jax.named_scope("beam_prepass"):
            adv = dda.beam_advance(dist, eye, d)
            o = o + adv[..., None] * d
    n = S * H * W
    seg_size = min(SEGMENT, _ceil_to(n, 1024))
    n_pad = _ceil_to(n, seg_size)

    def pad(x, fill=0):
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x.reshape((n,) + x.shape[1:]), pad_width, constant_values=fill)

    o = pad(o.reshape(n, 3))
    d = pad(d.reshape(n, 3))
    seeds = pad(sample_seed.reshape(n))
    # pixel id of each ray (sample-major layout: ray r -> pixel r % (H*W))
    pix = pad(
        jnp.tile(jnp.arange(H * W, dtype=jnp.int32), (S,)), fill=0
    )
    throughput = pad(jnp.ones((n, 3), jnp.float32))
    alive_n = jnp.int32(n)

    fb = jnp.zeros((H * W, 3), jnp.float32)
    occupancy = []

    def bounce_segment(args):
        """Trace+shade one segment; returns updated segment state."""
        (seg_o, seg_d, seg_seed, seg_T, bounce) = args
        if use_pallas:
            from vrv_tpu.ops.pallas.trace_proc import trace_proc_pallas

            tr = trace_proc_pallas(
                proc_static, seg_o, seg_d, t_min=cfg.t_min, t_max=cfg.t_max,
                pd=proc,
            )
        elif cfg.tracer == "proc" and proc_static is not None:
            from vrv_tpu.ops.dda_proc import trace_proc

            tr = trace_proc(
                proc_static._replace(use_coarse=cfg.proc_coarse),
                seg_o, seg_d, t_min=cfg.t_min, t_max=cfg.t_max, pd=proc,
            )
        elif (cfg.tracer in ("rows", "proc")) and rows is not None:
            from vrv_tpu.ops.dda_rows import trace_rows_auto as trace_rows

            tr = trace_rows(
                grid.shape, rows, translucent.shape[0], seg_o, seg_d,
                t_min=cfg.t_min, t_max=cfg.t_max,
            )
        elif dist is not None and cfg.tracer != "exact":
            tr = dda.trace_skip(
                grid, dist, translucent, seg_o, seg_d,
                t_min=cfg.t_min, t_max=cfg.t_max,
            )
        else:
            tr = dda.trace(
                grid, translucent, seg_o, seg_d, t_min=cfg.t_min, t_max=cfg.t_max
            )
        bseed = rng.murmur3_combine(seg_seed, bounce.astype(jnp.uint32))
        inst_hit = None
        if inst is not None:
            from vrv_tpu.ops.instances import trace_instances

            inst_hit = trace_instances(
                seg_o, seg_d, inst["tri"], inst["valid"],
                t_min=cfg.t_min, t_max=cfg.t_max,
            )
        br = shade.do_bounce(
            seg_o, seg_d, tr, bseed, materials,
            bvh if cfg.enable_nee else None,
            sky_emission=cfg.sky_emission,
            emission_gain=cfg.emission_gain,
            nee_importance_scale=cfg.nee_importance_scale,
            nee_mis_clamp=cfg.nee_mis_clamp,
            bvh_max_depth=bvh_max_depth,
            inst=inst, inst_hit=inst_hit,
        )
        contrib = seg_T * br.emissivity
        new_T = seg_T * br.reflectivity
        return contrib, new_T, br.miss, br.new_origin, br.new_direction

    for bounce in range(cfg.max_bounces):
        if with_occupancy:
            occupancy.append(alive_n)
        n_segs_live = (alive_n + seg_size - 1) // seg_size

        def seg_body(s, carry):
            fb, o, d, seeds, throughput, alive_mask = carry
            start = s * seg_size
            seg_o = jax.lax.dynamic_slice(o, (start, 0), (seg_size, 3))
            seg_d = jax.lax.dynamic_slice(d, (start, 0), (seg_size, 3))
            seg_seed = jax.lax.dynamic_slice(seeds, (start,), (seg_size,))
            seg_T = jax.lax.dynamic_slice(throughput, (start, 0), (seg_size, 3))
            seg_pix = jax.lax.dynamic_slice(pix_cur, (start,), (seg_size,))
            seg_alive = jax.lax.dynamic_slice(alive_mask, (start,), (seg_size,))

            contrib, new_T, miss, new_o, new_d = bounce_segment(
                (seg_o, seg_d, seg_seed, seg_T, jnp.uint32(bounce))
            )
            contrib = jnp.where(seg_alive[:, None], contrib, 0.0)
            fb = fb.at[seg_pix].add(contrib)
            new_T = jnp.where(seg_alive[:, None] & ~miss[:, None], new_T, 0.0)
            o = jax.lax.dynamic_update_slice(o, new_o, (start, 0))
            d = jax.lax.dynamic_update_slice(d, new_d, (start, 0))
            throughput = jax.lax.dynamic_update_slice(throughput, new_T, (start, 0))
            alive_mask = jax.lax.dynamic_update_slice(
                alive_mask, seg_alive & ~miss, (start,)
            )
            return fb, o, d, seeds, throughput, alive_mask

        pix_cur = pix  # pixel ids as of this bounce (compaction happens after)
        alive_mask = jnp.arange(n_pad, dtype=jnp.int32) < alive_n
        fb, o, d, seeds, throughput, alive_mask = jax.lax.fori_loop(
            0, n_segs_live, seg_body, (fb, o, d, seeds, throughput, alive_mask)
        )

        if bounce == cfg.max_bounces - 1:
            break

        # --- compaction: stable scatter of live rays to a prefix ---
        live = alive_mask
        idx = jnp.cumsum(live.astype(jnp.int32)) - 1
        alive_n = jnp.maximum(idx[-1] + 1, 0) * jnp.int32(live.any())
        # dead rays scatter to index n_pad, which mode='drop' discards
        dest = jnp.where(live, idx, n_pad)

        def compact(x):
            return jnp.zeros_like(x).at[dest].set(x, mode="drop")

        o = compact(o)
        d = compact(d)
        seeds = compact(seeds)
        throughput = compact(throughput)
        pix = compact(pix)

    fb = fb.reshape(H, W, 3)
    if with_occupancy:
        return fb, jnp.stack(occupancy)
    return fb


def render_frame_wavefront(
    grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
    eye, front, right, up, frame, cfg: RenderConfig,
    proc_static=None, proc=None,
) -> jax.Array:
    fb = render_samples_wavefront(
        grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
        eye, front, right, up, frame, cfg,
        proc_static=proc_static, proc=proc,
    )
    return pack_bgra(fb / cfg.samples_per_pixel)


def render_samples_wavefront_fused(
    grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
    eye, front, right, up, frame, cfg: RenderConfig,
    with_occupancy: bool = False,
    proc_static=None, proc=None, light_tex_set=None, inst_static=None,
    light_em=None,
):
    """Fused-kernel wavefront: megakernel dispatch + occupancy telemetry.

    Sample-summed radiance (H, W, 3) float32 (divide by spp for the
    mean); with_occupancy additionally returns the (B,) per-bounce
    live-ray counts taken from the recorded alive masks — the profiling
    signal the reference's wavefront branch existed for, at zero scatter
    cost (VERDICT r2 item 6)."""
    from vrv_tpu.render import megakernel as mk

    occ = [] if with_occupancy else None
    samples = mk.render_samples(
        grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
        eye, front, right, up, frame, cfg,
        proc_static=proc_static, proc=proc, light_tex_set=light_tex_set,
        light_em=light_em,
        inst_static=inst_static, occupancy_out=occ,
    )
    fb = samples.sum(axis=0)
    if with_occupancy:
        return fb, jnp.stack(occ)
    return fb


def render_frame_wavefront_fused(
    grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
    eye, front, right, up, frame, cfg: RenderConfig,
    proc_static=None, proc=None, light_tex_set=None, inst_static=None,
    light_em=None,
) -> jax.Array:
    fb = render_samples_wavefront_fused(
        grid, translucent, materials, bvh, bvh_max_depth, dist, inst, rows,
        eye, front, right, up, frame, cfg,
        proc_static=proc_static, proc=proc, light_tex_set=light_tex_set,
        light_em=light_em,
        inst_static=inst_static,
    )
    return pack_bgra(fb / cfg.samples_per_pixel)
