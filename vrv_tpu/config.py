"""Configuration dataclasses + CLI.

The reference has no config system at all — every knob is a compile-time
constant (reference src/render_system/pathtrace_shader.rs:890-891 spp/bounces,
src/game_system/chunk.rs:13-15 chunk size, src/game_system/chunk_manager.rs:30-37
render radii, src/game_system/ego_controls_manager.rs:141-143 movement).
Here those constants become one dataclass with the reference values as
defaults; spp is a real runtime knob (bucketed jit) rather than the
reference's dead `samples` push constant (pathtrace_shader.rs:71 is ignored
by the kernel loop at :907).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Knobs of the path-trace kernel suite.

    Defaults mirror the reference's compile-time constants:
      - samples_per_pixel / max_bounces: pathtrace_shader.rs:890-891
      - sky_emission: pathtrace_shader.rs:701 (vec3(50))
      - emission_gain: pathtrace_shader.rs:754 (1000 * tex * cos)
      - nee_mis_clamp / nee_importance_scale: pathtrace_shader.rs:788
        (clamp(importance / 10, 0, 0.5))
      - t_min / t_max: pathtrace_shader.rs:653-654 (EPSILON_BLOCK, 1000)
      - jitter_scale: pathtrace_shader.rs:915-919 (0.01 / screen axis)
    """

    width: int = 800
    height: int = 600
    samples_per_pixel: int = 4
    max_bounces: int = 4
    sky_emission: float = 50.0
    emission_gain: float = 1000.0
    nee_importance_scale: float = 10.0
    nee_mis_clamp: float = 0.5
    t_min: float = 0.001          # EPSILON_BLOCK, pathtrace_shader.rs:14
    t_max: float = 1000.0
    jitter_scale: float = 0.01
    enable_nee: bool = True       # do_nee flag, pathtrace_shader.rs:924 passes true
    # NEE estimator: 'mixture' = the reference's one-sample MIS (the
    # continuation ray is redirected at the light with probability w,
    # pathtrace_shader.rs:775-872); 'split' = shadow-ray NEE (continuation
    # stays cosine-sampled; direct light rides independent shadow rays) —
    # same mean, compatible with the fused Pallas path kernel's recorded
    # chain; 'auto' = split exactly where the fused kernel runs, mixture
    # everywhere else (so CPU/staged renders keep reference semantics).
    # Statistical agreement gated in tests/test_nee_split.py.
    nee_mode: str = "auto"
    # fused path kernel: keep constant-material entity instances IN the
    # kernel (SMEM triangles + in-kernel scatter) instead of evicting to
    # the staged kernels (render/megakernel.py inst_in_kernel)
    pallas_inst: bool = True
    # per-ray RNG: 'murmur3' (bit-exact with the reference) or 'pcg'
    rng: str = "murmur3"
    # voxel tracer: 'proc' = gather-free procedural re-evaluation of the
    # worldgen function per step (ops/dda_proc.py; falls back to 'rows'
    # when the scene's grid is not worldgen+edits-derived), 'rows' =
    # 8-cell row fetches packed along each ray's dominant axis
    # (pack_rows_3axis), 'skip' = per-cell DDA with distance-field
    # skipping, 'exact' = plain DDA (oracle). 'rows' falls back to 'skip'
    # when no row table exists (grid depth not a multiple of the row
    # width). 'proc' is the production default: measured 2.1x faster
    # frames than 'rows' on v5e, 3.8x with the pallas backend
    # (docs/PERF.md round-2 table).
    tracer: str = "proc"
    # with tracer='proc': consult the coarse 8^3-block distance table for
    # multi-cell air skips (one-hot MXU read). Off = pure fine stepping.
    proc_coarse: bool = True
    # with tracer='proc': 'xla' = lax.while_loop tracer (edit-capable,
    # CPU-runnable), 'pallas' = VMEM-resident Mosaic kernel
    # (ops/pallas/trace_proc.py; edit-free worlds, TPU only — falls back
    # to 'xla' when edits exist), 'auto' = pallas exactly when on TPU
    # with an edit-free world, xla otherwise
    proc_backend: str = "auto"
    # with the pallas backend: fuse all bounces into one persistent-ray
    # path kernel when eligible (no lights/instances/edits, lambert-only
    # worldgen, murmur3) — ops/pallas/path_proc.py. A/B knob.
    pallas_fused: bool = True
    # fused path: fetch texels via an exact one-hot MXU matmul over the
    # reachable 12-texture set instead of the ~8 ns/row gather. A/B knob.
    pallas_onehot_tex: bool = True
    # fused path: pre-pad rays to the tile grid and shade on the padded
    # layout (one slice at the end). A/B knob.
    pallas_prepad: bool = True
    # fused kernel: gate the per-chunk retire (sampling + re-init) behind
    # a block-level branch when nothing resolved. Measured SLOWER (234 vs
    # 222 ms/frame: the scf.if over the large carry costs more than the
    # skipped retires save) — off by default, kept as an A/B knob.
    pallas_retire_cond: bool = False
    # with the pallas backend: cell-steps per march-loop iteration
    # (0 = module default / VRV_PALLAS_UNROLL env). Bit-identical.
    pallas_unroll: int = 0
    # with the pallas backend: block rays by 8x128 image tiles (spatially
    # local -> per-block early exit fires together) instead of flat
    # row-major strips. Identical results; A/B knob.
    pallas_tile2d: bool = True
    # patch shape of the 1024 pixels a fused-kernel block carries,
    # "THxTW" with TH*TW == 1024 (requires pallas_tile2d + pallas_prepad).
    # A block costs the max over its lanes of total path steps, and WHICH
    # 1024 pixels share a block is a free layout choice (a reshape/
    # transpose in XLA, no kernel change): compact patches (e.g. 32x32)
    # have ~3x smaller angular spread from the shared eye than the
    # 8-row x 128-col strip, so their lanes share march fate better.
    # Per-ray values agree across shapes up to XLA fusion drift (<=1 ulp
    # on CPU: shape-dependent SIMD/remainder FMA contraction; packed u8
    # frames bit-identical — tests/test_tile_shape.py). A/B knob
    # (capmodel --tiles predicts).
    # Measured on-chip (v5e, interleaved medians, graded entry scene,
    # 2026-08-20): 32x32 361.4 vs 8x128 393.4 vs 16x64 377.6 ms/frame —
    # the compact patch wins 8%; default 32x32.
    pallas_tile: str = "32x32"
    # batched shading over the fused kernel's recorded bounces: run the
    # geometry resolve per bounce (the origin chain is sequential by
    # nature) but ONE shade_resolved call over all NEE bounces' rows —
    # per-bounce shade/NEE fusions collapse into one fusion set
    # (row-independent math -> bit-identical; tests/test_batched_shade.py)
    pallas_batched_shade: bool = True
    # in-kernel NEE: the fused path kernel samples the flat light list
    # per bounce and marches the shadow ray as a sub-phase (no separate
    # shadow kernel launch; a block's cost is max over lanes of
    # path+shadow steps instead of the two kernels' independent maxima).
    # Requires batched shading + the flat light list. Measured ON-chip
    # (v5e, interleaved medians, 2026-08-19): 477.5 vs 519.9 ms/frame on
    # the graded entry scene — the launch fold wins at every unroll; ON.
    pallas_inkernel_nee: bool = True
    # in-kernel NEE pdf record: the kernel additionally records the
    # chosen light's importance + the selection total W per NEE bounce
    # (values it computes anyway for the selection), so the XLA direct
    # term skips its whole (n, L) importance field — the largest NEE glue
    # fusions in the 2026-08-19 xprof (the (n,L,3) visibility dots +
    # (n,L) cumsum). Same formulas, but the kernel graph FMA/fuses them
    # differently than the XLA recompute -> ~1 ulp radiance drift (the
    # estimator stays exactly unbiased: the SAME recorded w feeds both
    # the direct term and the (1-w) complement). Gates:
    # tests/test_inkernel_nee.py::test_nee_record_pdf_*.
    pallas_nee_record_pdf: bool = True
    # in-kernel RADIANCE: the fused path kernel additionally resolves the
    # hit material key (t_mat*256 + texel), the scatter-branch code, the
    # emission cosine, the spdf/rpdf ratio, and every NEE direct-term
    # factor (w, cos_x/pi, geo with visibility folded in, e_y from the
    # static light emissive palettes) — the XLA side collapses to ONE
    # packed-atlas row fetch per bounce + the exact accumulation chain,
    # instead of the full resolve/shade replay over ~40 record arrays
    # (the 93 ms of XLA glue the round-5 roofline names; docs/PERF.md).
    # Value-identical to the replay path (formula order mirrored; gates:
    # tests/test_inkernel_radiance.py). Requires Scene.light_em when
    # lights are on; falls back to the replay otherwise. A/B knob.
    pallas_inkernel_radiance: bool = True
    # convert/select-lean march body (ops/pallas/trace_proc.py): VALUE-
    # identical rewrites of the per-step math chosen from measured v5e VPU
    # op costs (tools/vpu_probe.py: f32<->i32 converts and selects cost
    # ~2x an ALU op; i32 multiplies are FULL-RATE, so the hash stays and
    # the converts go): sign-bit-xor gradient dots, bool-derived corner
    # offsets, hoisted per-axis step constants, xor-derived face codes.
    # Level 2 additionally drops the path kernel's resolved-lane freeze
    # selects (a resolved lane's cell may drift along its dead direction;
    # nothing reads it again — the single-bounce kernel already works
    # this way). Bit-identity across levels gated in
    # tests/test_march_opt.py. 0 = the round-3 body (A/B diagnostic).
    # On-chip (2026-08-20): level 1 393.4 vs level 0 403.0 ms/frame;
    # level 2 361.3 vs level 1 365.6 (same-process interleaved).
    pallas_march_opt: int = 2
    # fused path kernel tail restart: pass 1 stops after ~this many march
    # steps; a second launch re-traces only the unfinished lanes (their
    # blocks) with the full budget. Bit-identical (deterministic per-lane
    # re-trace). 0 = single uncapped pass.
    pallas_step_cap: int = 0
    # conservative per-tile cone march that advances primary rays through
    # proven-empty space before the real trace (ops/dda.beam_march,
    # ~15% frame time on v5e). Never skips a hit; may flip rays passing
    # exactly through cell corners to the other (equally valid) DDA
    # resolution, so bit-identity gates run with this off
    beam_prepass: bool = True
    # small-texture-set fetch formulation in ops/shade (bit-identical
    # variants; see _fetch_atlas_onehot): 'split' = one-hot dot + K-way
    # select chain (XLA rewrites the dot into a gather fusion that
    # materializes (n,K,C)); 'dot' = barrier-forced MXU dot + exact
    # one-hot einsum select; 'take' = one combined-index row gather;
    # 'mxu' = factorized (group,ty)/(tx) one-hots — a real MXU matmul
    # with a 16x smaller barrier'd one-hot than 'dot' (_fetch_atlas_mxu).
    tex_fetch: str = "split"
    # 'megakernel' = fused lax.scan over bounces (parity-first, reference-shaped);
    # 'wavefront'  = the fused-kernel wavefront: per-ray bounce progression
    # inside the Pallas core (zero scatter) + per-bounce occupancy telemetry
    # from the recorded alive masks — the TPU-native form of the structure
    # the reference found faster on its wavefront branch (README.md:31);
    # 'wavefront_compact' = the literal per-bounce dispatch + ray-queue
    # compaction formulation (telemetry/debug; scatter-floor-bound on TPU).
    mode: str = "megakernel"
    # Accumulate frames progressively (the capability the reference's
    # postprocess_shader.rs stub reserved space for; the shipped branch
    # renders independent frames, see SURVEY.md quirk Q2).
    progressive: bool = False
    # 'albedo' = bounce-0 reflectivity visualization (debug aid; the
    # faithful 1-bounce render is E-only and shows black surfaces because
    # the reference kernel adds no direct light at bounce 0 —
    # pathtrace_shader.rs:939-943 radiance unroll). megakernel mode only.
    debug_view: str = "none"
    dtype: str = "float32"

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class WorldConfig:
    """World/grid parameters.

    Worldgen math mirrors reference src/game_system/chunk.rs:69-96:
    density = noise(w / noise_scale) - y / y_falloff, solid iff > threshold,
    grass if the block above is non-solid else stone.
    """

    size: Tuple[int, int, int] = (128, 128, 128)
    # world-space coordinate of grid cell (0,0,0); the reference generates
    # chunks centred on the ego's chunk, so the default centres the grid
    # on the origin.
    origin: Tuple[int, int, int] = (-64, -64, -64)
    seed: int = 0
    noise_scale: float = 20.0     # chunk.rs:69
    y_falloff: float = 500.0      # chunk.rs:78
    threshold: float = 0.2        # chunk.rs:84
    chunk_size: Tuple[int, int, int] = (32, 32, 32)  # chunk.rs:13-15
    min_render_radius: int = 6    # chunk_manager.rs:30-32
    max_render_radius: int = 8    # chunk_manager.rs:35-37

    def replace(self, **kw) -> "WorldConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Game-loop parameters (reference ego_controls_manager.rs / physics_manager.rs)."""

    gravity_y: float = -9.81            # physics_manager.rs:192
    dt: float = 1.0 / 60.0              # rapier IntegrationParameters::default()
    move_magnitude_kinematic: float = 10.0   # ego_controls_manager.rs:141
    rotate_magnitude: float = 2.0            # ego_controls_manager.rs:142
    jump_magnitude_kinematic: float = 10.0   # ego_controls_manager.rs:143
    move_magnitude_dynamic: float = 5.0      # ego_controls_manager.rs:177
    jump_magnitude_dynamic: float = 7.0      # ego_controls_manager.rs:179
    block_edit_cooldown_ms: float = 300.0    # ego_controls_manager.rs:248,259
    pick_radius: float = 10.0                # ego_controls_manager.rs:245
    pick_step: float = 0.01                  # chunk_manager.rs:400
    hover_cast_distance: float = 1.0         # physics_manager.rs:206
    grounded_threshold: float = 0.05         # physics_manager.rs:220
    clip_threshold: float = 0.025            # physics_manager.rs:221


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vrv_tpu", description=__doc__)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--bounces", type=int, default=4)
    p.add_argument("--grid", type=int, default=128, help="cubic grid side")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode",
                   choices=["megakernel", "wavefront", "wavefront_compact"],
                   default="megakernel")
    p.add_argument("--tracer", choices=["proc", "rows", "skip", "exact"], default="proc")
    p.add_argument("--no-beam", action="store_true",
                   help="disable the primary-ray beam pre-pass (debugging)")
    p.add_argument("--sharded", type=int, default=0, metavar="N",
                   help="render frames across N devices on a "
                        "('samples' x 'rows') mesh (0 = single-device)")
    p.add_argument("--multihost", default="", metavar="ADDR,NPROC,PID",
                   help="multi-host bootstrap: coordinator address, "
                        "process count, this process id "
                        "(parallel/multihost.initialize)")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--frames-in-flight", type=int, default=3,
                   help="async dispatch depth (reference keeps 3 swapchain "
                        "images in flight, interactive_rendering.rs:155-172); "
                        "1 = synchronous")
    p.add_argument("--out", type=str, default=None, help="PNG output path")
    p.add_argument("--no-nee", action="store_true")
    p.add_argument("--debug-albedo", action="store_true",
                   help="render bounce-0 reflectivity (textured surfaces) "
                        "instead of path-traced radiance")
    p.add_argument("--progressive", action="store_true")
    p.add_argument("--converged", type=int, default=0, metavar="CHUNKS",
                   help="render each frame as CHUNKS accumulated sample "
                        "passes in one dispatch (the reference's 128-spp "
                        "offline row); composes with --sharded")
    p.add_argument("--infinite", action="store_true",
                   help="streaming world: the window recenters on the ego")
    p.add_argument("--debug-view", choices=["none", "albedo", "prim",
                                            "steps", "bvhdepth"],
                   default=None,
                   help="visualization views (debugPrim/debugBvh analogs, "
                        "pathtrace_shader.rs:583-599, + a march-cost "
                        "heatmap)")
    return p


def configs_from_args(args) -> Tuple[RenderConfig, WorldConfig]:
    # an explicit --debug-view wins over --debug-albedo (so
    # "--debug-view none" disables it); only a RESOLVED view other than
    # "none" forces the megakernel mode the visualizations run on
    debug_view = args.debug_view or (
        "albedo" if args.debug_albedo else "none"
    )
    rc = RenderConfig(
        width=args.width,
        height=args.height,
        samples_per_pixel=args.spp,
        max_bounces=args.bounces,
        mode="megakernel" if debug_view != "none" else args.mode,
        debug_view=debug_view,
        tracer=args.tracer,
        enable_nee=not args.no_nee,
        beam_prepass=not args.no_beam,
        progressive=args.progressive,
    )
    g = args.grid
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=args.seed)
    return rc, wc
