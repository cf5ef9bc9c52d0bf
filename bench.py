"""Benchmark harness.

Measures the README headline config on the real device: 800x600, 8 spp,
4 bounces, 128^3 worldgen grid (reference README.md:5-6 reports 28 fps on
its unspecified GPU — BASELINE.md). Prints ONE JSON line.

The measured world is the SAME scene as __graft_entry__.entry(): worldgen
plus a lamp placed on the terrain surface (one real set_block edit), so
the headline number includes NEE against the light BVH and the in-kernel
edit list — the graded interactive conditions, not a pristine
fair-weather world (VERDICT r2 items 5/7). A pristine no-light frame rate
is also reported (diagnostic key) to track raw kernel progress.

Extra diagnostics (rays/sec, per-config timings) go to stderr.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from vrv_tpu.config import RenderConfig

    BASELINE_FPS = 28.0  # reference README.md:5-6

    # one 8-spp frame = eight 1-spp sample passes accumulated on device —
    # identical sample count and statistics, but an 8x smaller XLA graph
    # (this environment's remote-compile tunnel makes giant graphs
    # prohibitively slow to build)
    # BENCH_SMOKE=1: tiny-shape end-to-end validation of this script
    # (CPU-runnable; used by tests — the measured numbers are meaningless)
    SMOKE = os.environ.get("BENCH_SMOKE") == "1"
    CHUNKS = 2 if SMOKE else 8
    cfg = RenderConfig(width=64 if SMOKE else 800,
                       height=48 if SMOKE else 600,
                       samples_per_pixel=1, max_bounces=4)

    # the graded scene — identical to the driver-checked entry point
    import __graft_entry__ as ge

    scene, (eye, front, right, up) = ge._scene_args(32 if SMOKE else 128, cfg)
    assert scene.proc_static is not None and scene.proc_static.n_edits > 0
    assert scene.bvh_device is not None  # the lamp feeds the light BVH

    from vrv_tpu.render.megakernel import pack_bgra

    def run(frame, sc=scene, c=None):
        c = c or cfg
        acc = None
        for ch in range(CHUNKS):
            smp = sc.render_samples(
                eye, front, right, up, frame * CHUNKS + ch, c
            ).sum(axis=0)
            acc = smp if acc is None else acc + smp
        return pack_bgra(acc / CHUNKS)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # headline measurement ladder: the production config first; if a
    # freshly-landed kernel feature fails to compile/run on the real
    # chip, fall back feature-by-feature so the round still records a
    # number (the JSON's "scene" field names the rung that ran)
    ladder = [
        ("entry (lamp + edit: NEE + in-kernel edit list)", cfg),
        ("entry, batched shading off",
         cfg.replace(pallas_batched_shade=False)),
        ("entry, NEE off (shadow-kernel fallback)",
         cfg.replace(enable_nee=False)),
        ("entry, xla tracer (pallas fallback)",
         cfg.replace(proc_backend="xla")),
    ]
    n = 2 if SMOKE else 8
    fps = 0.0
    scene_label = "none"
    won_cfg = None
    for label, c in ladder:
        try:
            t0 = time.perf_counter()
            np.asarray(run(0, c=c))  # force materialization (tunnel-safe)
            print(f"[{label}] compile+first frame: "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            # timed frames (distinct frame ids = realistic reseeding)
            t0 = time.perf_counter()
            imgs = [run(i + 1, c=c) for i in range(n)]
            np.asarray(imgs[-1])
            dt = time.perf_counter() - t0
            fps = n / dt
            scene_label = label
            won_cfg = c
            break
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"[{label}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # one-dispatch formulation of the SAME frame: Scene.render_converged
    # folds the CHUNKS host-loop passes into a device fori_loop —
    # bit-identical output (tests/test_converged.py), identical pass ids,
    # minus CHUNKS-1 per-dispatch overheads (the remote tunnel's floor is
    # ~25 ms each). Both are production surfaces (app --converged), so the
    # headline takes whichever runs faster on this device.
    onejit_fps = 0.0
    if won_cfg is not None:
        try:
            def run1(frame):
                return scene.render_converged(
                    eye, front, right, up, frame, CHUNKS, won_cfg)

            np.asarray(run1(0))
            t0 = time.perf_counter()
            imgs = [run1(i + 1) for i in range(n)]
            np.asarray(imgs[-1])
            onejit_fps = n / (time.perf_counter() - t0)
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"[entry onejit] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(f"entry one-dispatch: {onejit_fps:.3f} fps "
          f"(host loop {fps:.3f})", file=sys.stderr)
    if onejit_fps > fps:
        fps = onejit_fps
        scene_label += " [one-dispatch]"
    rays = cfg.width * cfg.height * CHUNKS * cfg.max_bounces * fps
    print(
        f"{fps:.3f} fps  {rays:.3e} paths*bounce/s",
        file=sys.stderr,
    )

    # flag-gated kernel variants, measured as diagnostics so the round
    # records their numbers even when no interactive tunnel session was
    # possible (defaults flip in a later round if a variant wins)
    diag_fps = {}
    for key, c in (
        # in-kernel NEE is the production default since 2026-08-19 (won
        # its on-chip A/B); record the split formulation as the A side
        ("entry_split_nee_fps", cfg.replace(pallas_inkernel_nee=False)),
        ("entry_step_cap128_fps", cfg.replace(pallas_step_cap=128)),
        # round-5 A side: the record-replay path (in-kernel radiance off)
        ("entry_ikr_off_fps", cfg.replace(pallas_inkernel_radiance=False)),
    ):
        try:
            np.asarray(run(0, c=c))
            t0 = time.perf_counter()
            imgs = [run(i + 1, c=c) for i in range(4)]
            np.asarray(imgs[-1])
            diag_fps[key] = round(4 / (time.perf_counter() - t0), 3)
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"[{key}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            diag_fps[key] = 0.0
        print(f"{key}: {diag_fps[key]}", file=sys.stderr)

    # every measurement below runs the config that actually won the
    # ladder — if the production config was the reason the ladder fell
    # back, re-dispatching it here would just record 0.0 rows
    base_cfg = won_cfg if won_cfg is not None else cfg

    # --- gameplay-cliff diagnostics (VERDICT r4 item 4): the entry scene
    # with a placed MIRROR (the default block, quirk Q7 — used to evict
    # the fused kernel) and with a 256-edit mixed build incl. mirrors +
    # lamps (per-chunk edit gate; PROC_EDIT_CAP now 1024). Done criterion:
    # edits256 >= 80% of the headline rate. ---
    def _cliff_scene(n_edits):
        sc, _cam = ge._scene_args(32 if SMOKE else 128, cfg)
        bt = sc.table
        gsz = sc.grid.shape[0]
        org = np.asarray(sc.world_cfg.origin)
        solid = bt.solid[sc._grid_np]
        rng_ = np.random.default_rng(11)
        ids = [int(bt.block_idx(nm))
               for nm in ("soil", "stone", "soil", "mirror")]
        lamp_id = int(bt.block_idx("lamp"))
        placed = 0
        span = min(12, gsz // 2 - 2)
        while placed < n_edits:
            x = int(rng_.integers(gsz // 2 - span, gsz // 2 + span))
            z = int(rng_.integers(gsz // 2 - span, gsz // 2 + span))
            ys = np.nonzero(solid[x, :, z])[0]
            if not len(ys) or ys.max() + 3 >= gsz:
                continue
            y = int(ys.max()) + 1 + placed % 3
            # lamps SPARSE (every 43rd edit, ~6 total): a realistic
            # build keeps the light set inside FLAT_LIGHT_CAP so split NEE
            # stays on the flat sampler / in-kernel path
            if placed % 43 == 3:
                bid = lamp_id
            elif placed % 5 == 4:
                bid = int(bt.air)
            else:
                bid = ids[placed % 4]
            if sc.set_block(np.array([x, y, z]) + org, bid):
                placed += 1
        return sc

    for key, n_ed, nf in (("entry_mirror_fps", 1, 4),
                          ("entry_edits256_fps", 256, 4)):
        try:
            if n_ed == 1:
                sc_c, _ = ge._scene_args(32 if SMOKE else 128, cfg)
                gsz = sc_c.grid.shape[0]
                org = np.asarray(sc_c.world_cfg.origin)
                solid = sc_c.table.solid[sc_c._grid_np]
                ys = np.nonzero(solid[gsz // 2 + 2, :, gsz // 2 + 2])[0]
                sc_c.set_block(
                    np.array([gsz // 2 + 2, int(ys.max()) + 1,
                              gsz // 2 + 2]) + org,
                    int(sc_c.table.block_idx("mirror")))
            else:
                sc_c = _cliff_scene(32 if SMOKE else n_ed)
            assert sc_c.proc_static is not None
            assert sc_c.proc_static.edits_fused
            np.asarray(run(0, sc_c, c=base_cfg))
            t0 = time.perf_counter()
            imgs = [run(i + 1, sc_c, c=base_cfg) for i in range(nf)]
            np.asarray(imgs[-1])
            diag_fps[key] = round(nf / (time.perf_counter() - t0), 3)
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"[{key}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            diag_fps[key] = 0.0
        print(f"{key}: {diag_fps[key]}", file=sys.stderr)

    # Pallas-under-shard_map on the real chip (VERDICT r4 item 6): the
    # production multi-chip dispatch on a 1-device mesh vs the plain
    # single dispatch of the same 8-spp frame
    try:
        from vrv_tpu.parallel.mesh import make_render_mesh

        cfg8 = base_cfg.replace(
            samples_per_pixel=CHUNKS * base_cfg.samples_per_pixel)
        mesh1 = make_render_mesh(1, spp=cfg8.samples_per_pixel,
                                 height=cfg8.height)
        for key, f1 in (
            ("entry_one8_fps",
             lambda i: scene.render(eye, front, right, up, i, cfg8)),
            ("entry_shmap1_fps",
             lambda i: scene.render_sharded(
                 mesh1, eye, front, right, up, i, cfg8)),
        ):
            np.asarray(f1(0))
            t0 = time.perf_counter()
            for i in range(4):
                img = f1(i + 1)
            np.asarray(img)
            diag_fps[key] = round(4 / (time.perf_counter() - t0), 3)
            print(f"{key}: {diag_fps[key]}", file=sys.stderr)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"[shmap1] FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    # pristine-world diagnostic (no lamp, no edits): the fused path
    # kernel's raw rate, for kernel-progress tracking
    from vrv_tpu.config import WorldConfig
    from vrv_tpu.render.scene import Scene

    g = 32 if SMOKE else 128
    pristine_fps = 0.0
    try:
        pristine = Scene(
            WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2),
                        seed=0)
        )
        np.asarray(run(0, pristine, c=base_cfg))
        t0 = time.perf_counter()
        for i in range(n):
            img = run(i + 1, pristine, c=base_cfg)
        np.asarray(img)
        pristine_fps = n / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"[pristine] FAILED: {type(e).__name__}: {e}", file=sys.stderr)
    print(f"pristine (fused kernel): {pristine_fps:.3f} fps", file=sys.stderr)

    # --- the reference's other two published rows (README.md:8-9, :31) ---
    def run_chunks(frame, chunks):
        acc = None
        for c in range(chunks):
            smp = scene.render_samples(
                eye, front, right, up, frame * chunks + c, base_cfg
            ).sum(axis=0)
            acc = smp if acc is None else acc + smp
        return pack_bgra(acc / chunks)

    # 128-spp converged (reference: 3 fps)
    conv_fps = 0.0
    conv_chunks = 8 if SMOKE else 128
    try:
        np.asarray(run_chunks(0, conv_chunks))
        t0 = time.perf_counter()
        np.asarray(run_chunks(1, conv_chunks))
        np.asarray(run_chunks(2, conv_chunks))
        conv_fps = 2 / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"[converged] FAILED: {type(e).__name__}: {e}", file=sys.stderr)
    print(f"converged 128spp: {conv_fps:.3f} fps (ref 3)", file=sys.stderr)

    # one-dispatch converged (Scene.render_converged): the same 128 chunks
    # accumulated in a device-side fori_loop — bit-identical frames
    # (tests/test_converged.py), minus 127 per-dispatch overheads. Recorded
    # as a diagnostic; flip the converged measurement to it if it wins.
    conv1_fps = 0.0
    try:
        np.asarray(scene.render_converged(eye, front, right, up, 0,
                                          conv_chunks, base_cfg))
        t0 = time.perf_counter()
        np.asarray(scene.render_converged(eye, front, right, up, 1,
                                          conv_chunks, base_cfg))
        np.asarray(scene.render_converged(eye, front, right, up, 2,
                                          conv_chunks, base_cfg))
        conv1_fps = 2 / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"[converged_onejit] FAILED: {type(e).__name__}: {e}",
              file=sys.stderr)
    print(f"converged 128spp onejit: {conv1_fps:.3f} fps", file=sys.stderr)

    # converged chunk-size A/B (VERDICT r4 item 5): the same 128 spp as
    # 8 fori_loop iterations of 16-spp passes — 16x fewer per-pass glue
    # rounds at 16x larger fusion intermediates
    conv16_fps = 0.0
    try:
        cfg16 = base_cfg.replace(samples_per_pixel=8 if SMOKE else 16)
        c16 = conv_chunks // (8 if SMOKE else 16)
        np.asarray(scene.render_converged(eye, front, right, up, 0,
                                          c16, cfg16))
        t0 = time.perf_counter()
        np.asarray(scene.render_converged(eye, front, right, up, 1,
                                          c16, cfg16))
        np.asarray(scene.render_converged(eye, front, right, up, 2,
                                          c16, cfg16))
        conv16_fps = 2 / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"[converged_c16] FAILED: {type(e).__name__}: {e}",
              file=sys.stderr)
    print(f"converged 128spp c16 onejit: {conv16_fps:.3f} fps",
          file=sys.stderr)

    # wavefront vs megakernel at 4 spp / 4 bounces (reference README.md:31),
    # both as four accumulated 1-spp passes (the headline-frame shape)
    mode_fps = {}
    for mode in ("megakernel", "wavefront"):
        cfgm = base_cfg.replace(mode=mode, samples_per_pixel=1)

        def f(i, cfgm=cfgm):
            img = None
            for c in range(4):
                img = scene.render(eye, front, right, up, i * 4 + c, cfgm)
            return img

        try:
            np.asarray(f(0))
            t0 = time.perf_counter()
            for i in range(4):
                img = f(i + 1)
            np.asarray(img)
            mode_fps[mode] = 4 / (time.perf_counter() - t0)
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"[{mode}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            mode_fps[mode] = 0.0
    print(
        f"4spp/4b megakernel {mode_fps['megakernel']:.3f} fps, "
        f"wavefront {mode_fps['wavefront']:.3f} fps", file=sys.stderr,
    )

    # graded configs 1 + 2 (BASELINE.md graded list): albedo primary
    # visibility and diffuse 4spp/4b, measured on the same graded scene
    # so every graded config has a recorded number
    grade_fps = {}
    for key, cg, ng in (
        ("config1_albedo_1spp_1b_fps",
         base_cfg.replace(samples_per_pixel=1, max_bounces=1,
                          debug_view="albedo"), 8),
        ("config2_diffuse_4spp_4b_fps",
         base_cfg.replace(samples_per_pixel=4), 4),
    ):
        def fg(i, cg=cg):
            return scene.render(eye, front, right, up, i, cg)

        try:
            np.asarray(fg(0))
            t0 = time.perf_counter()
            for i in range(ng):
                img = fg(i + 1)
            np.asarray(img)
            grade_fps[key] = round(ng / (time.perf_counter() - t0), 3)
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"[{key}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            grade_fps[key] = 0.0
        print(f"{key}: {grade_fps[key]}", file=sys.stderr)

    # both converged formulations are production surfaces (app
    # --converged uses render_converged); report the better one
    conv_best = max(conv_fps, conv1_fps, conv16_fps)
    print(json.dumps({
        "metric": "frames_per_sec_800x600_8spp_4bounce_128grid",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "scene": scene_label,
        "entry_onejit_fps": round(onejit_fps, 3),
        "pristine_fused_fps": round(pristine_fps, 3),
        "converged_128spp_fps": round(conv_best, 3),
        "converged_128spp_vs_baseline": round(conv_best / 3.0, 3),
        "converged_128spp_hostloop_fps": round(conv_fps, 3),
        "converged_128spp_onejit_fps": round(conv1_fps, 3),
        "converged_128spp_c16_fps": round(conv16_fps, 3),
        "wavefront_4spp_4b_fps": round(mode_fps["wavefront"], 3),
        "megakernel_4spp_4b_fps": round(mode_fps["megakernel"], 3),
        **grade_fps,
        **diag_fps,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
