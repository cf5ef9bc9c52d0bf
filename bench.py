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
    conv_best = max(conv_fps, conv1_fps)
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
        "wavefront_4spp_4b_fps": round(mode_fps["wavefront"], 3),
        "megakernel_4spp_4b_fps": round(mode_fps["megakernel"], 3),
        **grade_fps,
        **diag_fps,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
