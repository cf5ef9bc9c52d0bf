"""Render the five BASELINE configs to docs/screenshots/.

Shot from the bench camera — hovering above the terrain looking down at
an angle, comparable to the reference's published screenshot pose
(/root/reference/assets/screenshots/8spp_800x600.png) so a human can
eyeball parity side by side.

  python tools/gallery.py                 # real TPU, full size
  JAX_PLATFORMS=cpu python tools/gallery.py --width 200 --height 150 --grid 48
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--tracer", default="proc")
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "screenshots"))
    ap.add_argument("--converged-spp", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from vrv_tpu.config import RenderConfig, WorldConfig
    from vrv_tpu.render.megakernel import pack_bgra
    from vrv_tpu.render.scene import Scene
    from vrv_tpu.utils.image import save_png

    os.makedirs(args.outdir, exist_ok=True)
    g = args.grid
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    scene = Scene(wc)
    print(f"device: {jax.devices()[0]}", flush=True)

    # the game's own interactive camera (camera.rs semantics) orbiting a
    # point just above the terrain surface — the same kind of pose the
    # reference's published screenshots use (above-terrain, looking
    # slightly down into shaded relief, so surface color isn't all
    # clipped to white by direct sky light)
    from vrv_tpu.camera import SphericalCamera

    grid_np = np.asarray(scene.grid)
    solid = scene.table.solid[grid_np]
    ys = np.nonzero(solid[g // 2, :, g // 2])[0]
    y_surf = (int(ys.max()) if len(ys) else g // 2) + wc.origin[1]
    cam = SphericalCamera()
    cam.set_root_position(np.array([0.0, y_surf + 2.0, 0.0]))
    cam.pitch, cam.yaw, cam.offset = -0.4, 1.9, 14.0
    eye, front, right, up = cam.eye_front_right_up()

    base = RenderConfig(width=args.width, height=args.height, tracer=args.tracer)

    def shoot(name, cfg, spp_chunks=1, frame0=0):
        t0 = time.perf_counter()
        acc = None
        for c in range(spp_chunks):
            s = scene.render_samples(eye, front, right, up, frame0 + c, cfg)
            s = s.sum(axis=0)
            acc = s if acc is None else acc + s
        img = np.asarray(pack_bgra(acc / (spp_chunks * cfg.samples_per_pixel)))
        save_png(os.path.join(args.outdir, name), img)
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)

    # 1 — primary visibility, albedo hit shading (BASELINE config 1)
    cfg1 = base.replace(samples_per_pixel=1, max_bounces=1, debug_view="albedo")
    shoot("config1_primary_1spp_1b.png", cfg1)
    # faithful E-only 1-bounce render (black surfaces + sky by design:
    # the radiance unroll adds no direct light at bounce 0)
    shoot("config1_faithful_radiance_1spp_1b.png",
          base.replace(samples_per_pixel=1, max_bounces=1))

    # 2 — diffuse path tracing, 4 spp / 4 bounces
    shoot("config2_diffuse_4spp_4b.png", base.replace(samples_per_pixel=4))

    # 3 — README headline: 8 spp / 4 bounces, progressive accumulation
    shoot("config3_readme_8spp_progressive.png",
          base.replace(samples_per_pixel=1), spp_chunks=8)

    # 4 — wavefront split with compaction + NEE (MIS)
    shoot("config4_wavefront_nee.png",
          base.replace(samples_per_pixel=4, mode="wavefront"))

    # 5 — dynamic world edits + converged render
    scene.set_block([2, y_surf + 1, 2], scene.table.block_idx("lamp"))
    scene.set_block([4, y_surf + 1, -3], scene.table.block_idx("mirror"))
    scene.set_block([0, y_surf, 6], scene.table.air)  # break one
    shoot(f"config5_dynamic_converged_{args.converged_spp}spp.png",
          base.replace(samples_per_pixel=4), spp_chunks=args.converged_spp // 4)


if __name__ == "__main__":
    main()
