"""CLI entry: headless frame rendering / interactive game loop.

The analog of reference src/main.rs: build the world, run the loop, print
fps. Headless-first (PNG sink); a windowed backend can consume the BGRA
buffer from GameWorld.last_frame.

Usage:
  python -m vrv_tpu.app --frames 3 --out frame.png
  python -m vrv_tpu.app --spp 8 --bounces 4 --grid 128 --frames 30
"""

from __future__ import annotations

import sys

import numpy as np

from vrv_tpu.config import build_arg_parser, configs_from_args
from vrv_tpu.game import world as w
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.image import save_png
from vrv_tpu.utils.profiling import FrameMeter
from vrv_tpu.utils.geometry import unitcube


def build_world(render_cfg, world_cfg, streaming: bool = False) -> w.GameWorld:
    """main.rs:27-157 analog: scene + ego entity."""
    scene = Scene(world_cfg)
    gw = w.GameWorld(
        scene, render_cfg=render_cfg,
        extent=(render_cfg.width, render_cfg.height), streaming=streaming,
    )
    gw.add_entity(
        0,
        w.EntityCreationData(
            physics=w.EntityPhysicsData(
                rigid_body_type=w.KINEMATIC_VELOCITY,
                hitbox=w.Hitbox(np.array([0.5, 0.5, 0.5])),
                linvel=np.zeros(3),
                angvel=np.zeros(3),
                controlled=True,
                grounded=False,
            ),
            mesh=unitcube(),
            isometry=w.Isometry(np.array([0.0, 5.0, 0.0])),
        ),
    )
    return gw


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    render_cfg, world_cfg = configs_from_args(args)
    print(f"world {world_cfg.size} seed={world_cfg.seed}; "
          f"render {render_cfg.width}x{render_cfg.height} "
          f"{render_cfg.samples_per_pixel}spp/{render_cfg.max_bounces}b "
          f"mode={render_cfg.mode}")

    if args.multihost:
        # DCN scale-out: after the bootstrap, jax.devices() spans all
        # hosts and the same mesh + psum path applies unchanged
        from vrv_tpu.parallel.multihost import initialize, is_primary

        coord, nproc, pid = args.multihost.split(",")
        n = initialize(coord, int(nproc), int(pid))
        print(f"multihost: {n} global devices, primary={is_primary()}")

    gw = build_world(render_cfg, world_cfg, streaming=args.infinite)
    # seed the camera's LIVE spp preference (quirk Q1: spp rides the
    # camera, and ego Tab-cycling can change it later) from --spp — the
    # camera default of 1 was silently overriding the CLI value, while
    # the fps meter counted --spp rays
    from vrv_tpu.camera import RenderingPreferences

    gw.camera.set_rendering_preferences(
        RenderingPreferences(samples=render_cfg.samples_per_pixel)
    )
    if args.sharded:
        if args.progressive:
            print("--progressive renders single-device (radiance "
                  "accumulation); ignoring --sharded", file=sys.stderr)
        else:
            from vrv_tpu.parallel.mesh import make_render_mesh

            gw.render_mesh = make_render_mesh(
                args.sharded, spp=render_cfg.samples_per_pixel,
                height=render_cfg.height,
            )
            print(f"sharded: mesh {dict(gw.render_mesh.shape)}")
            if args.converged and args.converged % gw.render_mesh.devices.size:
                print(f"--converged {args.converged} does not split over "
                      f"{gw.render_mesh.devices.size} devices; frames will "
                      "render single-device", file=sys.stderr)
    meter = FrameMeter()
    rays_per_frame = (
        render_cfg.width * render_cfg.height
        * render_cfg.samples_per_pixel * render_cfg.max_bounces
        * max(1, args.converged)
    )

    from collections import deque

    from vrv_tpu.render.megakernel import pack_bgra
    from vrv_tpu.window import make_backend

    backend = make_backend(render_cfg.width, render_cfg.height)

    # Frames-in-flight: JAX dispatch is asynchronous, so keeping a short
    # queue of not-yet-fetched device frames overlaps render i+1..i+k with
    # the host copy/present of frame i — the analog of the reference's 3
    # swapchain images + deferred disposal ring
    # (reference src/render_system/interactive_rendering.rs:155-172,
    # scene.rs:202-206). Depth 1 = fully synchronous (old behavior).
    inflight: deque = deque()
    depth = max(1, args.frames_in_flight)

    accum = None
    shown = None

    def present(dev_frame):
        nonlocal shown
        shown = np.asarray(dev_frame)  # device sync happens here, k frames late
        backend.present(shown)
        meter.frame(rays=rays_per_frame)

    for i in range(args.frames):
        for ev in backend.poll_events():
            gw.handle_event(ev)
        if args.progressive:
            # radiance-domain accumulation on device (bit-equal to
            # models/pathtracer.PathTracer.render_progressive; quirk Q2) —
            # NOT a mean of quantized u8 frames
            smp = gw.step(radiance=True)
            accum = smp if accum is None else accum + smp
            frame_dev = pack_bgra(accum / (i + 1))
        else:
            frame_dev = gw.step(converged=args.converged)
        inflight.append(frame_dev)
        if len(inflight) >= depth:
            present(inflight.popleft())
        if not backend.open:
            break

    while inflight:
        present(inflight.popleft())

    if args.out and shown is not None:
        save_png(args.out, shown)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
