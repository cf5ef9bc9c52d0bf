"""Per-op device-time profile of the entry-scene frame (lamp + edit +
ego cube). Traces one warm 8-chunk frame with jax.profiler and
aggregates device events by name, bucketing into the pipeline stages
(fused path kernel / shadow trace kernel / NEE descent / shading /
layout) so the NEE cost found by `probe.py entry` can be attributed.

Usage: python tools/profile_entry.py [--spp 8] [--grid 128]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--out", default="/tmp/vrv_prof")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from vrv_tpu.config import RenderConfig
    from vrv_tpu.render.megakernel import pack_bgra
    import __graft_entry__ as ge

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=1, max_bounces=args.bounces)
    scene, cam = ge._scene_args(args.grid, cfg)
    cam = (cam[0],) + tuple(np.asarray(c, np.float32) for c in cam[1:])

    def frame(f=0):
        acc = None
        for c in range(args.spp):
            smp = scene.render_samples(*cam, f * args.spp + c, cfg).sum(axis=0)
            acc = smp if acc is None else acc + smp
        return pack_bgra(acc / args.spp)

    print("device:", jax.devices()[0], flush=True)
    t0 = time.perf_counter()
    np.asarray(frame())
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    os.system(f"rm -rf {args.out}")
    with jax.profiler.trace(args.out):
        np.asarray(frame(1))

    # aggregate device events from the trace
    paths = glob.glob(f"{args.out}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {args.out}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # device lanes: pid whose process_name mentions TPU/device XLA ops
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device:" in n or "Device" in n}
    agg = {}
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
        # XLA op metadata (args): source file:line + long op name — the
        # attribution that turns "fusion.67" into a source-level target
        a = e.get("args") or {}
        if name not in meta and a:
            src = a.get("source_info") or a.get("source") or ""
            long = a.get("long_name") or a.get("hlo_op") or ""
            if src or long:
                meta[name] = f"{src} {long}"[:160]
    print(f"\ndevice total: {total:.1f} ms across {len(agg)} op names")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:8.2f} ms  {name[:110]}")
        if name in meta:
            print(f"              {meta[name]}")


if __name__ == "__main__":
    main()
