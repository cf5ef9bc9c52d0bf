"""Step-cap cost model for the fused path kernel's tail restart.

The fused kernel's block cost is max over its (8,128) lanes of TOTAL
path steps; cfg.pallas_step_cap trades that tail for a second pass that
re-traces only unfinished lanes from scratch (bit-identical —
tests/test_path_cap.py). The right cap needs the per-lane step
distribution on the graded scene, which this script derives WITHOUT the
chip: march the staged chain (XLA tracer + the production cosine-chain
shading) at a reduced image size, count per-segment cell crossings
analytically (|floor(p1) - floor(p0)|.sum(), the exact DDA step count
for the fused kernel's exact march), tile lanes exactly as the kernel's
hsw layout does, and simulate

    cost(cap) = sum_blocks min(max_lane_total, cap)          # pass 1
              + sum_blocks max(total where total > cap)      # pass 2

against the uncapped baseline sum_blocks max_lane_total. Model limits
(stated in docs/PERF.md): ignores per-chunk retire overhead and the
second launch's fixed cost, so treat predicted wins as upper bounds and
confirm on-chip with probe token _scN.

Usage: JAX_PLATFORMS=cpu python tools/capmodel.py [--width 200 --height 152]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _bc(v, Rp, Wp):
    ln = np.zeros(Rp * Wp)
    ln[: len(v)] = v
    return ln.reshape(-1, 1024).max(1).sum()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--caps", default="32,48,64,96,128,192,256,384")
    args = ap.parse_args()

    import jax.numpy as jnp

    from vrv_tpu.config import RenderConfig
    from vrv_tpu.ops import rng, shade
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.ops.dda_proc import trace_proc
    import __graft_entry__ as ge

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=1, max_bounces=args.bounces)
    scene, (eye, front, right, up) = ge._scene_args(args.grid, cfg)
    ps, pd = scene.proc_static, scene.proc_arrays
    G = np.asarray(ps.shape, np.float64)

    o, d, seeds = raygen(
        scene.camera_to_local(eye), front, right, up,
        args.width, args.height, 1, jnp.uint32(0), layout="hsw",
    )
    n = args.width * args.height
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    seeds = seeds.reshape(n)

    total = np.zeros(n)
    per_bounce = []
    alive = np.ones(n, bool)
    hit_y0 = np.zeros(n)
    ob, db = o, d
    for b in range(args.bounces):
        tr = trace_proc(ps, ob, db, pd=pd)
        o_np = np.asarray(ob, np.float64)
        d_np = np.asarray(db, np.float64)
        hit = np.asarray(tr.hit)
        t = np.asarray(tr.t, np.float64)
        # grid-exit t for misses
        with np.errstate(divide="ignore", invalid="ignore"):
            safe = np.where(np.abs(d_np) < 1e-12, 1e-12, d_np)
            t0s = (0.0 - o_np) / safe
            t1s = (G[None] - o_np) / safe
        t_exit = np.minimum(np.maximum(t0s, t1s).min(-1), 1000.0)
        t_end = np.where(hit, t, np.maximum(t_exit, 0.0))
        p0 = np.clip(o_np, 0.0, G[None] - 1e-9)
        p1 = np.clip(o_np + t_end[:, None] * d_np, 0.0, G[None] - 1e-9)
        steps = np.abs(np.floor(p1) - np.floor(p0)).sum(-1) + 1.0
        per_bounce.append(np.where(alive, steps, 0.0))
        total += per_bounce[-1]
        if b == 0:
            hit_y0 = np.where(hit, p1[:, 1], G[1])
        # production chain: cosine continuation from do_bounce (bvh=None —
        # split NEE leaves the chain untouched)
        br = shade.do_bounce(
            ob, db, tr, rng.murmur3_combine(seeds, jnp.uint32(b)),
            scene.materials, None,
        )
        alive = alive & ~np.asarray(br.miss)
        ob = br.new_origin
        db = br.new_direction

    # hsw tiling: rows of W lanes, (8, 128) pixel tiles (pallas_prepad)
    R = args.height  # 1 spp -> rows == H
    Wd = args.width
    Rp = (R + 7) // 8 * 8
    Wp = (Wd + 127) // 128 * 128
    lane = np.zeros((Rp, Wp))
    lane[:R, :Wd] = total.reshape(R, Wd)
    blocks = lane.reshape(Rp // 8, 8, Wp // 128, 128).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(-1, 8 * 128)
    bmax = blocks.max(1)

    base = bmax.sum()

    # --- block tile-shape sweep: a Mosaic block is 1024 lanes, but WHICH
    # 1024 pixels is a free layout choice (a reshape/transpose in XLA —
    # no kernel change). Compact patches have smaller angular spread from
    # the shared eye, so their lanes share march fate better than the
    # 8-row x 128-col strip. Cost = sum over patches of patch-max,
    # including the padding each shape needs.
    print("\ntile-shape sweep (patch th x tw, 1024 lanes):")
    for th, tw in ((8, 128), (16, 64), (32, 32), (64, 16), (4, 256),
                   (128, 8), (1024, 1)):
        Hp2 = (R + th - 1) // th * th
        Wp2 = (Wd + tw - 1) // tw * tw
        ln2 = np.zeros((Hp2, Wp2))
        ln2[:R, :Wd] = total.reshape(R, Wd)
        pat = ln2.reshape(Hp2 // th, th, Wp2 // tw, tw).transpose(0, 2, 1, 3)
        pcost = pat.reshape(-1, th * tw).max(1).sum()
        print(f"  {th:4d}x{tw:<4d}: {pcost / base:6.2%} of 8x128 "
              f"({(Hp2 * Wp2) // 1024} blocks)")

    q = np.percentile(total, [50, 90, 99, 99.9])
    print(f"lanes {n}; per-lane steps p50/p90/p99/p99.9 = "
          f"{q[0]:.0f}/{q[1]:.0f}/{q[2]:.0f}/{q[3]:.0f} max {total.max():.0f}")
    print(f"blocks {len(bmax)}; block-max mean {bmax.mean():.0f} "
          f"p50 {np.median(bmax):.0f} max {bmax.max():.0f}")
    print(f"uncapped model cost {base:.0f} lane-steps "
          f"(mean/lane-col {base / len(bmax):.0f})")
    print(f"tail share: blocks vs their own p50-lane "
          f"{(bmax / np.maximum(np.median(blocks, 1), 1)).mean():.2f}x")
    for cap in (int(c) for c in args.caps.split(",")):
        pass1 = np.minimum(bmax, cap).sum()
        over = np.where(blocks > cap, blocks, 0.0)
        pass2 = over.max(1).sum()
        cost = pass1 + pass2
        print(f"cap {cap:4d}: model cost {cost / base:5.2%} of uncapped "
              f"(pass2 blocks {(over.max(1) > 0).mean():5.1%})")

    # --- ray-reordering upper bounds: block cost is max-over-lanes, so
    # sorting lanes by length before blocking converts the per-block max
    # into a per-quantile max (the whole divergence prize). An oracle
    # sort is not implementable (length is the answer), so also score a
    # cheap analytic predictor: t to the terrain's coarse column
    # envelope (ProcStatic's y_low table exists for the env skip), whose
    # crossings estimate the primary march; bounce rays ride along.
    def blocked_cost(order):
        lane_sorted = np.zeros(Rp * Wp)
        lane_sorted[: len(order)] = total[order]
        bs = lane_sorted.reshape(-1, 8 * 128)
        return bs.max(1).sum()

    oracle = blocked_cost(np.argsort(-total))
    print(f"oracle-sorted blocks: {oracle / base:5.2%} of uncapped "
          f"({base / oracle:.2f}x)")

    # predictor: primary-ray steps to the envelope heightfield via a few
    # fixed-point iterations of t <- t such that y(o + t d) = env(x, z)
    # build the column envelope directly from the grid (the scene only
    # bakes coarse_const for edit-free worlds; the predictor just needs
    # the heightfield, rebuilt here host-side like coarse_consts does)
    g = scene._grid_np
    B8 = 8
    X, Y, Z = g.shape
    Bx, Bz = (X + B8 - 1) // B8, (Z + B8 - 1) // B8
    solid = g != np.uint8(scene.table.air)
    solid = np.pad(solid, [(0, Bx * B8 - X), (0, 0), (0, Bz * B8 - Z)])
    col = solid.reshape(Bx, B8, Y, Bz, B8).any(axis=(1, 4))
    ys_ = np.arange(Y, dtype=np.int64)[None, :, None]
    env = (np.where(col, ys_, -1).max(axis=1) + 1).astype(np.float64)
    if True:
        o64 = np.asarray(o, np.float64)
        d64 = np.asarray(d, np.float64)
        t_pred = np.full(n, 8.0)
        for _ in range(4):
            px = np.clip(o64[:, 0] + t_pred * d64[:, 0], 0, G[0] - 1e-9)
            pz = np.clip(o64[:, 2] + t_pred * d64[:, 2], 0, G[2] - 1e-9)
            ylow = env[(px / 8).astype(int), (pz / 8).astype(int)]
            dy = np.where(np.abs(d64[:, 1]) < 1e-9, 1e-9, d64[:, 1])
            t_new = (ylow - o64[:, 1]) / dy
            t_pred = np.clip(np.where(t_new > 0, t_new, 1e4), 0, 1e4)
        # terrain hitters pay short primaries + (B-1) LONG up-marches
        # back through the air column (the bounce chain), sky rays one
        # march — the dominant cost signal is hit-vs-miss plus the air
        # column above the hit
        hits_env = t_pred < 1e3
        crossings = np.abs(d64 * np.minimum(t_pred, 2 * G.max())[:, None]).sum(-1)
        py = np.clip(o64[:, 1] + t_pred * d64[:, 1], 0, G[1])
        up_air = np.maximum(G[1] - py, 0.0)   # air column above the hit
        preds = {
            "env_t": crossings,
            "bounce_budget": np.where(
                hits_env,
                crossings + (args.bounces - 1) * 1.5 * up_air,
                crossings,
            ),
        }
        for name, pred in preds.items():
            rho = np.corrcoef(pred, total)[0, 1]
            cst = min(blocked_cost(np.argsort(-pred)),
                      blocked_cost(np.argsort(pred)))
            print(f"{name}-sorted: {cst / base:5.2%} of uncapped "
                  f"({base / cst:.2f}x), corr = {rho:.2f}")

        # --- two-phase split: bounce 0 in natural (coherent) order, then
        # bounces 1..B-1 re-blocked sorted by data KNOWN after bounce 0 ---
        s0 = per_bounce[0]
        rest = total - s0
        lane0 = np.zeros((Rp, Wp))
        lane0[:R, :Wd] = s0.reshape(R, Wd)   # natural hsw 2D tiling
        blocks0 = lane0.reshape(
            Rp // 8, 8, Wp // 128, 128).transpose(0, 2, 1, 3).reshape(-1, 1024)
        cost_b0 = blocks0.max(1).sum()

        def rest_cost(order):
            ln = np.zeros(Rp * Wp)
            ln[: len(order)] = rest[order]
            return ln.reshape(-1, 1024).max(1).sum()

        for nm, key in (
            ("oracle_rest", -rest),
            ("hit_y (air column above bounce-0 hit)", hit_y0),
            ("bounce0_steps", -s0),
        ):
            c = cost_b0 + rest_cost(np.argsort(key))
            rr = np.corrcoef(-key if nm != "hit_y (air column above bounce-0 hit)" else key, rest)[0, 1]
            print(f"two-phase [{nm}]: {c / base:5.2%} of uncapped "
                  f"({base / c:.2f}x; b0 share {cost_b0 / base:4.1%}, "
                  f"corr(key, rest) = {rr:.2f})")
        print(f"bounce cost shares (sum-of-block-max): "
              + ", ".join(
                  f"b{i}={np.zeros(0).size and 0 or _bc(per_bounce[i], Rp, Wp):.0f}"
                  for i in range(args.bounces)))


if __name__ == "__main__":
    main()
