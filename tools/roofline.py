"""Roofline for the fused path kernel (VERDICT r4 "next round" item 1).

Composes the three measurements the repo already makes into ONE stated
physical budget for the graded entry frame:

  1. per-lane exact step counts on the graded scene (capmodel's method:
     march the staged chain host-side, count cell crossings analytically
     — the exact DDA step count of the kernel's march), EXTENDED with
     the in-kernel-NEE shadow sub-phase steps (ops/nee.sample_light_flat
     selection + a tcap'd shadow march per non-last lambert bounce,
     matching ops/pallas/path_proc's state machine);
  2. the production (32x32-patch) block tiling: a Mosaic block costs the
     max over its 1024 lanes of TOTAL (path + shadow) steps, so the
     model cost is sum-over-blocks of block-max lane steps;
  3. the measured v5e VPU op prices (tools/vpu_probe.py `ops`, 2026-08-20,
     docs/PERF.md round-4 table) x the march body's op mix (vpu_probe
     `audit` over the REAL kernel helpers) -> a predicted ns-per-
     block-step floor, plus the per-chunk retire overhead (retire runs
     every chunk: cfg.pallas_retire_cond defaults False after the
     round-2 A/B).

Output: predicted kernel floor (ms/frame), measured kernel time against
it (efficiency), and the implied fps ceiling at measured / zero XLA
glue. The reference's whole-frame budget at 28 fps is 35.7 ms
(/root/reference/README.md:5) — the verdict line states whether the
current algorithm can reach it on one chip.

Usage:
  JAX_PLATFORMS=cpu python tools/roofline.py [--spp-model 1]
      [--measured-kernel-ms 145.9] [--measured-frame-ms 238.7]

Runs entirely on CPU (the staged chain at 800x600 x 1 spp); one pass is
modeled and scaled by 8 (the 8 jittered passes differ only by sub-pixel
jitter + RNG — per-pass step totals agree to ~1%).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# measured v5e VPU op prices, ns per op on one (8,128) vreg
# (tools/vpu_probe.py `ops`, 2026-08-20 — docs/PERF.md "Round 4" table)
PRICES = {
    "alu_f32": 0.34,       # add/sub/mul/floor/abs/neg/min/max/compare
    "alu_i32": 0.22,       # add/sub/shift/and/or (mul measured full-rate 0.32)
    "mul_i32": 0.32,
    "xor_i32": 0.02,       # dual-issued, ~free
    "select": 0.61,
    "convert": 0.64,
    "free": 0.0,           # bitcast/broadcast/reshape/constants
}

_CLASS = {
    "add": "alu_f32", "sub": "alu_f32", "mul": "alu_f32", "div": "alu_f32",
    "floor": "alu_f32", "abs": "alu_f32", "neg": "alu_f32",
    "max": "alu_f32", "min": "alu_f32", "pow": "alu_f32",
    "integer_pow": "alu_f32",
    "lt": "alu_f32", "le": "alu_f32", "gt": "alu_f32", "ge": "alu_f32",
    "eq": "alu_f32", "ne": "alu_f32",
    "and": "alu_i32", "or": "alu_i32", "not": "alu_i32",
    "shift_left": "alu_i32", "shift_right_logical": "alu_i32",
    "shift_right_arithmetic": "alu_i32",
    "xor": "xor_i32",
    "select_n": "select",
    "convert_element_type": "convert",
    "bitcast_convert_type": "free", "broadcast_in_dim": "free",
    "reshape": "free", "stop_gradient": "free", "squeeze": "free",
    "clamp": "select",
    "sqrt": "alu_f32", "rsqrt": "alu_f32",
    "sin": "alu_f32", "cos": "alu_f32", "log": "alu_f32", "exp": "alu_f32",
}


def _op_cost(fn, *args, int_mul_names=("mul",)):
    """(total ns, op histogram) for one (8,128) evaluation of fn."""
    import jax
    from collections import Counter

    c = Counter()
    dtypes = {}

    def walk(jp):
        for eqn in jp.eqns:
            nm = eqn.primitive.name
            # i32 vs f32 mul priced differently
            if nm == "mul" and all(
                str(v.aval.dtype).startswith("int")
                or str(v.aval.dtype).startswith("uint")
                for v in eqn.invars if hasattr(v, "aval")
            ):
                c["__i32mul"] += 1
            else:
                c[nm] += 1
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)

    walk(jax.make_jaxpr(fn)(*args).jaxpr)
    ns = 0.0
    for nm, n in c.items():
        if nm == "__i32mul":
            ns += n * PRICES["mul_i32"]
        else:
            ns += n * PRICES.get(_CLASS.get(nm, "alu_f32"), PRICES["alu_f32"])
    return ns, c


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--spp", type=int, default=8, help="frame spp (scale)")
    ap.add_argument("--spp-model", type=int, default=1,
                    help="passes actually marched host-side")
    ap.add_argument("--tile", default="32x32")
    ap.add_argument("--unroll", type=int, default=24)
    ap.add_argument("--measured-kernel-ms", type=float, default=145.9,
                    help="fused-kernel device ms/frame from the latest "
                         "xprof (docs/PERF.md round-4 closing)")
    ap.add_argument("--measured-frame-ms", type=float, default=238.7,
                    help="whole-frame device ms from the same xprof")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vrv_tpu.config import RenderConfig
    from vrv_tpu.ops import nee, rng, shade
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.ops.dda_proc import trace_proc
    import __graft_entry__ as ge

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=1, max_bounces=args.bounces)
    scene, (eye, front, right, up) = ge._scene_args(args.grid, cfg)
    ps, pd = scene.proc_static, scene.proc_arrays
    G = np.asarray(ps.shape, np.float64)
    flat = scene.bvh_device["flat"] if scene.bvh_device else None
    B = args.bounces
    n = args.width * args.height

    def crossings(o_np, d_np, t_end):
        p0 = np.clip(o_np, 0.0, G[None] - 1e-9)
        p1 = np.clip(o_np + t_end[:, None] * d_np, 0.0, G[None] - 1e-9)
        return np.abs(np.floor(p1) - np.floor(p0)).sum(-1) + 1.0

    total = np.zeros(n)
    n_marches = np.zeros(n)       # fresh marches (init density evals)
    passes = 0
    for s in range(args.spp_model):
        passes += 1
        # steady-state pass id (bench dispatches frame*8 + chunk)
        o, d, seeds = raygen(
            scene.camera_to_local(eye), front, right, up,
            args.width, args.height, 1, jnp.uint32(8 + s), layout="hsw",
        )
        o = o.reshape(n, 3)
        d = d.reshape(n, 3)
        seeds = seeds.reshape(n)
        alive = np.ones(n, bool)
        ob, db = o, d
        for b in range(B):
            tr = trace_proc(ps, ob, db, pd=pd)
            o_np = np.asarray(ob, np.float64)
            d_np = np.asarray(db, np.float64)
            hit = np.asarray(tr.hit)
            t = np.asarray(tr.t, np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                safe = np.where(np.abs(d_np) < 1e-12, 1e-12, d_np)
                t0s = (0.0 - o_np) / safe
                t1s = (G[None] - o_np) / safe
            t_exit = np.minimum(np.maximum(t0s, t1s).min(-1), 1000.0)
            t_end = np.where(hit, t, np.maximum(t_exit, 0.0))
            total += np.where(alive, crossings(o_np, d_np, t_end), 0.0)
            n_marches += alive
            seed_b = rng.murmur3_combine(seeds, jnp.uint32(b))
            br = shade.do_bounce(ob, db, tr, seed_b, scene.materials, None)
            # in-kernel NEE shadow sub-phase (non-last bounces, lambert
            # hits with a valid light sample): tcap'd march to the light
            if flat is not None and b < B - 1:
                ls = nee.sample_light_flat(
                    br.new_origin,
                    # voxel-face normal from the trace record (instance
                    # overrides ignored: the ego cube is ~6 pixels)
                    jnp.take(
                        jnp.asarray(
                            __import__("vrv_tpu.ops.dda",
                                       fromlist=["FACE_NORMALS"]).FACE_NORMALS
                        ), tr.face, axis=0,
                    ),
                    seed_b, flat,
                )
                launch = (
                    alive & hit & np.asarray(ls.valid)
                    & (np.asarray(nee._dot(ls.dir, jnp.take(
                        jnp.asarray(__import__("vrv_tpu.ops.dda",
                                    fromlist=["FACE_NORMALS"]).FACE_NORMALS),
                        tr.face, axis=0))) > 0.0)
                )
                sd = np.asarray(ls.dir, np.float64)
                sdist = np.asarray(ls.dist, np.float64)
                stc = sdist - (1e-3 + 1e-3 * sdist)
                sh = trace_proc(ps, br.new_origin, ls.dir, pd=pd,
                                tcap=jnp.asarray(stc, jnp.float32))
                t_sh = np.where(np.asarray(sh.hit),
                                np.asarray(sh.t, np.float64), stc)
                so_np = np.asarray(br.new_origin, np.float64)
                total += np.where(launch, crossings(so_np, sd,
                                                    np.minimum(t_sh, stc)), 0.0)
                n_marches += launch
            alive = alive & ~np.asarray(br.miss)
            ob = br.new_origin
            db = br.new_direction

    total /= passes
    n_marches /= passes

    # production 32x32-patch tiling (cfg.pallas_tile): block cost = max
    # over 1024 lanes of total path+shadow steps
    th, tw = (int(v) for v in args.tile.split("x"))
    R, Wd = args.height, args.width          # 1-spp pass: rows == H
    Hp = (R + th - 1) // th * th
    Wp = (Wd + tw - 1) // tw * tw
    ln = np.zeros((Hp, Wp))
    ln[:R, :Wd] = total.reshape(R, Wd)
    bmax = ln.reshape(Hp // th, th, Wp // tw, tw).transpose(0, 2, 1, 3) \
        .reshape(-1, th * tw).max(1)
    block_steps_pass = bmax.sum()
    block_steps_frame = block_steps_pass * args.spp
    n_blocks = len(bmax) * args.spp

    # --- per-block-step price from the march body's op mix x measured
    # VPU prices ---
    from vrv_tpu.ops.noise import _seed_mix
    from vrv_tpu.ops.pallas.trace_proc import (_simplex3_seeded, exact_step,
                                               step_consts)

    f32, i32 = jnp.float32, jnp.int32
    shp = (8, 128)
    sm = _seed_mix(ps.seed)

    def density(x, y, z):
        return _simplex3_seeded(
            x / ps.noise_scale, y / ps.noise_scale, z / ps.noise_scale,
            sm, opt=True,
        ) - y / ps.y_falloff

    xs = [jnp.zeros(shp, f32)] * 3
    dens_ns, dens_hist = _op_cost(density, *xs)

    ivals = [jnp.zeros(shp, i32)] * 3
    fvals = [jnp.zeros(shp, f32)] * 9
    bvals = [jnp.zeros(shp, bool)] * 3

    def estep(scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz, bx, by, bz):
        return exact_step(scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                          bx, by, bz, tuple(ps.shape),
                          consts=step_consts(dx, dy, dz))

    step_ns, _ = _op_cost(estep, *ivals, *fvals, *bvals)

    # remaining per-step logic in path_proc.march_step (hit classification,
    # record selects, dead tests, edit compares at the E=4 pad, state
    # merges at march_opt level 2): counted from the kernel source —
    # ~14 selects + ~30 ALU/compares + E*(2 i32 ops)
    E = ps.n_edits
    glue_ns = 14 * PRICES["select"] + 30 * PRICES["alu_f32"] \
        + E * 2 * PRICES["alu_i32"]
    per_step_ns = dens_ns + step_ns + glue_ns

    # retire overhead: retire runs EVERY chunk (pallas_retire_cond=False
    # default); a chunk is `unroll` steps, and retire's dominant cost is
    # the re-init density eval + frame/sampling/NEE-selection math
    L = int(flat["tri"].shape[0]) if flat is not None else 0
    retire_ns = dens_ns + 150 * PRICES["alu_f32"] + 40 * PRICES["select"] \
        + L * (12 * PRICES["alu_f32"] + 10 * PRICES["select"])
    per_step_ns_eff = per_step_ns + retire_ns / max(1, args.unroll)

    floor_ms = block_steps_frame * per_step_ns_eff * 1e-6
    meas = args.measured_kernel_ms
    frame = args.measured_frame_ms
    glue_ms = frame - meas

    print(f"graded entry scene {args.width}x{args.height} x {args.spp} spp "
          f"x {B} bounces, tile {args.tile}, unroll {args.unroll}, "
          f"E={E} edit rows, L={L} light rows")
    print(f"lane steps (path+shadow): p50 "
          f"{np.percentile(total, 50):.0f} p99 {np.percentile(total, 99):.0f} "
          f"max {total.max():.0f}; marches/lane {n_marches.mean():.1f}")
    print(f"block-max step total: {block_steps_pass:,.0f} per 1-spp pass "
          f"x {args.spp} = {block_steps_frame:,.0f} per frame "
          f"({n_blocks} blocks)")
    print(f"march-body price: density {dens_ns:.0f} ns + exact_step "
          f"{step_ns:.0f} + step glue {glue_ns:.0f} = {per_step_ns:.0f} "
          f"ns/block-step; retire {retire_ns:.0f} ns / {args.unroll} steps "
          f"-> {per_step_ns_eff:.0f} ns effective")
    meas_ns = meas * 1e6 / block_steps_frame
    print(f"\nserial op-cost model floor: {floor_ms:.1f} ms/frame "
          f"({per_step_ns_eff:.0f} ns/block-step)")
    print(f"measured kernel:            {meas:.1f} ms/frame "
          f"({meas_ns:.0f} ns/block-step = "
          f"{meas_ns / per_step_ns_eff:.0%} of the serial op model)")
    if meas <= floor_ms:
        print("-> the kernel already runs AT/BELOW the serial op-cost "
              "model (VPU dual-issue + Mosaic scheduling): kernel-RATE "
              "tuning headroom is ~zero; the only kernel lever left is "
              "fewer block-max steps, and capmodel closed that "
              "(docs/PERF.md round-3).")
    best = min(floor_ms, meas)
    print(f"implied ceiling, measured glue ({glue_ms:.0f} ms): "
          f"{1000.0 / (best + glue_ms):.1f} fps")
    print(f"implied ceiling, zero glue:           "
          f"{1000.0 / best:.1f} fps")
    print(f"reference budget: 35.7 ms/frame = 28 fps (README.md:5)")
    need = 35.7
    if best > need:
        print(f"VERDICT: the current march-everything algorithm CANNOT "
              f"reach 28 fps on one v5e chip — its measured kernel floor "
              f"alone is {best / need:.1f}x the reference budget. "
              f"Single-chip work targets glue (the ceiling above); 28 fps "
              f"parity rides the multi-chip axis (sample sharding is "
              f"measured-linear; {int(np.ceil(28.0 * best / 1000.0))}+ "
              f"chips at the zero-glue ceiling).")
    else:
        print("VERDICT: 28 fps is inside the single-chip roofline; keep "
              "closing kernel efficiency + glue.")


if __name__ == "__main__":
    main()
