"""Consolidated TPU probe harness (replaces tools/probe_tpu{,2..8}.py).

One parameterized entry point that reproduces every measurement cited in
docs/PERF.md. Runs on whatever device JAX_PLATFORMS selects (the real TPU
by default in this image; pass JAX_PLATFORMS=cpu for a smoke run).

Subcommands:
  frame    — full headline-config frame time per tracer/mode
             (the docs/PERF.md tracer-lineage table)
  trace    — one standalone 1-spp trace pass per tracer (isolates the
             tracer from shading/NEE)
  gather   — the primitive cost model: random gather / scatter / sort /
             one-hot matmul rates (docs/PERF.md cost-model table)
  noise    — arithmetic-hash simplex throughput + empirical Lipschitz sup
  edits    — proc-tracer frame cost vs edit-list size (0/16/64)

Timing convention: median of interleaved repetitions from one process —
the tunneled v5e drifts +-5-10% between runs (docs/PERF.md), so only
within-process comparisons are trusted.

Usage: python tools/probe.py frame --tracers rows,proc --spp 8
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _init_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    print("device:", jax.devices()[0], flush=True)
    return jax


def _bench_scene(g=128):
    from vrv_tpu.config import WorldConfig
    from vrv_tpu.render.scene import Scene

    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    scene = Scene(wc)
    grid_np = np.asarray(scene.grid)
    solid = scene.table.solid[grid_np]
    ys = np.nonzero(solid[g // 2, :, g // 2])[0]
    y_surf = (int(ys.max()) if len(ys) else g // 2) + wc.origin[1]
    eye = np.array([0.0, y_surf + 12.0, -24.0], np.float32)
    front = np.array([0.0, -0.35, 0.936], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.936, -0.35], np.float32)
    return scene, (eye, front, right, up)


def _median_time(fns, n=5):
    """Interleaved medians: fns is {name: nullary}; returns {name: seconds}."""
    for f in fns.values():  # warmup / compile
        np.asarray(f())
    samples = {k: [] for k in fns}
    for _ in range(n):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f())
            samples[k].append(time.perf_counter() - t0)
    return {k: statistics.median(v) for k, v in samples.items()}


# ---------------------------------------------------------------------------


def cmd_frame(args):
    _init_jax()
    from vrv_tpu.config import RenderConfig
    from vrv_tpu.render.megakernel import pack_bgra

    scene, cam = _bench_scene(args.grid)
    chunks = args.spp  # 1-spp passes accumulated on device (bench.py shape)
    fns = {}
    for tracer in args.tracers.split(","):
        # token syntax: <base>[_pallas][_nobeam][_nonee][_wave], e.g.
        # proc_pallas_nobeam — lets one process interleave arbitrary
        # variants (only within-process medians are comparable)
        parts = tracer.split("_")
        base = parts[0]
        mods = set(parts[1:])
        bounces = args.bounces
        for m in mods:
            if m.startswith("b") and m[1:].isdigit():
                bounces = int(m[1:])
        # sppfull: one render_samples call at full spp (one giant program)
        # onejit: chunked passes accumulated INSIDE one jit (one dispatch)
        # cN: N-spp passes (chunks = spp/N)
        per_pass = 1
        for m in mods:
            if m.startswith("c") and m[1:].isdigit():
                per_pass = int(m[1:])
        n_chunks = 1 if "sppfull" in mods else max(1, chunks // per_pass)
        cfg = RenderConfig(
            width=args.width, height=args.height,
            samples_per_pixel=args.spp if "sppfull" in mods else per_pass,
            max_bounces=bounces,
            mode="wavefront" if "wave" in mods else args.mode,
            tracer=base,
            proc_backend="pallas" if "pallas" in mods else "xla",
            proc_coarse=not args.no_coarse,
            beam_prepass="nobeam" not in mods,
            enable_nee="nonee" not in mods,
            pallas_tile2d="flat1d" not in mods,
            pallas_fused="nofuse" not in mods,
            pallas_retire_cond="rc0" not in mods,
            pallas_onehot_tex="gath" not in mods,
            pallas_prepad="nopp" not in mods,
            pallas_unroll=next(
                (int(m[1:]) for m in mods if m.startswith("u") and m[1:].isdigit()),
                0,
            ),
            pallas_step_cap=next(
                (int(m[2:]) for m in mods
                 if m.startswith("sc") and m[2:].isdigit()),
                0,
            ),
            pallas_batched_shade="bs0" not in mods,
            pallas_inkernel_nee="iknee" in mods,
        )

        def frame(f=0, cfg=cfg, n_chunks=n_chunks):
            acc = None
            for c in range(n_chunks):
                smp = scene.render_samples(*cam, f * n_chunks + c, cfg).sum(axis=0)
                acc = smp if acc is None else acc + smp
            return pack_bgra(acc / (n_chunks * cfg.samples_per_pixel))

        if "onejit" in mods:
            import jax as _jax
            import jax.numpy as _jnp

            inner = frame
            wrapped = _jax.jit(inner)

            def frame(f=0, _w=wrapped):
                return _w(_jnp.uint32(f))

        t0 = time.perf_counter()
        np.asarray(frame())
        print(f"  {tracer}: compile+first {time.perf_counter() - t0:6.1f}s", flush=True)
        fns[tracer] = frame
    for k, dt in _median_time(fns, n=args.reps).items():
        print(f"  {k}: {dt * 1e3:8.1f} ms/frame = {1 / dt:5.2f} fps", flush=True)


def cmd_trace(args):
    jax = _init_jax()
    import jax.numpy as jnp

    from vrv_tpu.ops.camera_rays import raygen

    scene, cam = _bench_scene(args.grid)
    eye_l = scene.camera_to_local(cam[0])
    o, d, _ = raygen(
        eye_l, *(jnp.asarray(c, jnp.float32) for c in cam[1:]),
        args.width, args.height, 1, jnp.uint32(0),
    )
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    fns = {}
    for tracer in args.tracers.split(","):
        if tracer == "proc":
            from vrv_tpu.ops.dda_proc import trace_proc

            ps = scene.proc_static._replace(use_coarse=not args.no_coarse)
            pa = scene.proc_arrays
            fn = jax.jit(lambda o, d: trace_proc(ps, o, d, pd=pa).t)
        elif tracer.startswith("proc_pallas"):
            # token: proc_pallas[_uK][_nc] (K = cell-steps per loop
            # iteration; _nc = disable the in-kernel constant box skip)
            from vrv_tpu.ops.pallas.trace_proc import trace_proc_pallas

            rest = tracer[len("proc_pallas"):]
            ur = 1
            if "_u" in rest:
                ur = int(rest.split("_u", 1)[1].split("_", 1)[0])
            cap = 0
            if "_m" in rest:
                cap = int(rest.split("_m", 1)[1].split("_", 1)[0])
            brows = None
            if "_br" in rest:
                brows = int(rest.split("_br", 1)[1].split("_", 1)[0])
            ps = scene.proc_static
            if "_nc" in rest:
                ps = ps._replace(use_coarse=False)
            pa = scene.proc_arrays
            fn = jax.jit(
                lambda o, d, ur=ur, ps=ps, cap=cap, brows=brows: trace_proc_pallas(
                    ps, o, d, pd=pa, unroll=ur, max_steps_cap=cap,
                    block_rows=brows
                ).t
            )
        elif tracer == "rows":
            from vrv_tpu.ops.dda_rows import trace_rows_auto

            fn = jax.jit(
                lambda o, d: trace_rows_auto(
                    scene.grid.shape, scene.rows, scene.translucent.shape[0], o, d
                ).t
            )
        elif tracer == "skip":
            from vrv_tpu.ops import dda

            fn = jax.jit(
                lambda o, d: dda.trace_skip(
                    scene.grid, scene.dist, scene.translucent, o, d
                ).t
            )
        else:
            raise SystemExit(f"unknown tracer {tracer}")
        t0 = time.perf_counter()
        np.asarray(fn(o, d))
        print(f"  {tracer}: compile+first {time.perf_counter() - t0:6.1f}s", flush=True)
        fns[tracer] = lambda fn=fn: fn(o, d)
    n_rays = o.shape[0]
    for k, dt in _median_time(fns, n=args.reps).items():
        print(
            f"  {k}: {dt * 1e3:8.1f} ms/pass  {n_rays / dt / 1e6:7.1f} M rays/s",
            flush=True,
        )


def cmd_gather(args):
    _init_jax()
    import jax
    import jax.numpy as jnp

    n = args.n
    table = jnp.arange(1 << 19, dtype=jnp.int32)  # 2 MB
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 19, n), jnp.int32)
    vals = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)
    onehot_tbl = jnp.asarray(
        np.random.default_rng(2).standard_normal((256, 16)), jnp.bfloat16
    )
    rows256 = (idx & 255)

    gather = jax.jit(lambda i: jnp.take(table, i, axis=0).sum())
    scatter = jax.jit(lambda v, i: jnp.zeros(1 << 19, jnp.float32).at[i].add(v).sum())
    sort = jax.jit(lambda v: jax.lax.sort((v, idx), num_keys=1)[0][-1])

    def onehot_fn(r):
        oh = (r[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, onehot_tbl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).sum()

    onehot = jax.jit(onehot_fn)

    fns = {
        "gather": lambda: gather(idx),
        "scatter": lambda: scatter(vals, idx),
        "sort": lambda: sort(vals),
        "onehot(256)@(256,16)": lambda: onehot(rows256),
    }
    for k, dt in _median_time(fns, n=args.reps).items():
        print(f"  {k}: {dt / n * 1e9:7.2f} ns/elt  ({dt * 1e3:.2f} ms @ {n})", flush=True)


def cmd_noise(args):
    _init_jax()
    import jax
    import jax.numpy as jnp

    from vrv_tpu.ops.noise import LIPSCHITZ, simplex3

    n = args.n
    p = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), minval=-60.0, maxval=60.0)
    REP = 16

    def stack(p):
        # chain evals so the measurement is compute- not bandwidth-bound
        v = simplex3(p[:, 0], p[:, 1], p[:, 2])
        for i in range(REP - 1):
            v = simplex3(p[:, 0] + v, p[:, 1], p[:, 2])
        return v.sum()

    f = jax.jit(stack)
    dt = _median_time({"noise": lambda: f(p)}, n=args.reps)["noise"]
    print(
        f"  simplex3: {dt / (n * REP) * 1e9:6.2f} ns/eval "
        f"({n * REP / dt / 1e9:.2f} G evals/s)",
        flush=True,
    )
    g = jax.jit(jax.vmap(jax.grad(lambda q: simplex3(q[0], q[1], q[2]))))(p[:200000])
    gn = np.linalg.norm(np.asarray(g), axis=-1)
    print(f"  sup|grad| {gn.max():.3f} (bound {LIPSCHITZ})", flush=True)


def cmd_edits(args):
    _init_jax()
    from vrv_tpu.config import RenderConfig
    from vrv_tpu.render.megakernel import pack_bgra

    scene, cam = _bench_scene(args.grid)
    lamp = scene.table.block_idx("lamp")
    stone = scene.table.block_idx("stone")
    cfg = RenderConfig(
        width=args.width, height=args.height, samples_per_pixel=1,
        max_bounces=args.bounces, tracer="proc",
    )
    fns = {}
    rng = np.random.default_rng(0)
    for target in (0, 16, 64):
        while (scene.proc_static.n_edits if scene.proc_static else 10 ** 9) < target:
            c = rng.integers(8, args.grid - 8, 3) + np.asarray(scene.world_cfg.origin)
            scene.set_block(c, lamp if rng.random() < 0.1 else stone)
        if scene.proc_static is None:
            print(f"  edits>{target}: proc disabled (cap)", flush=True)
            continue
        sc_cfg = cfg

        def frame(scene=scene, cfg=sc_cfg):
            return pack_bgra(scene.render_samples(*cam, 0, cfg).sum(axis=0))

        t0 = time.perf_counter()
        np.asarray(frame())
        print(
            f"  n_edits={scene.proc_static.n_edits}: compile {time.perf_counter() - t0:5.1f}s",
            flush=True,
        )
        fns[f"edits={scene.proc_static.n_edits}"] = frame
        # measurements interleave below; scene keeps mutating per bucket, so
        # snapshot the closure args via default-arg binding above
        for k, dt in _median_time({k: v for k, v in fns.items() if str(scene.proc_static.n_edits) in k}, n=args.reps).items():
            print(f"  {k}: {dt * 1e3:8.1f} ms/pass", flush=True)


def cmd_editlat(args):
    """set_block latency: incremental distance-field patch vs full rebuild
    (VERDICT r1 next-round item 6's measurement)."""
    _init_jax()
    import jax

    scene, _ = _bench_scene(args.grid)
    stone = scene.table.block_idx("stone")
    air = int(scene.table.air)
    rng_ = np.random.default_rng(1)

    def one_edit(incremental: bool):
        c = rng_.integers(8, args.grid - 8, 3) + np.asarray(scene.world_cfg.origin)
        old = scene.get_block(c)
        new = stone if old == air else air
        t0 = time.perf_counter()
        if incremental:
            scene.set_block(c, new)
            jax.block_until_ready(scene.dist)
        else:
            # force the round-1 full path: raw grid write + full rebuild
            from vrv_tpu.render.scene import _set_cell
            import jax.numpy as jnp

            scene.grid = _set_cell(
                scene.grid, jnp.asarray(c - scene.origin.astype(np.int64), jnp.int32),
                jnp.uint8(new),
            )
            scene._rebuild_dist()
            jax.block_until_ready(scene.dist)
            scene._sync_proc()
        return time.perf_counter() - t0

    for inc in (True, False):
        one_edit(inc)  # warm compiles
        ts = [one_edit(inc) for _ in range(args.reps)]
        name = "incremental" if inc else "full-rebuild"
        print(f"  {name}: {statistics.median(ts) * 1e3:8.1f} ms/edit", flush=True)


def cmd_entry(args):
    """Decompose the entry-scene (lamp + edit + ego cube) frame cost.

    Interleaved in ONE process (the only trustworthy comparison on the
    tunneled v5e): pristine fused floor, entry full, and the entry scene
    with NEE / instances / both removed — differences isolate the cost
    of split-NEE, the in-kernel instance pass, and the SMEM edit list.
    """
    _init_jax()
    from vrv_tpu.config import RenderConfig
    from vrv_tpu.render.megakernel import pack_bgra

    cfg = RenderConfig(
        width=args.width, height=args.height, samples_per_pixel=1,
        max_bounces=args.bounces,
    )
    import __graft_entry__ as ge

    entry_scene, cam_e = ge._scene_args(args.grid, cfg)
    cam_e = (cam_e[0],) + tuple(np.asarray(c, np.float32) for c in cam_e[1:])
    # same world minus the ego cube (isolates the in-kernel instance pass)
    noinst_scene, _ = ge._scene_args(args.grid, cfg)
    noinst_scene.set_instances([])
    # same world with the content-dedup map stripped (flat one-hot tex
    # sets, K 30 instead of 13) — the pre-dedup formulation, interleaved
    nodedup_scene, _ = ge._scene_args(args.grid, cfg)
    nodedup_scene.proc_static = nodedup_scene.proc_static._replace(
        tex_dedup=())
    if nodedup_scene.light_tex_set:
        nodedup_scene.light_tex_set = tuple(
            x for g in nodedup_scene.light_tex_set
            for x in (g if isinstance(g, tuple) else (g,))
        )
    pristine_scene, cam_p = _bench_scene(args.grid)

    chunks = args.spp
    fns = {}

    def make(scene, cam, cfg, nchunks=None):
        n = chunks if nchunks is None else nchunks
        def frame(f=0):
            acc = None
            for c in range(n):
                smp = scene.render_samples(*cam, f * n + c, cfg).sum(axis=0)
                acc = smp if acc is None else acc + smp
            return pack_bgra(acc / n / cfg.samples_per_pixel)

        return frame

    variants = {
        "pristine": (pristine_scene, cam_p, cfg),
        "entry_full": (entry_scene, cam_e, cfg),
        "entry_iknee": (
            entry_scene, cam_e, cfg.replace(pallas_inkernel_nee=True)
        ),
        "entry_bs0": (
            entry_scene, cam_e, cfg.replace(pallas_batched_shade=False)
        ),
        "entry_nonee": (entry_scene, cam_e, cfg.replace(enable_nee=False)),
        "entry_noinst": (noinst_scene, cam_e, cfg),
        "entry_noinst_nonee": (
            noinst_scene, cam_e, cfg.replace(enable_nee=False)
        ),
        # unroll retune on the graded scene (module default is 12; the
        # round-2 tuning was done on the pristine world pre-NEE)
        "entry_u8": (entry_scene, cam_e, cfg.replace(pallas_unroll=8)),
        "entry_u16": (entry_scene, cam_e, cfg.replace(pallas_unroll=16)),
        "entry_u24": (entry_scene, cam_e, cfg.replace(pallas_unroll=24)),
        # in-kernel NEE at the retuned unrolls (the shadow sub-phase
        # changes the chunk mix, so its best unroll may differ)
        "entry_iknee_u16": (
            entry_scene, cam_e,
            cfg.replace(pallas_inkernel_nee=True, pallas_unroll=16),
        ),
        "entry_iknee_u20": (
            entry_scene, cam_e,
            cfg.replace(pallas_inkernel_nee=True, pallas_unroll=20),
        ),
        "entry_iknee_u24": (
            entry_scene, cam_e,
            cfg.replace(pallas_inkernel_nee=True, pallas_unroll=24),
        ),
        "entry_iknee_u32": (
            entry_scene, cam_e,
            cfg.replace(pallas_inkernel_nee=True, pallas_unroll=32),
        ),
        "entry_step_cap128": (
            entry_scene, cam_e, cfg.replace(pallas_step_cap=128)
        ),
        # march-body A/B: the round-3 convert-heavy step math
        # (cfg.pallas_march_opt=0) vs the round-4 convert/select-lean body
        "entry_mo0": (entry_scene, cam_e, cfg.replace(pallas_march_opt=0)),
        # level 2: resolved-lane freeze selects dropped (drift is unread)
        "entry_mo2": (entry_scene, cam_e, cfg.replace(pallas_march_opt=2)),
        # block patch-shape A/B (cfg.pallas_tile; capmodel's tile-shape
        # sweep, run as part of its main(), predicts the ordering)
        "entry_t8strip": (entry_scene, cam_e, cfg.replace(pallas_tile="8x128")),
        "entry_t32": (entry_scene, cam_e, cfg.replace(pallas_tile="32x32")),
        "entry_t16": (entry_scene, cam_e, cfg.replace(pallas_tile="16x64")),
        "entry_t64": (entry_scene, cam_e, cfg.replace(pallas_tile="64x16")),
        # texture-fetch formulation A/B (bit-identical variants; the
        # 'split' default's dot gets rewritten by XLA into a gather
        # fusion materializing (n,K,C) — 44+18 ms of the 335 ms frame)
        "entry_texdot": (entry_scene, cam_e, cfg.replace(tex_fetch="dot")),
        "entry_textake": (entry_scene, cam_e, cfg.replace(tex_fetch="take")),
        "entry_texmxu": (entry_scene, cam_e, cfg.replace(tex_fetch="mxu")),
        # in-kernel NEE pdf record A/B: off = the (n, L) XLA importance
        # recompute (the pre-2026-08-19 formulation)
        "entry_nopdfrec": (
            entry_scene, cam_e, cfg.replace(pallas_nee_record_pdf=False)
        ),
        "entry_nodedup": (nodedup_scene, cam_e, cfg),
        # chunk-granularity A/B: the same 8-sample frame as fewer, larger
        # dispatches — every glue fusion relaunches per chunk, so bigger
        # chunks amortize XLA launch overheads (~100 fusions/chunk)
        "entry_spp2x4": (
            entry_scene, cam_e, cfg.replace(samples_per_pixel=2), 4
        ),
        "entry_spp4x2": (
            entry_scene, cam_e, cfg.replace(samples_per_pixel=4), 2
        ),
        "entry_spp8x1": (
            entry_scene, cam_e, cfg.replace(samples_per_pixel=8), 1
        ),
        # round-5 A/Bs: in-kernel radiance (the 93 ms of XLA glue moved
        # into the kernel's retire path — docs/PERF.md round-5)
        "entry_ikr0": (
            entry_scene, cam_e, cfg.replace(pallas_inkernel_radiance=False)
        ),
        "entry_ikr_u16": (entry_scene, cam_e, cfg.replace(pallas_unroll=16)),
        "entry_ikr_u32": (entry_scene, cam_e, cfg.replace(pallas_unroll=32)),
    }
    # round-5 gameplay-cliff scenes: the entry world with a placed mirror
    # (the DEFAULT block, quirk Q7 — used to evict the fused kernel) and
    # with a 256-edit mixed build (per-chunk edit gate + cap raise)
    _only = args.tracers if args.tracers != "rows,proc" else ""
    if not _only or "entry_mirror" in _only:
        mirror_scene, _ = ge._scene_args(args.grid, cfg)
        mb = int(mirror_scene.table.block_idx("mirror"))
        gsz = args.grid
        org = np.asarray(mirror_scene.world_cfg.origin)
        solid = mirror_scene.table.solid[mirror_scene._grid_np]
        ys = np.nonzero(solid[gsz // 2 + 2, :, gsz // 2 + 2])[0]
        mirror_scene.set_block(
            np.array([gsz // 2 + 2, int(ys.max()) + 1, gsz // 2 + 2]) + org,
            mb,
        )
        assert mirror_scene.proc_static is not None
        assert mirror_scene.proc_static.edits_fused
        variants["entry_mirror"] = (mirror_scene, cam_e, cfg)
    if not _only or "entry_edits256" in _only:
        e256_scene, _ = ge._scene_args(args.grid, cfg)
        bt = e256_scene.table
        gsz = args.grid
        org = np.asarray(e256_scene.world_cfg.origin)
        solid = bt.solid[e256_scene._grid_np]
        rng_ = np.random.default_rng(11)
        ids = [int(bt.block_idx(n))
               for n in ("soil", "stone", "soil", "mirror")]
        lamp_id = int(bt.block_idx("lamp"))
        placed = 0
        # a local build: edits cluster in a 24^3 region near the camera
        # (realistic gameplay — a player building a structure)
        while placed < 256:
            x = int(rng_.integers(gsz // 2 - 12, gsz // 2 + 12))
            z = int(rng_.integers(gsz // 2 - 12, gsz // 2 + 12))
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
            if e256_scene.set_block(np.array([x, y, z]) + org, bid):
                placed += 1
        assert e256_scene.proc_static is not None, "256 edits must stay proc"
        assert e256_scene.proc_static.edits_fused
        variants["entry_edits256"] = (e256_scene, cam_e, cfg)
        # edit-gate / edit-compare formulation A/B (ProcStatic knobs;
        # value-identical — the round-5 session-2 regression hunt)
        import copy as _copy

        for nm, repl in (
            ("entry_e256_aabb", dict(edit_gate_mode="aabb")),
            ("entry_e256_off", dict(edit_gate_mode="off")),
            ("entry_e256_i32", dict(edit_cmp="i32")),
            ("entry_e256_aabb_i32",
             dict(edit_gate_mode="aabb", edit_cmp="i32")),
            ("entry_e256_off_i32",
             dict(edit_gate_mode="off", edit_cmp="i32")),
        ):
            sc_v = _copy.copy(e256_scene)
            sc_v.proc_static = e256_scene.proc_static._replace(**repl)
            variants[nm] = (sc_v, cam_e, cfg)
    only = _only
    for name, v in variants.items():
        if only and name not in only.split(","):
            continue
        scene, cam, c = v[:3]
        fns[name] = make(scene, cam, c, v[3] if len(v) > 3 else None)
        t0 = time.perf_counter()
        np.asarray(fns[name]())
        print(f"  {name}: compile+first {time.perf_counter() - t0:6.1f}s",
              flush=True)
    # Pallas-under-shard_map on the real chip (VERDICT r4 item 6): the
    # production multi-chip dispatch on a 1-device mesh, interleaved
    # against the plain single dispatch of the same 8-spp frame — proves
    # the fused kernel executes under shard_map on TPU and bounds the
    # shard_map overhead
    want = (lambda n: not only or n in only.split(","))
    if want("entry_one8") or want("entry_shmap1"):
        cfg8 = cfg.replace(samples_per_pixel=chunks)
        if want("entry_one8"):
            fns["entry_one8"] = lambda f=0: entry_scene.render(
                *cam_e, f, cfg8)
        if want("entry_shmap1"):
            from vrv_tpu.parallel.mesh import make_render_mesh

            mesh1 = make_render_mesh(
                1, spp=cfg8.samples_per_pixel, height=cfg8.height)
            fns["entry_shmap1"] = lambda f=0: entry_scene.render_sharded(
                mesh1, *cam_e, f, cfg8)
        for nm in ("entry_one8", "entry_shmap1"):
            if nm in fns:
                t0 = time.perf_counter()
                np.asarray(fns[nm]())
                print(f"  {nm}: compile+first "
                      f"{time.perf_counter() - t0:6.1f}s", flush=True)
    for k, dt in _median_time(fns, n=args.reps).items():
        print(f"  {k}: {dt * 1e3:8.1f} ms/frame = {1 / dt:5.2f} fps", flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("frame", cmd_frame), ("trace", cmd_trace), ("gather", cmd_gather),
        ("noise", cmd_noise), ("edits", cmd_edits), ("editlat", cmd_editlat),
        ("entry", cmd_entry),
    ):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--width", type=int, default=800)
        sp.add_argument("--height", type=int, default=600)
        sp.add_argument("--spp", type=int, default=8)
        sp.add_argument("--bounces", type=int, default=4)
        sp.add_argument("--grid", type=int, default=128)
        sp.add_argument("--tracers", type=str, default="rows,proc")
        sp.add_argument("--mode", type=str, default="megakernel")
        sp.add_argument("--no-coarse", action="store_true")
        sp.add_argument("--reps", type=int, default=5)
        sp.add_argument("--n", type=int, default=1 << 22)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
