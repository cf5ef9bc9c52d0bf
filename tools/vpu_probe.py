"""VPU op-cost microbenchmarks + march-body op audit.

Two questions drive the round-4 kernel work (docs/PERF.md round-4):

1. `audit` — what does one march step of the fused path kernel
   (ops/pallas/path_proc.py) actually consist of, by HLO op type?
   Traced with jax.make_jaxpr over the real kernel helpers on one
   (8, 128) block, so the histogram is the exact op mix Mosaic lowers.

2. `ops` — what does each op class COST on the v5e VPU? A pallas
   kernel runs P independent dependent-chains of K ops of one type per
   fori_loop iteration; with P >= 4 the VPU pipeline is saturated and
   the slope of time vs total ops is the per-op throughput cost. The
   i32 multiply is the interesting one: the lattice hash
   (ops/noise._grad_index) spends 28 of them per occupancy eval, and
   TPU VPUs historically emulate 32-bit integer multiply with several
   16-bit passes.

Usage:
  python tools/vpu_probe.py audit
  python tools/vpu_probe.py ops          # on the chip
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def cmd_audit():
    import jax
    import jax.numpy as jnp

    from vrv_tpu.ops.noise import _seed_mix
    from vrv_tpu.ops.pallas.trace_proc import _simplex3_seeded, exact_step

    f32 = jnp.float32
    sm = _seed_mix(0)

    def density(x, y, z):
        return _simplex3_seeded(x / 20.0, y / 20.0, z / 20.0, sm) - y / 500.0

    shp = (8, 128)
    xs = [jnp.zeros(shp, f32)] * 3

    def hist(jaxpr):
        from collections import Counter

        c = Counter()

        def walk(jp):
            for eqn in jp.eqns:
                c[eqn.primitive.name] += 1
                for p in eqn.params.values():
                    if hasattr(p, "jaxpr"):
                        walk(p.jaxpr)
        walk(jaxpr.jaxpr)
        return c

    def report(name, fn, *args):
        c = hist(jax.make_jaxpr(fn)(*args))
        total = sum(c.values())
        print(f"\n== {name}: {total} ops ==")
        for k, v in sorted(c.items(), key=lambda kv: -kv[1]):
            print(f"  {k:24s} {v}")
        # integer multiplies specifically
        return c

    report("density (occupancy eval)", density, *xs)

    ivals = [jnp.zeros(shp, jnp.int32)] * 3
    fvals = [jnp.zeros(shp, f32)] * 9
    bvals = [jnp.zeros(shp, bool)] * 3
    report(
        "exact_step",
        lambda scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz, bx, by, bz:
        exact_step(scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                   bx, by, bz, (128, 128, 128)),
        *ivals, *fvals, *bvals,
    )


def _chain_kernel(op, P, K):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref, *, iters):
        def mk(p):
            return x_ref[:] + jnp.float32(p) if op.startswith("f") else (
                x_ref[:].astype(jnp.int32) + jnp.int32(p)
            )

        carries = [mk(p) for p in range(P)]

        def body(i, cs):
            out = []
            for c in cs:
                v = c
                for _ in range(K):
                    if op == "i32mul":
                        v = v * jnp.int32(0x27D4EB2F)
                    elif op == "i32add":
                        v = v + jnp.int32(0x27D4EB2F)
                    elif op == "i32xor":
                        v = v ^ jnp.int32(0x27D4EB2F)
                    elif op == "i32shr":
                        v = v >> jnp.int32(1)
                    elif op == "i32sel":
                        v = jnp.where(v > 0, v, v + 1)
                    elif op == "f32mul":
                        v = v * jnp.float32(1.0000001)
                    elif op == "f32add":
                        v = v + jnp.float32(1.0000001)
                    elif op == "f32sel":
                        v = jnp.where(v > 0.0, v, v + 1.0)
                    elif op == "f32cvt":
                        v = v.astype(jnp.int32).astype(jnp.float32)
                    elif op == "f32floor":
                        v = jnp.floor(v * jnp.float32(0.9999))
                    else:
                        raise ValueError(op)
                out.append(v)
            return out

        carries = jax.lax.fori_loop(0, iters, body, carries)
        acc = carries[0]
        for c in carries[1:]:
            acc = acc + c
        o_ref[:] = acc.astype(jnp.float32)

    return kernel


def cmd_ops(reps=5, iters=100000):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    print("device:", jax.devices()[0], flush=True)

    P, K = 8, 32
    x = jnp.ones((8, 128), jnp.float32)
    ops = ["f32add", "f32mul", "f32sel", "f32cvt", "f32floor",
           "i32add", "i32mul", "i32xor", "i32shr", "i32sel"]
    fns = {}
    for op in ops:
        kern = _chain_kernel(op, P, K)

        @jax.jit
        def run(x, _k=kern):
            return pl.pallas_call(
                functools.partial(_k, iters=iters),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)

        fns[op] = functools.partial(run, x)

    # baseline with K=1 isolates loop overhead
    base = {}
    for op in ops:
        kern = _chain_kernel(op, P, 1)

        @jax.jit
        def run(x, _k=kern):
            return pl.pallas_call(
                functools.partial(_k, iters=iters),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)

        base[op] = functools.partial(run, x)

    for f in list(fns.values()) + list(base.values()):
        np.asarray(f())
    samples = {k: [] for k in ops}
    bsamples = {k: [] for k in ops}
    for _ in range(reps):
        for op in ops:
            t0 = time.perf_counter()
            np.asarray(fns[op]())
            samples[op].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(base[op]())
            bsamples[op].append(time.perf_counter() - t0)
    print(f"\nP={P} chains x K={K} ops x {iters} iters, (8,128) vregs")
    print(f"{'op':10s} {'t_K8 (ms)':>10s} {'t_K1 (ms)':>10s} {'ns/op/vreg':>11s}")
    out = {}
    for op in ops:
        t8 = statistics.median(samples[op])
        t1 = statistics.median(bsamples[op])
        per = (t8 - t1) / (P * (K - 1) * iters) * 1e9
        out[op] = per
        print(f"{op:10s} {t8 * 1e3:10.3f} {t1 * 1e3:10.3f} {per:11.3f}")
    return out


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "audit"
    if cmd == "audit":
        cmd_audit()
    elif cmd == "ops":
        cmd_ops()
    else:
        raise SystemExit(f"unknown cmd {cmd}")
