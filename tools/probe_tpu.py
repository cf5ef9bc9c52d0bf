"""TPU capability/perf probe (run on the real chip, no args).

Answers the questions that decide the Pallas kernel strategy:
  1. throughput of XLA-level random gathers from a 2 MB table (the DDA
     inner loop's cost driver)
  2. whether Pallas TPU supports vectorized gathers from a VMEM-resident
     table (jnp.take inside a kernel), and at what speed
  3. baseline timings of trace vs trace_skip on the worldgen grid

Writes findings to stdout; safe to re-run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)  # force full materialization through the tunnel
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(out)
    return (time.perf_counter() - t0) / n


def probe_xla_gather():
    print("== XLA gather throughput (2M-entry uint8 table) ==")
    table = jnp.asarray(np.random.randint(0, 255, size=(128 ** 3,), dtype=np.uint8))
    for n_idx in [1 << 20, 1 << 22]:
        idx = jnp.asarray(
            np.random.randint(0, 128 ** 3, size=(n_idx,), dtype=np.int32)
        )

        @jax.jit
        def gather(table, idx):
            return jnp.take(table, idx, axis=0).astype(jnp.int32).sum()

        dt = timeit(gather, table, idx)
        print(f"  n={n_idx:>8}: {dt*1e3:7.3f} ms  -> {n_idx/dt/1e9:6.2f} G gathers/s")


def probe_xla_gather_chain():
    print("== chained gathers (DDA-loop shaped: 64 sequential steps) ==")
    table = jnp.asarray(
        np.random.randint(0, 128 ** 3, size=(128 ** 3,), dtype=np.int32)
    )
    n_idx = 1 << 20
    idx0 = jnp.asarray(np.random.randint(0, 128 ** 3, size=(n_idx,), dtype=np.int32))

    @jax.jit
    def chain(table, idx):
        def body(i, idx):
            return jnp.take(table, idx, axis=0)
        return jax.lax.fori_loop(0, 64, body, idx).sum()

    dt = timeit(chain, table, idx0, n=5)
    print(f"  64 x {n_idx} gathers: {dt*1e3:.2f} ms -> {64*n_idx/dt/1e9:6.2f} G gathers/s")


def probe_pallas_gather():
    print("== Pallas VMEM gather variants ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_variant(name, build):
        try:
            fn, check = build()
            out = np.asarray(fn())
            ok = check(out)
            dt = timeit(fn)
            nel = out.size
            print(f"  {name}: correct={ok}  {dt*1e6:9.1f} us -> {nel/dt/1e9:.3f} G/s")
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # variant A: 2D table (rows, 128), gather rows via take(axis=0)
    ROWS, LANES, B = 1 << 14, 128, 1 << 12
    table2 = np.random.randint(0, 100, size=(ROWS, LANES), dtype=np.int32)
    idxr = np.random.randint(0, ROWS, size=(B,), dtype=np.int32)
    t2j, irj = jnp.asarray(table2), jnp.asarray(idxr)

    def build_rows():
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

        fn = jax.jit(lambda: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t2j, irj))
        return fn, lambda out: (out == table2[idxr]).all()

    try_variant("take rows (2D table, axis=0)", build_rows)

    # variant B: take_along_axis along lanes: out[s, j] = t[s, idx[s, j]]
    S = 256
    tab_b = np.random.randint(0, 100, size=(S, LANES), dtype=np.int32)
    idx_b = np.random.randint(0, LANES, size=(S, LANES), dtype=np.int32)
    tbj, ibj = jnp.asarray(tab_b), jnp.asarray(idx_b)

    def build_lanes():
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

        fn = jax.jit(lambda: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tbj, ibj))
        return fn, lambda out: (out == np.take_along_axis(tab_b, idx_b, 1)).all()

    try_variant("take_along_axis lanes (axis=1)", build_lanes)


def probe_trace():
    print("== end-to-end trace on worldgen 128^3 ==")
    from vrv_tpu.assets import load_block_table
    from vrv_tpu.config import WorldConfig
    from vrv_tpu.game.chunk import generate_dense_grid
    from vrv_tpu.ops import dda
    from vrv_tpu.ops.camera_rays import raygen

    table = load_block_table()
    wc = WorldConfig()
    grid = jnp.asarray(generate_dense_grid(wc, table))
    tl = jnp.asarray(table.translucent)
    dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(grid, table.air)
    print(f"  solid frac: {(np.asarray(grid) != table.air).mean():.3f}  "
          f"dist mean: {np.asarray(dist).mean():.2f}")

    eye = jnp.asarray([64.0, 100.0, 20.0])
    front = jnp.asarray([0.0, -0.5, 0.866])
    right = jnp.asarray([-1.0, 0.0, 0.0])
    up = jnp.asarray([0.0, -0.866, -0.5])
    o, d, _ = raygen(eye, front, right, up, 800, 600, 8, 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]

    f_exact = jax.jit(lambda o, d: dda.trace(grid, tl, o, d).t.sum())
    f_skip = jax.jit(lambda o, d: dda.trace_skip(grid, dist, tl, o, d).t.sum())
    dt = timeit(f_exact, o, d, n=5)
    print(f"  trace exact : {dt*1e3:8.2f} ms for {n} rays -> {n/dt/1e9:.3f} G rays/s")
    dt = timeit(f_skip, o, d, n=5)
    print(f"  trace skip  : {dt*1e3:8.2f} ms for {n} rays -> {n/dt/1e9:.3f} G rays/s")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe_xla_gather()
    probe_xla_gather_chain()
    probe_pallas_gather()
    probe_trace()
