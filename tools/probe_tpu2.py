"""TPU probe round 2: decide the next trace optimization.

Measures (on the real chip):
  - row-gather throughput vs row width (does fetching 8/32/128-byte rows
    cost the same per ROW as 1-element gathers? -> z-column tracing)
  - scatter + sort throughput (cost of compaction strategies)
  - step distribution of the production tracer on the worldgen scene
  - new dense-body trace_skip timing vs the old numbers
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


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(out)
    return (time.perf_counter() - t0) / n


def probe_row_gather():
    print("== row gather: (N, W) rows from a 2M-byte table ==")
    n_idx = 1 << 20
    base = np.random.randint(0, 255, size=(128 ** 3,), dtype=np.uint8)
    for w in [1, 8, 32, 128]:
        table = jnp.asarray(base.reshape(-1, w))
        rows = 128 ** 3 // w
        idx = jnp.asarray(np.random.randint(0, rows, size=(n_idx,), dtype=np.int32))

        @jax.jit
        def g(table, idx):
            return jnp.take(table, idx, axis=0).astype(jnp.int32).sum()

        dt = timeit(g, table, idx)
        print(f"  W={w:>3}: {dt*1e3:8.2f} ms for {n_idx} rows "
              f"-> {n_idx/dt/1e9:.3f} G rows/s, {n_idx*w/dt/1e9:.2f} G cells/s")


def probe_scatter_sort():
    print("== scatter / sort throughput (compaction cost model) ==")
    n = 1 << 22
    x = jnp.asarray(np.random.rand(n).astype(np.float32))
    dest = jnp.asarray(np.random.permutation(n).astype(np.int32))

    @jax.jit
    def scat(x, dest):
        return jnp.zeros_like(x).at[dest].set(x).sum()

    dt = timeit(scat, x, dest, n=5)
    print(f"  scatter {n}: {dt*1e3:8.2f} ms -> {n/dt/1e9:.3f} G/s")

    keys = jnp.asarray(np.random.randint(0, 2, size=(n,), dtype=np.int32))

    @jax.jit
    def srt(keys, x):
        k, v = jax.lax.sort((keys, x), num_keys=1)
        return v.sum()

    dt = timeit(srt, keys, x, n=5)
    print(f"  sort(1-bit key + f32 payload) {n}: {dt*1e3:8.2f} ms -> {n/dt/1e9:.3f} G/s")

    @jax.jit
    def cums(keys):
        return jnp.cumsum(keys).sum()

    dt = timeit(cums, keys, n=5)
    print(f"  cumsum {n}: {dt*1e3:8.2f} ms -> {n/dt/1e9:.3f} G/s")


def probe_trace2():
    print("== production trace on worldgen 128^3 (dense body) ==")
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

    eye = jnp.asarray([64.0, 100.0, 20.0])
    front = jnp.asarray([0.0, -0.5, 0.866])
    right = jnp.asarray([-1.0, 0.0, 0.0])
    up = jnp.asarray([0.0, -0.866, -0.5])

    for spp, label in [(1, "1 spp (480K rays)"), (8, "8 spp (3.84M rays)")]:
        o, d, _ = raygen(eye, front, right, up, 800, 600, spp, 0)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        n = o.shape[0]
        f_skip = jax.jit(lambda o, d: dda.trace_skip(grid, dist, tl, o, d).t.sum())
        dt = timeit(f_skip, o, d, n=5)
        print(f"  trace_skip {label}: {dt*1e3:8.2f} ms -> {n/dt/1e9:.4f} G rays/s")

    # step distribution: run with truncated max_steps by monkeypatching is
    # invasive; instead count alive-after-k via a custom loop
    o, d, _ = raygen(eye, front, right, up, 800, 600, 1, 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    @jax.jit
    def alive_after(o, d, k):
        # reimplements the init + k steps of trace_skip cheaply via its
        # public API: compare hit/dead state by capping t_max? Instead use
        # brute proxy: count rays whose exact trace needs > k boundary
        # crossings by checking t of hit vs k-th crossing is hard; report
        # hits only.
        return dda.trace_skip(grid, dist, tl, o, d).hit.sum()

    print(f"  hit fraction: {float(np.asarray(alive_after(o, d, 0))) / o.shape[0]:.3f}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe_row_gather()
    probe_scatter_sort()
    probe_trace2()
