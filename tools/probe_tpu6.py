"""TPU probe 6: Mosaic (Pallas) 2D gather forms — correctness + real rate.

Chains gathers inside one kernel (data-dependent) so per-element cost is
measurable despite the tunnel's ~26 ms dispatch latency.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

CHAIN = 32


def timeit(fn, *a, n=6, warmup=1):
    for _ in range(warmup):
        out = fn(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n


def report(name, fn, check, n_elems):
    try:
        out = np.asarray(fn())
        ok = check(out)
        dt = timeit(fn)
        per = dt / (n_elems * CHAIN)
        print(f"  {name}: correct={ok}  {dt*1e3:8.2f} ms "
              f"-> {per*1e9:7.2f} ns/elt ({1/per/1e9:.2f} G/s)", flush=True)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def probe_lane_gather():
    # out[s, l] = t[s, idx[s, l]] chained: idx' = out & 127
    S, L = 1024, 128
    tab = np.random.randint(0, 1 << 20, size=(S, L), dtype=np.int32)
    idx0 = np.random.randint(0, L, size=(S, L), dtype=np.int32)

    def kernel(t_ref, i_ref, o_ref):
        t = t_ref[:]
        idx = i_ref[:]
        for _ in range(CHAIN):
            idx = jnp.take_along_axis(t, idx & (L - 1), axis=1)
        o_ref[:] = idx

    fn = jax.jit(lambda: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(tab), jnp.asarray(idx0)))

    def check(out):
        x = idx0
        for _ in range(CHAIN):
            x = np.take_along_axis(tab, x & (L - 1), axis=1)
        return (out == x).all()

    report(f"lane take_along_axis ({S}x{L})", fn, check, S * L)


def probe_row_gather_forms():
    R, L, B = 4096, 128, 1024
    tab = np.random.randint(0, R, size=(R, L), dtype=np.int32)
    idx0 = np.random.randint(0, R, size=(B,), dtype=np.int32)

    def kernel_take(t_ref, i_ref, o_ref):
        t = t_ref[:]
        idx = i_ref[:]
        for _ in range(CHAIN):
            rows = jnp.take(t, idx, axis=0)       # (B, L)
            idx = rows[:, 0] % R
        o_ref[:] = idx

    def build(kern):
        return jax.jit(lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(tab), jnp.asarray(idx0)))

    def check(out):
        x = idx0
        for _ in range(CHAIN):
            x = tab[x][:, 0] % R
        return (out == x).all()

    report(f"row take axis=0 ({R}x{L}, B={B})", build(kernel_take), check, B)

    def kernel_fancy(t_ref, i_ref, o_ref):
        t = t_ref[:]
        idx = i_ref[:]
        for _ in range(CHAIN):
            rows = t[idx]                          # fancy row index
            idx = rows[:, 0] % R
        o_ref[:] = idx

    report(f"row fancy-index ({R}x{L}, B={B})", build(kernel_fancy), check, B)

    # dynamic_slice-per-row via fori (expected slow; sanity reference)
    def kernel_dslice(t_ref, i_ref, o_ref):
        idx = i_ref[:]

        def body(k, idx):
            def one(j, acc):
                row = jax.lax.dynamic_slice(t_ref[:], (idx[j], 0), (1, L))
                return acc.at[j].set(row[0, 0] % R)
            return jax.lax.fori_loop(0, B, one, idx)

        o_ref[:] = jax.lax.fori_loop(0, CHAIN, body, idx)

    # (skipped by default: known-slow scalar loop)


def probe_xla_lane_gather():
    # same lane gather OUTSIDE pallas (plain XLA) for comparison
    S, L = 1024, 128
    tab = np.random.randint(0, 1 << 20, size=(S, L), dtype=np.int32)
    idx0 = np.random.randint(0, L, size=(S, L), dtype=np.int32)

    @jax.jit
    def fn():
        t = jnp.asarray(tab)
        idx = jnp.asarray(idx0)
        def body(_, idx):
            return jnp.take_along_axis(t, idx & (L - 1), axis=1)
        return jax.lax.fori_loop(0, CHAIN, body, idx)

    def check(out):
        x = idx0
        for _ in range(CHAIN):
            x = np.take_along_axis(tab, x & (L - 1), axis=1)
        return (out == x).all()

    report(f"XLA lane take_along_axis ({S}x{L})", fn, check, S * L)


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe_lane_gather()
    probe_row_gather_forms()
    probe_xla_lane_gather()
