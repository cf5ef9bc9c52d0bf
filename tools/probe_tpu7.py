"""TPU probe 7: row-width sweep for the rows tracer on the bench workload."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from vrv_tpu.assets import load_block_table
from vrv_tpu.config import WorldConfig
from vrv_tpu.game.chunk import generate_dense_grid
from vrv_tpu.ops import dda
from vrv_tpu.ops.camera_rays import raygen
from vrv_tpu.ops.dda_rows import pack_rows, trace_rows


def timeit(fn, *a, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n


table = load_block_table()
wc = WorldConfig()
grid = jnp.asarray(generate_dense_grid(wc, table))
tl = jnp.asarray(table.translucent)
dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(grid, table.air)

eye = jnp.asarray([64.0, 100.0, 20.0])
front = jnp.asarray([0.0, -0.35, 0.936])
right = jnp.asarray([-1.0, 0.0, 0.0])
up = jnp.asarray([0.0, -0.936, -0.35])
o, d, _ = raygen(eye, front, right, up, 800, 600, 1, 0)
o = o.reshape(-1, 3); d = d.reshape(-1, 3)
n = o.shape[0]

print("device:", jax.devices()[0])
f_skip = jax.jit(lambda o, d: dda.trace_skip(grid, dist, tl, o, d).t.sum())
dt = timeit(f_skip, o, d)
print(f"  trace_skip (compacted): {dt*1e3:8.1f} ms  ({n/dt/1e6:.1f} M rays/s)", flush=True)
for w in (4, 8, 16):
    rows = jax.jit(pack_rows, static_argnums=(3,))(grid, dist, tl, w)
    f_rows = jax.jit(lambda o, d, rows=rows: trace_rows((128,128,128), rows, 8, o, d).t.sum())
    dt = timeit(f_rows, o, d)
    print(f"  trace_rows W={w:>2}:        {dt*1e3:8.1f} ms  ({n/dt/1e6:.1f} M rays/s)", flush=True)
