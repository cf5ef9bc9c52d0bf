"""TPU probe 3: row tracer + full-frame timings on the real chip."""

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


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    from vrv_tpu.assets import load_block_table
    from vrv_tpu.config import RenderConfig, WorldConfig
    from vrv_tpu.game.chunk import generate_dense_grid
    from vrv_tpu.ops import dda
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.ops.dda_rows import pack_rows, trace_rows
    from vrv_tpu.render.scene import Scene

    table = load_block_table()
    wc = WorldConfig()
    grid = jnp.asarray(generate_dense_grid(wc, table))
    tl = jnp.asarray(table.translucent)
    dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(grid, table.air)
    rows = jax.jit(pack_rows)(grid, dist, tl)

    eye = jnp.asarray([64.0, 100.0, 20.0])
    front = jnp.asarray([0.0, -0.5, 0.866])
    right = jnp.asarray([-1.0, 0.0, 0.0])
    up = jnp.asarray([0.0, -0.866, -0.5])

    print("== trace comparison (3.84M rays, worldgen 128^3) ==")
    o, d, _ = raygen(eye, front, right, up, 800, 600, 8, 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]

    f_skip = jax.jit(lambda o, d: dda.trace_skip(grid, dist, tl, o, d).t.sum())
    f_rows = jax.jit(
        lambda o, d: trace_rows((128, 128, 128), rows, 8, o, d).t.sum()
    )
    dt = timeit(f_skip, o, d)
    print(f"  trace_skip: {dt*1e3:8.2f} ms -> {n/dt/1e6:.1f} M rays/s")
    dt = timeit(f_rows, o, d)
    print(f"  trace_rows: {dt*1e3:8.2f} ms -> {n/dt/1e6:.1f} M rays/s")

    print("== full frames (800x600, 128^3 worldgen + 1 lamp) ==")
    scene = Scene(wc)
    lamp = scene.table.block_idx("lamp")
    scene.set_block(np.array([0, 8, 0]), lamp)
    eye_w = np.array([0.0, 36.0, -44.0], np.float32)

    for spp, bounces in [(1, 1), (4, 4), (8, 4)]:
        cfg = RenderConfig(width=800, height=600, samples_per_pixel=spp,
                           max_bounces=bounces)
        fn = lambda f: scene.render(eye_w, front, right, up, int(f), cfg)
        dt = timeit(fn, 1, n=4)
        rays = 800 * 600 * spp * bounces
        print(f"  {spp}spp/{bounces}b: {dt*1e3:8.1f} ms = {1/dt:6.2f} fps  "
              f"({rays/dt/1e9:.3f} G paths*bounce/s)")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    main()
