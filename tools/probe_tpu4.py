"""TPU probe 4: decompose the bench frame cost per stage."""

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


def timeit(fn, *args, n=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    from vrv_tpu.config import RenderConfig, WorldConfig
    from vrv_tpu.ops import dda
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.render.scene import Scene

    g = 128
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

    print("== bench-scene decomposition (800x600, 1 spp) ==")
    # trace-only on primary rays
    o, d, _ = raygen(scene.camera_to_local(eye), jnp.asarray(front),
                     jnp.asarray(right), jnp.asarray(up), 800, 600, 1, 0)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    f_tr = jax.jit(lambda o, d: dda.trace_skip(
        scene.grid, scene.dist, scene.translucent, o, d).t.sum())
    dt = timeit(f_tr, o, d)
    print(f"  primary trace only       : {dt*1e3:8.1f} ms")

    for b in (1, 2, 4):
        cfg = RenderConfig(width=800, height=600, samples_per_pixel=1, max_bounces=b)
        fn = lambda f: scene.render_samples(eye, front, right, up, int(f), cfg).sum()
        dt = timeit(fn, 3)
        print(f"  render_samples {b} bounce : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    main()
