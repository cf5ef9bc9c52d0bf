"""TPU probe 8: full frame, rows(W=4)+compaction vs skip tracer."""
import os, sys, time
os.environ.setdefault("VRV_ROW_W", "4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene
from vrv_tpu.render.megakernel import pack_bgra


def timeit(fn, *a, n=4, warmup=1):
    for _ in range(warmup):
        out = fn(*a)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n


g = 128
wc = WorldConfig(size=(g, g, g), origin=(-g//2, -g//2, -g//2), seed=0)
scene = Scene(wc)
grid_np = np.asarray(scene.grid)
solid = scene.table.solid[grid_np]
ys = np.nonzero(solid[g//2, :, g//2])[0]
y_surf = (int(ys.max()) if len(ys) else g//2) + wc.origin[1]
eye = np.array([0.0, y_surf + 12.0, -24.0], np.float32)
front = np.array([0.0, -0.35, 0.936], np.float32)
right = np.array([-1.0, 0.0, 0.0], np.float32)
up = np.array([0.0, -0.936, -0.35], np.float32)

print("device:", jax.devices()[0], "row table:", scene.rows.shape)
for tracer in ("skip", "rows"):
    cfg = RenderConfig(width=800, height=600, samples_per_pixel=1, max_bounces=4,
                       tracer=tracer)

    def frame(f):
        acc = None
        for c in range(8):
            smp = scene.render_samples(eye, front, right, up, int(f)*8 + c, cfg).sum(axis=0)
            acc = smp if acc is None else acc + smp
        return pack_bgra(acc / 8)

    t0 = time.perf_counter()
    img0 = np.asarray(frame(0))
    print(f"  {tracer}: compile+first {time.perf_counter()-t0:6.1f}s", flush=True)
    dt = timeit(frame, 1, n=3)
    print(f"  {tracer}: {dt*1e3:8.1f} ms/frame = {1/dt:5.2f} fps", flush=True)
