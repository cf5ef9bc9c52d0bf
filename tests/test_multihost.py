"""Multi-host (DCN) scale-out: parallel/multihost.initialize, for real.

Two actual processes bootstrap jax.distributed over a localhost
coordinator (CPU backend, 2 virtual devices each), build the standard
('samples' x 'rows') mesh over the 4 GLOBAL devices, and render the
same frame Scene.render_sharded renders single-process — byte-identical
after the cross-process row gather. This exercises the whole SURVEY §5
distributed story end-to-end: bootstrap, global mesh, replicated world
arrays, the sample-merge psum riding DCN, sharded output.
"""

import os
import socket
import subprocess
import sys
import textwrap

from tests.conftest import REPO_ROOT, clean_env

CHILD = textwrap.dedent("""
    import sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    from vrv_tpu.parallel.multihost import initialize, is_primary
    n = initialize(f"127.0.0.1:{port}", 2, pid)
    assert n == 4, n
    assert is_primary() == (pid == 0)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from vrv_tpu.assets import load_block_table
    from vrv_tpu.config import RenderConfig, WorldConfig
    from vrv_tpu.render.scene import Scene
    from vrv_tpu.parallel.mesh import make_render_mesh

    t = load_block_table()
    g = 16
    sc = Scene(WorldConfig(size=(g, g, g), origin=(0, 0, 0), seed=0),
               table=t)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=4,
                       max_bounces=2, tracer="proc")
    eye = np.array([8.0, 2.0, 1.0], np.float32)
    front = jnp.asarray([0.0, 0.6, 0.8], jnp.float32)
    right = jnp.asarray([-1.0, 0.0, 0.0], jnp.float32)
    up = jnp.asarray([0.0, -0.8, 0.6], jnp.float32)

    mesh = make_render_mesh(n, spp=cfg.samples_per_pixel,
                            height=cfg.height)
    assert len(mesh.devices.flatten()) == 4  # spans both processes
    img = sc.render_sharded(mesh, eye, front, right, up, 0, cfg)
    from jax.experimental import multihost_utils
    img_g = np.asarray(multihost_utils.process_allgather(img, tiled=True))
    single = np.asarray(sc.render(eye, front, right, up, 0, cfg))
    assert img_g.shape == single.shape, (img_g.shape, single.shape)
    diff = np.abs(img_g.astype(int) - single.astype(int))
    assert diff.max() == 0, f"max diff {diff.max()}"
    assert single.std() > 1.0
    print(f"proc {pid} OK", flush=True)
""")


def test_two_process_distributed_render(tmp_path):
    # free localhost port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    child = tmp_path / "mh_child.py"
    child.write_text(CHILD)
    env = clean_env(n_devices=2)
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), str(port)],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} OK" in out
