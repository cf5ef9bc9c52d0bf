"""App-level multi-device rendering (--sharded N).

The CLI game loop renders frames across a ('samples' x 'rows') mesh via
GameWorld.render_mesh -> Scene.render_sharded — the user-facing caller
for parallel/render_pjit (previously reachable only from tests). Gate:
the sharded app run produces the same frames as the single-device run
within the established +/-1 u8 scatter-order band at >=99% exact pixels
(tests/test_parallel.py's gate). Runs on the harness's 8 virtual CPU
devices.
"""

import numpy as np

from vrv_tpu import app


def _run(tmp_path, name, extra):
    out = tmp_path / name
    argv = [
        "--width", "16", "--height", "8", "--spp", "4", "--bounces", "2",
        "--grid", "32", "--frames", "2", "--out", str(out),
    ] + extra
    assert app.main(argv) == 0
    from PIL import Image

    return np.asarray(Image.open(out)).astype(np.int32)


def test_app_sharded_matches_single(tmp_path):
    import jax

    assert len(jax.devices()) >= 4, "harness must provide virtual devices"
    single = _run(tmp_path, "single.png", [])
    sharded = _run(tmp_path, "sharded.png", ["--sharded", "4"])
    assert single.shape == sharded.shape
    diff = np.abs(single - sharded)
    assert diff.max() <= 1
    assert (diff == 0).mean() >= 0.99
    assert single.std() > 10  # non-trivial content


def test_app_progressive_ignores_sharded(tmp_path, capsys):
    img = _run(tmp_path, "prog.png", ["--sharded", "4", "--progressive"])
    assert img.std() > 10


def test_app_converged_single_and_sharded(tmp_path):
    """--converged N renders each frame as N one-dispatch accumulated
    passes (GameWorld.step(converged=N) -> Scene.render_converged); with
    --sharded it takes the pass-axis sharded path. Both must land within
    the +-1-u8 band of each other (f32 accumulation-order class) and
    carry real content."""
    conv = _run(tmp_path, "conv.png", ["--converged", "4"])
    assert conv.std() > 10
    conv_sh = _run(tmp_path, "conv_sh.png", ["--converged", "4",
                                             "--sharded", "4"])
    diff = np.abs(conv - conv_sh)
    assert diff.max() <= 1
    assert (diff == 0).mean() >= 0.99


def test_sharded_survives_live_spp_cycling(tmp_path):
    """spp is LIVE (the camera cycles it on 'r', quirk Q1) while the mesh
    factorization is static — a frame whose spp the mesh cannot split must
    fall back to the single-device render, not crash the session on the
    shard-divisibility assert."""
    import jax

    from vrv_tpu.camera import RenderingPreferences
    from vrv_tpu.config import RenderConfig, WorldConfig
    from vrv_tpu.parallel.mesh import make_render_mesh
    from vrv_tpu import app as app_mod

    render_cfg = RenderConfig(width=16, height=8, samples_per_pixel=2,
                              max_bounces=2)
    world_cfg = WorldConfig(size=(32, 32, 32), origin=(-16, -16, -16), seed=0)
    gw = app_mod.build_world(render_cfg, world_cfg)
    gw.render_mesh = make_render_mesh(2, spp=2, height=8)
    assert gw.render_mesh.shape["samples"] == 2

    gw.camera.set_rendering_preferences(RenderingPreferences(samples=2))
    f_sharded = gw.step()          # divisible: sharded path
    gw.camera.set_rendering_preferences(RenderingPreferences(samples=1))
    f_fallback = gw.step()         # 1 % 2 != 0: single-device fallback
    assert np.asarray(f_sharded).std() > 0
    assert np.asarray(f_fallback).std() > 0
    # converged likewise: 3 chunks cannot split over 2 devices
    f_conv = gw.step(converged=3)
    assert np.asarray(f_conv).std() > 0
