"""End-to-end render smoke tests on tiny scenes (CPU).

These validate the whole megakernel path: raygen -> DDA -> shading ->
accumulation -> BGRA packing, on hand-built worlds where the expected
image structure is known.
"""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene


@pytest.fixture(scope="module")
def flat_world(block_table):
    """16^3 world: stone floor at y<2, air above; camera above looking down."""
    cfg = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[:, :2, :] = block_table.block_idx("stone")
    return Scene(cfg, table=block_table, grid=grid)


def _cam_down():
    eye = np.array([8.0, 10.0, 8.0], np.float32)
    front = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    return eye, front, right, up


def test_albedo_frame_shape_and_content(flat_world, block_table):
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=1, max_bounces=1)
    img = np.asarray(flat_world.render(*_cam_down(), frame=0, cfg=cfg))
    assert img.shape == (24, 32, 4) and img.dtype == np.uint8
    assert (img[..., 3] == 255).all()
    # 1 bounce: central rays hit stone -> emissivity 0 -> black; steep
    # corner rays exit the 16^3 grid sides -> sky 50 -> clipped white
    assert (img[8:16, 10:22, :3] == 0).all()
    assert (img[0, 0, :3] == 255).all()


def test_two_bounce_sky_illuminates_floor(flat_world):
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=2, max_bounces=2)
    img = np.asarray(flat_world.render(*_cam_down(), frame=0, cfg=cfg))
    # bounce 0 hits floor, bounce 1 hemisphere ray mostly escapes to sky(50):
    # color = R_floor * 50-ish > 0
    assert img[..., :3].max() > 10


def test_sky_ray_is_clipped_white(flat_world):
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1, max_bounces=1)
    eye = np.array([8.0, 10.0, 8.0], np.float32)
    front = np.array([0.0, 1.0, 0.0], np.float32)   # looking up at sky
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    img = np.asarray(flat_world.render(eye, front, right, up, frame=0, cfg=cfg))
    # sky emissivity 50 -> 50*255 clipped to 255 (quirk Q3 hard clip)
    assert (img[..., :3] == 255).all()


def test_determinism_same_frame_same_image(flat_world):
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=2, max_bounces=3)
    a = np.asarray(flat_world.render(*_cam_down(), frame=5, cfg=cfg))
    b = np.asarray(flat_world.render(*_cam_down(), frame=5, cfg=cfg))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(flat_world.render(*_cam_down(), frame=6, cfg=cfg))
    assert (a != c).any()  # frame reseeds rng (pathtrace_shader.rs:900)


def test_lamp_illuminates_neighbourhood(block_table):
    cfg = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[:, :2, :] = block_table.block_idx("stone")
    sc_dark = Scene(cfg, table=block_table, grid=grid.copy())
    grid2 = grid.copy()
    grid2[8, 2, 8] = block_table.block_idx("lamp")
    sc_lamp = Scene(cfg, table=block_table, grid=grid2)
    assert sc_lamp.light_bvh.has_lights and not sc_dark.light_bvh.has_lights

    # camera close above the floor next to the lamp, looking at the floor,
    # 4 bounces with NEE
    eye = np.array([6.0, 4.0, 8.0], np.float32)
    front = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    rc = RenderConfig(width=16, height=12, samples_per_pixel=8, max_bounces=4)
    img_dark = np.asarray(sc_dark.render_samples(eye, front, right, up, 0, rc)).mean(0)
    img_lamp = np.asarray(sc_lamp.render_samples(eye, front, right, up, 0, rc)).mean(0)
    assert img_lamp.mean() > img_dark.mean()


def test_set_block_updates_render_and_lights(block_table):
    cfg = WorldConfig(size=(8, 8, 8), origin=(0, 0, 0), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    sc = Scene(cfg, table=block_table, grid=grid)
    assert not sc.light_bvh.has_lights
    assert sc.set_block([4, 4, 4], block_table.block_idx("lamp"))
    assert sc.light_bvh.has_lights
    assert sc.light_bvh.n_lights == 12  # 6 exposed faces x 2 tris
    assert sc.get_block([4, 4, 4]) == block_table.block_idx("lamp")
    assert sc.set_block([4, 4, 4], block_table.air)
    assert not sc.light_bvh.has_lights
    # out-of-world edit refused
    assert not sc.set_block([99, 0, 0], 1)
