"""Dynamic-entity (instance) rendering tests: the ego cube path."""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops.instances import trace_instances, transform_mesh
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.geometry import unitcube
from vrv_tpu.game.world import Isometry


def test_trace_instances_basic():
    # unit cube centred at origin (utils.rs unitcube spans [-0.5, 0.5]^3)
    mesh = unitcube()
    tri = jnp.asarray(mesh["positions"].reshape(-1, 3, 3))
    valid = jnp.ones((tri.shape[0],), bool)
    o = jnp.asarray([[-3.0, 0.0, 0.0], [0.0, 3.0, 0.0], [5.0, 5.0, 5.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    h = trace_instances(o, d, tri, valid)
    hits = np.asarray(h.hit)
    assert hits[0] and hits[1] and not hits[2]
    np.testing.assert_allclose(np.asarray(h.t)[0], 2.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.t)[1], 2.5, atol=1e-5)


def test_transform_mesh_translation_rotation():
    mesh = unitcube()
    iso = Isometry(np.array([10.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0, 0.0]))
    out = transform_mesh(mesh, iso)
    np.testing.assert_allclose(
        out["positions"].mean(0), [10.0, 0.0, 0.0], atol=1e-6
    )
    # 90-degree yaw: x axis -> -z? quat (cos45, 0, sin45, 0)
    q = np.array([np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0])
    out2 = transform_mesh(mesh, Isometry(np.zeros(3), q))
    ext = out2["positions"].max(0) - out2["positions"].min(0)
    np.testing.assert_allclose(ext, [1.0, 1.0, 1.0], atol=1e-5)


def test_instance_visible_in_render(block_table):
    wc = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(wc.size, block_table.air, dtype=np.uint8)
    grid[:, :2, :] = block_table.block_idx("stone")
    sc = Scene(wc, table=block_table, grid=grid)

    eye = np.array([8.0, 8.0, 8.0], np.float32)
    front = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=2, max_bounces=2)

    img_no = np.asarray(sc.render(eye, front, right, up, 0, cfg))

    cube = transform_mesh(unitcube(), Isometry(np.array([8.0, 5.0, 8.0])))
    sc.set_instances([cube])
    assert sc.instances_device is not None
    img_yes = np.asarray(sc.render(eye, front, right, up, 0, cfg))
    assert (img_no != img_yes).any()

    # removing instances restores the original image
    sc.set_instances([])
    img_back = np.asarray(sc.render(eye, front, right, up, 0, cfg))
    np.testing.assert_array_equal(img_no, img_back)


def test_checkpoint_roundtrip(block_table, tmp_path):
    from vrv_tpu.camera import SphericalCamera
    from vrv_tpu.utils.checkpoint import load_world, save_world

    wc = WorldConfig(size=(8, 8, 8), origin=(-4, -4, -4), seed=3)
    sc = Scene(wc, table=block_table)
    sc.set_block([0, 0, 0], block_table.block_idx("lamp"))
    cam = SphericalCamera()
    cam.pitch, cam.yaw, cam.offset = 0.3, 1.2, 7.5

    path = str(tmp_path / "world.npz")
    save_world(path, sc, camera=cam, frame=42)

    cam2 = SphericalCamera()
    sc2, frame = load_world(path, table=block_table, camera=cam2)
    assert frame == 42
    np.testing.assert_array_equal(np.asarray(sc.grid), np.asarray(sc2.grid))
    assert sc2.world_cfg == wc
    assert cam2.pitch == pytest.approx(0.3) and cam2.offset == pytest.approx(7.5)
    assert sc2.light_bvh.n_lights == sc.light_bvh.n_lights


def test_emissive_instance_is_light(block_table):
    """An uploaded entity with emissive textures becomes an NEE light
    (reference scene.rs:433-445, 529-530): the light BVH includes its
    triangles and the converged render shows its illumination."""
    lamp = int(block_table.block_idx("lamp"))
    wc = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    # enclosed stone room (no sky paths): without a light the interior
    # renders black, so the instance's illumination is unmistakable
    grid = np.full(wc.size, block_table.block_idx("stone"), dtype=np.uint8)
    grid[2:14, 2:14, 2:14] = block_table.air
    sc = Scene(wc, table=block_table, grid=grid)
    assert not sc.light_bvh.has_lights  # no grid lights in this world

    def hovering_cube(emissive: bool):
        mesh = unitcube()
        if emissive:
            mesh = dict(mesh, t=mesh["t"] + np.uint32(lamp * 6))
        return transform_mesh(mesh, Isometry(np.array([8.0, 6.0, 8.0])))

    sc.set_instances([hovering_cube(emissive=True)])
    n_em = int((block_table.texture_luminances[lamp * 6 : lamp * 6 + 6] > 0).sum())
    assert sc.light_bvh.n_lights == 2 * n_em  # 2 tris per emissive face
    assert sc.bvh_device is not None

    # same geometry, non-emissive: identical occlusion, no light
    eye = np.array([8.0, 10.0, 4.0], np.float32)
    front = np.array([0.0, -0.6, 0.8], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.8, -0.6], np.float32)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=8, max_bounces=3)

    img_lit = np.asarray(sc.render(eye, front, right, up, 0, cfg)).astype(np.float64)
    sc.set_instances([hovering_cube(emissive=False)])
    assert not sc.light_bvh.has_lights  # plain cube contributes no lights
    img_dark = np.asarray(sc.render(eye, front, right, up, 0, cfg)).astype(np.float64)

    # the lamp-textured cube must illuminate the scene
    assert img_lit[..., :3].mean() > img_dark[..., :3].mean() + 1.0

    # a moving NON-emissive entity never rebuilds the light structure
    before = sc.light_bvh
    sc.set_instances(
        [transform_mesh(unitcube(), Isometry(np.array([9.0, 5.0, 8.0])))]
    )
    assert sc.light_bvh is before


def test_retextured_emissive_instance_rebuilds_lights(block_table):
    """Equal geometry + equal power but different uv (or texture id) must
    still rebuild the light structure: uv/tex feed the split-NEE direct
    term's emission fetch, so a stale early-return would light the scene
    from the old texels (regression for the _set_instance_lights change
    check missing uv/tex)."""
    lamp = int(block_table.block_idx("lamp"))
    wc = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(wc.size, block_table.air, dtype=np.uint8)
    grid[:, :2, :] = block_table.block_idx("stone")
    sc = Scene(wc, table=block_table, grid=grid)

    mesh = unitcube()
    mesh = dict(mesh, t=mesh["t"] + np.uint32(lamp * 6))
    sc.set_instances([transform_mesh(mesh, Isometry(np.array([8.0, 6.0, 8.0])))])
    before = sc.light_bvh
    assert before.has_lights

    # identical triangles and luminance-power-area, shifted uv
    mesh2 = dict(mesh, uv=(mesh["uv"] + np.float32(0.25)) % 1.0)
    sc.set_instances([transform_mesh(mesh2, Isometry(np.array([8.0, 6.0, 8.0])))])
    assert sc.light_bvh is not before
