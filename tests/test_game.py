"""Game-layer tests: world step protocol, physics, ego controls, picking.

Anchored on reference behaviors (SURVEY.md section 4.3): hover-controller
step responses, set_block semantics, trace_to_solid face truth table,
manager fan-out and change replay.
"""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, SimConfig, WorldConfig
from vrv_tpu.game import world as w
from vrv_tpu.game.chunk_manager import ChunkManager, ChunkQuerier
from vrv_tpu.game.input import CursorMoved, KeyInput, MouseInput
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.geometry import unitcube


@pytest.fixture()
def flat_scene(block_table):
    cfg = WorldConfig(size=(32, 16, 32), origin=(-16, -8, -16), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[:, :8, :] = block_table.block_idx("stone")  # floor up to y=0 (world)
    return Scene(cfg, table=block_table, grid=grid)


def _make_world(scene, **kw):
    gw = w.GameWorld(scene, extent=(80, 60), render_cfg=RenderConfig(width=8, height=6, samples_per_pixel=1, max_bounces=1), **kw)
    mesh = unitcube()
    gw.add_entity(
        0,
        w.EntityCreationData(
            physics=w.EntityPhysicsData(
                rigid_body_type=w.KINEMATIC_VELOCITY,
                hitbox=w.Hitbox(np.array([0.5, 0.5, 0.5])),
                linvel=np.zeros(3),
                angvel=np.zeros(3),
                controlled=True,
                grounded=False,
            ),
            mesh=mesh,
            isometry=w.Isometry(np.array([0.0, 5.0, 0.0])),
        ),
    )
    return gw


def test_kinematic_motion_from_keys(flat_scene):
    gw = _make_world(flat_scene)
    gw.handle_event(KeyInput("w", True))
    gw.step(render=False)   # ego manager emits PhysicsSetVelocity
    gw.step(render=False)   # physics applies it and moves the body
    pos = gw.entities[0].isometry.translation
    assert pos[0] > 0.0     # moved along +x at 10 m/s
    # kinematic bodies ignore gravity
    assert pos[1] == pytest.approx(5.0)


def test_tab_toggles_body_type_and_gravity_applies(flat_scene):
    gw = _make_world(flat_scene)
    gw.handle_event(KeyInput("tab", True))
    gw.step(render=False)
    assert gw.entities[0].physics_data.rigid_body_type == w.DYNAMIC
    y0 = gw.entities[0].isometry.translation[1]
    for _ in range(3):
        gw.step(render=False)
    assert gw.entities[0].isometry.translation[1] < y0  # falling


def test_dynamic_body_lands_and_hovers(flat_scene):
    gw = _make_world(flat_scene)
    gw.handle_event(KeyInput("tab", True))
    for _ in range(200):
        gw.step(render=False)
    pos = gw.entities[0].isometry.translation
    # floor top at world y=0; box half-extent 0.5 -> rest center near y=0.5
    assert 0.4 < pos[1] < 0.75
    # manager-internal grounded flag is set...
    phys = gw.managers[1]
    assert phys.bodies[0].grounded
    # ...but the entity-table flag stays False: the reference computes
    # should_be_grounded = grounded && !clipping where clipping is merely
    # "the downward cast hit" (physics_manager.rs:163-188, 350-356), which
    # contradicts grounded = dist < 0.05 — reproduced faithfully
    assert not gw.entities[0].physics_data.grounded


def test_r_key_cycles_spp(flat_scene):
    gw = _make_world(flat_scene)
    assert gw.camera.rendering_preferences().samples == 1
    gw.handle_event(KeyInput("r", True))
    gw.step(render=False)
    assert gw.camera.rendering_preferences().samples == 2
    for want in (4, 8, 16, 32, 64, 1):
        gw.handle_event(KeyInput("r", True))
        gw.step(render=False)
        assert gw.camera.rendering_preferences().samples == want


def test_digit_keys_select_block(flat_scene):
    gw = _make_world(flat_scene)
    ego_mgr = gw.managers[2]
    assert ego_mgr.selected_block_id == 3  # mirror, quirk Q7
    gw.handle_event(KeyInput("5", True))
    gw.step(render=False)
    assert ego_mgr.selected_block_id == 4


def test_trace_to_solid_truth_table(flat_scene):
    q = ChunkQuerier(flat_scene)
    # straight down onto the floor (top at world y=0): hits UP face
    hit = q.trace_to_solid(np.array([0.5, 3.0, 0.5]), np.array([0.0, -1.0, 0.0]), 10.0)
    assert hit is not None
    coords, face = hit
    assert face == 3  # UP
    np.testing.assert_array_equal(coords, [0, -1, 0])
    # horizontal ray above the floor: miss within radius
    assert q.trace_to_solid(np.array([0.5, 3.0, 0.5]), np.array([1.0, 0.0, 0.0]), 10.0) is None
    # exact-DDA variant agrees here
    coords2, face2 = q.trace_to_solid(
        np.array([0.5, 3.0, 0.5]), np.array([0.0, -1.0, 0.0]), 10.0, exact=True
    )
    assert face2 == 3 and np.array_equal(coords, coords2)


def test_mouse_break_and_place(flat_scene, block_table):
    t = [0.0]
    gw = _make_world(flat_scene, clock=lambda: t[0])
    # aim camera straight down from the ego at (0,5,0); shrink the orbit
    # offset so the eye stays well within the 10-unit pick radius of the
    # floor (ego_controls_manager.rs:245)
    gw.camera.pitch = -np.pi / 2 * 0.99
    gw.camera.offset = 0.5
    gw.camera.worldup = np.array([0.0, -1.0, 0.0])
    # cursor at screen centre -> uv (0,0) -> ray along front
    gw.handle_event(CursorMoved(40.0, 30.0))
    gw.handle_event(MouseInput("left", True))
    t[0] += 1.0
    gw.step(render=False)   # ego emits WorldSetBlock(break)
    t[0] += 1.0
    gw.step(render=False)   # chunk manager applies it
    # some floor block got broken to air
    grid = np.asarray(gw.scene.grid)
    assert (grid[:, 7, :] == block_table.air).any()


def test_set_block_neighbor_dirtying(block_table):
    cfg = WorldConfig(size=(64, 32, 32), origin=(0, 0, 0), seed=0)
    sc = Scene(cfg, table=block_table)
    cm = ChunkManager(sc, generate=True, budget_per_frame=0)
    cm.set_center_chunk([0, 0, 0])
    a = cm.chunks[(0, 0, 0)]
    b = cm.chunks[(1, 0, 0)]
    a.data = np.full((32, 32, 32), block_table.air, np.uint8)
    a.data_set_at = 0
    b.data = np.full((32, 32, 32), block_table.air, np.uint8)
    b.data_set_at = 0
    # edit at the +x border of chunk (0,0,0) dirties chunk (1,0,0)
    cm.set_block([31, 5, 5], block_table.block_idx("stone"))
    assert a.data_set_at > 0
    assert b.data_set_at == a.data_set_at
    assert a.data[31, 5, 5] == block_table.block_idx("stone")
    # and the scene grid saw the edit
    assert sc.get_block([31, 5, 5]) == block_table.block_idx("stone")
    # interior edit does not dirty neighbors
    before = b.data_set_at
    cm.set_block([5, 5, 5], block_table.block_idx("stone"))
    assert b.data_set_at == before


def test_chunk_load_unload_radii(block_table):
    cfg = WorldConfig(size=(32, 32, 32), origin=(0, 0, 0), seed=0)
    sc = Scene(cfg, table=block_table)
    cm = ChunkManager(sc, generate=True, budget_per_frame=0)
    cm.set_center_chunk([0, 0, 0])
    r = cfg.min_render_radius
    assert len(cm.chunks) == (2 * r + 1) ** 3
    assert cm.chunk_should_be_loaded([cfg.max_render_radius, 0, 0])
    assert not cm.chunk_should_be_loaded([cfg.max_render_radius + 1, 0, 0])


def test_manager_change_replay_updates_entity_table(flat_scene):
    gw = _make_world(flat_scene)
    gw.step(render=False)
    # PhysicsSetVelocity(0 vel) emitted by ego manager each frame; entity
    # table keeps physics data consistent
    assert gw.entities[0].physics_data is not None
    gw.remove_entity(0)
    gw.step(render=False)
    assert 0 not in gw.entities
