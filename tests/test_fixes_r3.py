"""Regression gates for the round-3 self-review fixes.

Covers: pending-edit replay at chunk generation (chunk_manager.rs:331-392
persistence semantics), swept-AABB substepping (no tunneling through
1-cell walls under large impulses), instance translation across a
streaming-window recenter, the pow2 light-BVH depth bucket that keys the
jit caches, and the host grid mirror staying in sync with the device
grid through every mutation path.
"""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.game import world as w
from vrv_tpu.game.chunk_manager import ChunkManager
from vrv_tpu.game.physics import VoxelCollider
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.geometry import unitcube


def _streaming_world(block_table, size=64):
    cfg = WorldConfig(size=(size, 32, size), origin=(-size // 2, 0, -size // 2))
    scene = Scene(cfg, table=block_table)
    gw = w.GameWorld(
        scene, extent=(32, 24), streaming=True,
        render_cfg=RenderConfig(width=8, height=6, samples_per_pixel=1, max_bounces=1),
    )
    gw.add_entity(0, w.EntityCreationData(
        physics=w.EntityPhysicsData(
            rigid_body_type=w.KINEMATIC_VELOCITY,
            hitbox=w.Hitbox(np.array([0.5, 0.5, 0.5])),
            linvel=np.zeros(3), angvel=np.zeros(3),
            controlled=True, grounded=False,
        ),
        mesh=unitcube(),
        isometry=w.Isometry(np.array([0.0, 2.0, 0.0])),
    ))
    return gw


def test_pending_edit_replayed_at_generation(block_table):
    """An edit into a chunk that has no generated record yet must survive
    that chunk's later worldgen (the edit would otherwise be reverted by
    pristine generation output)."""
    gw = _streaming_world(block_table)
    cm = gw.managers[0]
    assert isinstance(cm, ChunkManager) and cm.generate

    # find the NEAREST loaded-but-ungenerated chunk and edit into it
    # (generation is budgeted nearest-first: a far chunk may never get
    # its turn within the test's step budget); prefer one overlapping the
    # scene window so the windowed grid can be asserted too
    from vrv_tpu.game import chunk as chunklib

    def in_window(k):
        base = np.asarray(k, np.int64) * np.asarray(chunklib.CHUNK_SHAPE, np.int64)
        rel = base - gw.scene.origin.astype(np.int64)
        return (rel >= 0).all() and (rel < np.asarray(gw.scene.grid_host.shape)).all()

    pending = [k for k, r in cm.chunks.items() if r.data is None]
    windowed = [k for k in pending if in_window(k)]
    key = min(
        windowed or pending,
        key=lambda k: np.abs(np.asarray(k) - cm.center_chunk).sum(),
    )
    base = np.asarray(key, np.int64) * np.asarray(chunklib.CHUNK_SHAPE, np.int64)
    cell = base + 2
    lamp = block_table.block_idx("lamp")
    cm.set_block(cell, lamp)
    assert cm.chunks[key].data is None  # still pending
    assert key in cm._pending_edits

    # step until the chunk generates (budgeted nearest-first)
    for _ in range(80):
        gw.step(render=False)
        if cm.chunks.get(key) is not None and cm.chunks[key].data is not None:
            break
    rec = cm.chunks[key]
    assert rec is not None and rec.data is not None
    assert rec.data[2, 2, 2] == lamp              # record carries the edit
    if in_window(key):
        assert gw.scene.get_block(cell) == lamp   # and so does the window
    assert key not in cm._pending_edits           # consumed


def test_physics_no_tunneling_through_thin_wall(block_table):
    """Axis travel is substepped: a delta larger than the body cannot
    step across a 1-cell wall in one collision test."""
    cfg = WorldConfig(size=(32, 16, 32), origin=(-16, -8, -16), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[24, :, :] = block_table.block_idx("stone")   # wall at world x=8
    scene = Scene(cfg, table=block_table, grid=grid)
    col = VoxelCollider(scene)

    half = np.array([0.5, 0.5, 0.5])
    pos = np.array([0.0, 0.0, 0.0])
    # 20-unit impulse: destination [20,0,0] is far past the wall and
    # collision-free, so a destination-only test would tunnel
    new_pos, blocked = col.move(pos, half, np.array([20.0, 0.0, 0.0]))
    assert blocked[0]
    assert new_pos[0] < 8.0 - half[0] + 1e-6          # stopped at the wall
    assert new_pos[0] > 6.0                            # but did travel to it


def test_recenter_translates_instances(block_table):
    """set_grid with a shifted origin must translate the (grid-local)
    uploaded instance triangles and instance-light set by the origin
    delta, since no re-upload happens without an entity change."""
    cfg = WorldConfig(size=(32, 16, 32), origin=(-16, -8, -16), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[:, :4, :] = block_table.block_idx("stone")
    scene = Scene(cfg, table=block_table, grid=grid)

    from vrv_tpu.ops.instances import transform_mesh
    iso = w.Isometry(np.array([2.0, 1.0, 3.0]) - scene.origin.astype(np.float64))
    scene.set_instances([transform_mesh(unitcube(), iso)])
    tri0 = np.asarray(scene.instances_device["tri"]).copy()
    valid = np.asarray(scene.instances_device["valid"])

    new_origin = scene.origin + np.array([16, 0, 0], np.float32)
    scene.set_grid(np.array(scene.grid_host), new_origin)
    tri1 = np.asarray(scene.instances_device["tri"])
    np.testing.assert_allclose(
        tri1[valid], tri0[valid] + np.array([-16.0, 0.0, 0.0]), atol=0
    )


def test_bvh_depth_bucket_is_pow2_bound(block_table):
    """bvh_max_depth keys the jit caches: it must be a power of two and
    an upper bound on the true tree depth, so lamp-count jitter reuses
    compiled programs and the masked descent stays result-complete."""
    cfg = WorldConfig(size=(32, 16, 32), origin=(-16, -8, -16), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[:, :4, :] = block_table.block_idx("stone")
    lamp = block_table.block_idx("lamp")
    scene = Scene(cfg, table=block_table, grid=grid)
    depths = set()
    rng = np.random.default_rng(0)
    cells = rng.choice(30 * 30, size=9, replace=False)
    for i, c in enumerate(cells):
        scene.set_block([c // 30 - 15, 0, c % 30 - 15], lamp)
        true_d = scene.light_bvh.max_depth
        d = scene.bvh_max_depth
        assert d >= true_d and (d & (d - 1)) == 0
        depths.add(d)
    # 1..9 lamps span several true depths but few pow2 buckets
    assert len(depths) <= 3


def test_grid_host_mirror_tracks_device_grid(block_table):
    cfg = WorldConfig(size=(32, 16, 32), origin=(-16, -8, -16), seed=0)
    grid = np.full(cfg.size, block_table.air, dtype=np.uint8)
    grid[:, :4, :] = block_table.block_idx("stone")
    scene = Scene(cfg, table=block_table, grid=grid)
    assert (scene.grid_host == np.asarray(scene.grid)).all()
    scene.set_block([0, 0, 0], block_table.block_idx("lamp"))
    assert (scene.grid_host == np.asarray(scene.grid)).all()
    g2 = np.array(scene.grid_host)
    g2[:, 5, :] = block_table.block_idx("grass")
    scene.set_grid(g2, scene.origin + np.array([32, 0, 0], np.float32))
    assert (scene.grid_host == np.asarray(scene.grid)).all()
