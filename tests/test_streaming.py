"""Streaming (infinite) world: the window recenters on the ego and edits
persist in chunk records across recentering — the reference's chunk
load/unload behavior (chunk_manager.rs:97-163) over the dense-window scene.
"""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, SimConfig, WorldConfig
from vrv_tpu.game import world as w
from vrv_tpu.game.chunk_manager import ChunkManager
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.geometry import unitcube


def _streaming_world(block_table, size=64):
    # chunk-aligned origin; y window [0, 32) covers the ego/edit heights
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


def test_window_recenters_and_preserves_edits(block_table):
    gw = _streaming_world(block_table)
    scene = gw.scene
    cm = gw.managers[0]
    assert isinstance(cm, ChunkManager) and cm.generate
    org0 = scene.origin.copy()

    # make an edit near the start position
    lamp = block_table.block_idx("lamp")
    assert scene.set_block([1, 2, 1], lamp)
    cm.set_block([1, 2, 1], lamp)  # record-level edit (what WorldSetBlock does)
    assert scene.get_block([1, 2, 1]) == lamp

    # teleport the ego 2 chunks east and step: the window must recenter
    gw.entities[0].isometry.translation = np.array([70.0, 2.0, 0.0])
    gw.step(render=False)
    assert (scene.origin != org0).any()
    # the new window covers the ego
    size = np.asarray(scene.grid.shape)
    rel = np.array([70, 2, 0]) - scene.origin.astype(np.int64)
    assert ((rel >= 0) & (rel < size)).all()
    # newly generated terrain is present (worldgen ran for new chunks)
    vals = set(np.unique(np.asarray(scene.grid)).tolist())
    assert block_table.block_idx("stone") in vals or block_table.block_idx("grass") in vals

    # come back: the edit must still be there (persisted in chunk records)
    gw.entities[0].isometry.translation = np.array([0.0, 2.0, 0.0])
    for _ in range(6):  # budgeted generation may need a few steps
        gw.step(render=False)
    assert scene.get_block([1, 2, 1]) == lamp


def test_streaming_generation_matches_static_worldgen(block_table):
    """Window content equals a directly generated grid at the same origin."""
    from vrv_tpu.game.chunk import generate_dense_grid

    gw = _streaming_world(block_table)
    scene = gw.scene
    gw.entities[0].isometry.translation = np.array([70.0, 2.0, 0.0])
    for _ in range(40):  # enough budget to fill the window
        gw.step(render=False)
    want = generate_dense_grid(
        scene.world_cfg.replace(origin=tuple(int(x) for x in scene.origin)),
        block_table,
    )
    got = np.asarray(scene.grid)
    # every fully generated chunk matches worldgen exactly
    assert (got == want).mean() > 0.99
