"""Block table, atlas, worldgen, and mesher behavior tests.

Anchored on reference semantics:
  - alphabetical block ids (block.rs:84, SURVEY.md quirk: glass=0..air=7)
  - material offset t = block*6 + face (block.rs:116-119)
  - raw-byte emissive luminance means (utils.rs:223-235)
  - worldgen determinism + grass-over-stone rule (chunk.rs:69-96)
  - face-culled mesh counts (chunk.rs:147-281)
"""

import numpy as np
import pytest

from vrv_tpu import config
from vrv_tpu.assets import FACE_UP, load_block_table
from vrv_tpu.game import chunk as chunklib


def test_block_ordering_and_air(block_table):
    assert block_table.names == (
        "glass", "grass", "lamp", "mirror", "soil", "stone", "texturetest",
    )
    assert block_table.air == 7
    assert block_table.block_idx("mirror") == 3  # default selected block, quirk Q7
    assert not block_table.is_solid(block_table.air)
    assert block_table.is_translucent(block_table.air)
    assert block_table.is_translucent(block_table.block_idx("glass"))
    assert block_table.is_translucent(block_table.block_idx("texturetest"))
    assert not block_table.is_translucent(block_table.block_idx("stone"))
    assert block_table.is_luminescent(block_table.block_idx("lamp"))


def test_atlas_shapes_and_lamp_luminance(block_table):
    n = block_table.n_blocks * 6
    assert block_table.reflectivity.shape == (n, 16, 16, 4)
    assert block_table.emissivity.shape == (n, 16, 16, 3)
    assert block_table.metallicity.shape == (n, 16, 16, 1)
    # only lamp faces have emissive power
    lum = block_table.texture_luminances.reshape(block_table.n_blocks, 6)
    lamp = block_table.block_idx("lamp")
    assert (lum[lamp] > 0).all()
    mask = np.ones(block_table.n_blocks, dtype=bool)
    mask[lamp] = False
    assert (lum[mask] == 0).all()
    # mirror is full metallicity, white reflectivity (white.png faces)
    mirror = block_table.block_idx("mirror")
    assert block_table.metallicity[mirror * 6].max() > 0.99
    assert block_table.reflectivity[mirror * 6, ..., :3].min() > 0.99


def test_coordinate_helpers():
    cc, bc = chunklib.global_to_chunk_coords([-1, 0, 33])
    np.testing.assert_array_equal(cc, [-1, 0, 1])
    np.testing.assert_array_equal(bc, [31, 0, 1])
    np.testing.assert_array_equal(chunklib.floor_coords([-0.5, 1.9, -2.0]), [-1, 1, -2])
    assert chunklib.chunk_idx(1, 2, 3) == 32 * 32 * 1 + 32 * 2 + 3


def test_worldgen_deterministic_and_rule(block_table):
    cfg = config.WorldConfig(size=(32, 32, 32), origin=(-16, -16, -16), seed=0)
    g1 = chunklib.generate_dense_grid(cfg, block_table)
    g2 = chunklib.generate_dense_grid(cfg, block_table)
    np.testing.assert_array_equal(g1, g2)
    assert g1.dtype == np.uint8

    grass = block_table.block_idx("grass")
    stone = block_table.block_idx("stone")
    air = block_table.air
    vals = set(np.unique(g1).tolist())
    assert vals <= {grass, stone, air}
    assert air in vals and (grass in vals or stone in vals)

    # rule: a grass cell never has a solid cell directly above it (within volume)
    solid = (g1 == grass) | (g1 == stone)
    grass_mask = g1[:, :-1, :] == grass
    above_solid = solid[:, 1:, :]
    assert not (grass_mask & above_solid).any()

    # different seed -> different world
    g3 = chunklib.generate_dense_grid(cfg.replace(seed=1), block_table)
    assert (g1 != g3).any()


def test_generate_chunk_consistent_with_dense(block_table):
    cfg = config.WorldConfig(size=(64, 32, 32), origin=(0, 0, 0), seed=0)
    dense = chunklib.generate_dense_grid(cfg, block_table)
    c0 = chunklib.generate_chunk(cfg, block_table, (0, 0, 0))
    c1 = chunklib.generate_chunk(cfg, block_table, (1, 0, 0))
    np.testing.assert_array_equal(dense[:32], c0)
    np.testing.assert_array_equal(dense[32:], c1)


def test_mesh_single_block_counts(block_table):
    stone = block_table.block_idx("stone")
    data = np.full((3, 3, 3), block_table.air, dtype=np.uint8)
    data[1, 1, 1] = stone
    mesh = chunklib.gen_mesh(block_table, data)
    # isolated cube: 6 faces x 6 verts
    assert mesh["positions"].shape == (36, 3)
    # all material ids are stone's
    assert set(mesh["t"].tolist()) == {stone * 6 + f for f in range(6)}

    # two adjacent stones: shared faces culled -> 10 faces
    data[2, 1, 1] = stone
    mesh2 = chunklib.gen_mesh(block_table, data)
    assert mesh2["positions"].shape == (60, 3)


def test_mesh_glass_keeps_internal_faces(block_table):
    # glass is translucent: adjacent glass blocks still emit shared faces
    glass = block_table.block_idx("glass")
    data = np.full((3, 3, 3), block_table.air, dtype=np.uint8)
    data[1, 1, 1] = glass
    data[2, 1, 1] = glass
    mesh = chunklib.gen_mesh(block_table, data)
    assert mesh["positions"].shape == (72, 3)  # 12 faces, nothing culled


def test_mesh_neighbor_chunk_culling(block_table):
    stone = block_table.block_idx("stone")
    data = np.full((2, 2, 2), stone, dtype=np.uint8)
    # without neighbors: all boundary faces emitted = 24 faces
    m = chunklib.gen_mesh(block_table, data)
    assert m["positions"].shape[0] == 24 * 6
    # with a solid right neighbor, the +x boundary faces (4) are culled
    nb = np.full((2, 2, 2), stone, dtype=np.uint8)
    m2 = chunklib.gen_mesh(block_table, data, neighbors={1: nb})
    assert m2["positions"].shape[0] == 20 * 6


def test_mesh_uv_tables_match_reference():
    # left face tri0 first vertex is v001 with uv (0,1) (chunk.rs:214)
    np.testing.assert_array_equal(chunklib.FACE_POSITIONS[0, 0], [0, 0, 1])
    np.testing.assert_array_equal(chunklib.FACE_UVS[0, 0], [0, 1])
    # up face tri1 second vertex is v111 with uv (0,1) (chunk.rs:251)
    np.testing.assert_array_equal(chunklib.FACE_POSITIONS[3, 4], [1, 1, 1])
    np.testing.assert_array_equal(chunklib.FACE_UVS[3, 4], [0, 1])


def test_hitbox_cells(block_table):
    stone = block_table.block_idx("stone")
    data = np.full((2, 2, 2), block_table.air, dtype=np.uint8)
    data[0, 1, 0] = stone
    cells = chunklib.gen_hitbox_cells(block_table, data)
    np.testing.assert_array_equal(cells, [[0, 1, 0]])
