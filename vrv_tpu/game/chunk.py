"""Chunk model, worldgen, and face-culled meshing.

Mirrors reference src/game_system/chunk.rs, re-expressed as batched array
programs instead of triple scalar loops:

  - coordinate helpers (chunk.rs:17-47)
  - worldgen: density = noise(w/20) - y/500, threshold 0.2,
    grass-if-exposed-else-stone (chunk.rs:55-99)
  - face-culled meshing with neighbor chunks (chunk.rs:147-281); in the
    TPU renderer the mesh step is replaced by direct DDA over the voxel
    grid, but the mesher is kept for parity tests (face counts / vertex
    tables) and for entity meshes.
  - hitbox extraction (chunk.rs:101-136) becomes "solid cell list";
    physics consumes the grid directly (game/physics.py).

All functions are deterministic in (seed, coords).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vrv_tpu.assets import BlockTable
from vrv_tpu.config import WorldConfig
from vrv_tpu.ops.noise import simplex3

CHUNK_X_SIZE = 32  # chunk.rs:13
CHUNK_Y_SIZE = 32  # chunk.rs:14
CHUNK_Z_SIZE = 32  # chunk.rs:15
CHUNK_SHAPE = (CHUNK_X_SIZE, CHUNK_Y_SIZE, CHUNK_Z_SIZE)


def chunk_idx(x: int, y: int, z: int) -> int:
    """Flat index within a chunk (chunk.rs:17-19)."""
    return CHUNK_Z_SIZE * CHUNK_Y_SIZE * x + CHUNK_Z_SIZE * y + z


def floor_coords(coords) -> np.ndarray:
    """Float world coords -> integer block coords (chunk.rs:25-31)."""
    return np.floor(np.asarray(coords)).astype(np.int64)


def global_to_chunk_coords(global_coords) -> Tuple[np.ndarray, np.ndarray]:
    """Block coords -> (chunk coords, in-chunk coords) (chunk.rs:33-47)."""
    g = np.asarray(global_coords, dtype=np.int64)
    size = np.array(CHUNK_SHAPE, dtype=np.int64)
    chunk_coords = np.floor_divide(g, size)
    block_coords = g - chunk_coords * size
    return chunk_coords, block_coords


def _density(wx, wy, wz, cfg: WorldConfig):
    """Worldgen density field (chunk.rs:78): noise(w/scale) - y/falloff."""
    s = cfg.noise_scale
    return simplex3(wx / s, wy / s, wz / s, seed=cfg.seed) - wy / cfg.y_falloff


@functools.partial(jax.jit, static_argnames=("cfg", "air", "grass", "stone", "shape"))
def _generate_blocks(
    offset: jax.Array, cfg: WorldConfig, air: int, grass: int, stone: int, shape: Tuple[int, int, int]
) -> jax.Array:
    """Batched worldgen over a block of cells starting at world `offset`.

    Reproduces the per-cell rule of chunk.rs:70-96: solid iff
    density > threshold; grass if the cell above is non-solid, else stone.
    """
    xs = jnp.arange(shape[0], dtype=jnp.float32) + offset[0]
    ys = jnp.arange(shape[1], dtype=jnp.float32) + offset[1]
    zs = jnp.arange(shape[2], dtype=jnp.float32) + offset[2]
    wx = xs[:, None, None]
    wy = ys[None, :, None]
    wz = zs[None, None, :]

    here = _density(wx, wy, wz, cfg)
    above = _density(wx, wy + 1.0, wz, cfg)

    t = cfg.threshold
    solid = here > t
    blocks = jnp.where(solid, jnp.where(above > t, stone, grass), air)
    return blocks.astype(jnp.uint8)


def generate_chunk(cfg: WorldConfig, table: BlockTable, chunk_position) -> np.ndarray:
    """Generate one 32^3 chunk (chunk.rs:55-99). Returns uint8 (32,32,32)."""
    cp = np.asarray(chunk_position, dtype=np.int64)
    offset = jnp.asarray(cp * np.array(CHUNK_SHAPE), jnp.float32)
    out = _generate_blocks(
        offset, cfg, table.air, table.block_idx("grass"), table.block_idx("stone"), CHUNK_SHAPE
    )
    return np.asarray(out)


def generate_dense_grid(cfg: WorldConfig, table: BlockTable) -> np.ndarray:
    """Generate the whole dense world grid in one fused program.

    The TPU-native equivalent of the reference's threadpool chunk fan-out
    (chunk_manager.rs:202-253): one jit call instead of 15 worker threads.
    """
    offset = jnp.asarray(np.array(cfg.origin), jnp.float32)
    out = _generate_blocks(
        offset, cfg, table.air, table.block_idx("grass"), table.block_idx("stone"), tuple(cfg.size)
    )
    return np.asarray(out)


# ---------------------------------------------------------------------------
# Face tables (chunk.rs:211-275). For each face: 2 triangles x 3 vertices,
# each vertex = (corner offset xyz, uv). Corner offsets are relative to the
# cell's min corner. Order matches the reference's push order exactly.
# ---------------------------------------------------------------------------

_V = {
    "000": (0.0, 0.0, 0.0), "100": (1.0, 0.0, 0.0), "001": (0.0, 0.0, 1.0),
    "101": (1.0, 0.0, 1.0), "010": (0.0, 1.0, 0.0), "110": (1.0, 1.0, 0.0),
    "011": (0.0, 1.0, 1.0), "111": (1.0, 1.0, 1.0),
}

# face -> [(corner, uv), ...] x 6 vertices (2 tris), reference chunk.rs:211-275
FACE_VERTEX_TABLE = {
    0: [("001", (0, 1)), ("010", (1, 0)), ("000", (1, 1)),
        ("011", (0, 0)), ("010", (1, 0)), ("001", (0, 1))],      # left
    1: [("110", (0, 0)), ("101", (1, 1)), ("100", (0, 1)),
        ("110", (0, 0)), ("111", (1, 0)), ("101", (1, 1))],      # right
    2: [("000", (0, 0)), ("100", (1, 0)), ("001", (0, 1)),
        ("100", (1, 0)), ("101", (1, 1)), ("001", (0, 1))],      # down
    3: [("011", (1, 1)), ("110", (0, 0)), ("010", (1, 0)),
        ("011", (1, 1)), ("111", (0, 1)), ("110", (0, 0))],      # up
    4: [("010", (0, 0)), ("100", (1, 1)), ("000", (0, 1)),
        ("010", (0, 0)), ("110", (1, 0)), ("100", (1, 1))],      # back
    5: [("001", (1, 1)), ("101", (0, 1)), ("011", (1, 0)),
        ("101", (0, 1)), ("111", (0, 0)), ("011", (1, 0))],      # front
}

# numpy form: (6 faces, 6 verts, 3) positions and (6, 6, 2) uv
FACE_POSITIONS = np.array(
    [[_V[c] for c, _ in FACE_VERTEX_TABLE[f]] for f in range(6)], dtype=np.float32
)
FACE_UVS = np.array(
    [[uv for _, uv in FACE_VERTEX_TABLE[f]] for f in range(6)], dtype=np.float32
)

# neighbor offset per face
FACE_NEIGHBOR = np.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]], dtype=np.int64
)


def gen_mesh(
    table: BlockTable,
    chunk_data: np.ndarray,
    neighbors: Optional[Dict[int, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Face-culled mesh of a block volume (chunk.rs:147-281), vectorized.

    chunk_data: uint8 (X,Y,Z). neighbors: optional {face: (X,Y,Z) uint8}
    adjacent volumes; missing neighbors are treated as air (the dense-grid
    renderer has a finite world; the reference only meshes when all
    neighbors exist, chunk_manager.rs:200).

    Returns SoA arrays: positions (n_verts, 3) float32, t (n_verts,) uint32
    material ids, uv (n_verts, 2) float32 — 6 verts per emitted face, in
    reference push order (x-major, y, z cell order; face order L,R,D,U,B,F).
    """
    data = np.asarray(chunk_data)
    air = np.uint8(table.air)
    translucent = table.translucent  # (n_blocks+1,)
    renders = np.arange(len(translucent)) != table.air

    shape = data.shape
    padded = np.full((shape[0] + 2, shape[1] + 2, shape[2] + 2), air, dtype=np.uint8)
    padded[1:-1, 1:-1, 1:-1] = data
    if neighbors:
        if 0 in neighbors:
            padded[0, 1:-1, 1:-1] = neighbors[0][-1, :, :]
        if 1 in neighbors:
            padded[-1, 1:-1, 1:-1] = neighbors[1][0, :, :]
        if 2 in neighbors:
            padded[1:-1, 0, 1:-1] = neighbors[2][:, -1, :]
        if 3 in neighbors:
            padded[1:-1, -1, 1:-1] = neighbors[3][:, 0, :]
        if 4 in neighbors:
            padded[1:-1, 1:-1, 0] = neighbors[4][:, :, -1]
        if 5 in neighbors:
            padded[1:-1, 1:-1, -1] = neighbors[5][:, :, 0]

    cell_renders = renders[data]
    positions, ts, uvs = [], [], []

    # iterate faces; for cell order parity with the reference we emit in
    # cell-major order below.
    emit = []  # (x, y, z, face)
    for face in range(6):
        off = FACE_NEIGHBOR[face]
        nb = padded[
            1 + off[0]: shape[0] + 1 + off[0],
            1 + off[1]: shape[1] + 1 + off[1],
            1 + off[2]: shape[2] + 1 + off[2],
        ]
        mask = cell_renders & translucent[nb]
        xs, ys, zs = np.nonzero(mask)
        emit.append(np.stack([xs, ys, zs, np.full_like(xs, face)], axis=1))
    if emit:
        all_faces = np.concatenate(emit, axis=0)
        # reference order: cells in x,y,z loop order, faces L..F within a cell
        order = np.lexsort(
            (all_faces[:, 3], all_faces[:, 2], all_faces[:, 1], all_faces[:, 0])
        )
        all_faces = all_faces[order]
    else:
        all_faces = np.zeros((0, 4), dtype=np.int64)

    n = len(all_faces)
    cell = all_faces[:, :3].astype(np.float32)
    face = all_faces[:, 3]
    pos = cell[:, None, :] + FACE_POSITIONS[face]            # (n, 6, 3)
    uv = FACE_UVS[face]                                      # (n, 6, 2)
    block = data[all_faces[:, 0], all_faces[:, 1], all_faces[:, 2]].astype(np.uint32)
    t = (block * 6 + face.astype(np.uint32))[:, None].repeat(6, axis=1)

    return {
        "positions": pos.reshape(n * 6, 3),
        "t": t.reshape(n * 6),
        "uv": uv.reshape(n * 6, 2),
    }


def gen_hitbox_cells(table: BlockTable, chunk_data: np.ndarray) -> np.ndarray:
    """Solid-cell coordinates, the voxel-physics analog of gen_hitbox
    (chunk.rs:101-136). Returns (n, 3) int64 cell coords."""
    solid = table.solid[np.asarray(chunk_data)]
    return np.stack(np.nonzero(solid), axis=1).astype(np.int64)
