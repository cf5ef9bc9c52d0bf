"""Voxel ray tracing: Amanatides-Woo 3D-DDA over a dense grid.

This is the TPU-native replacement for the reference's Vulkan ray query
against a TLAS/BLAS of chunk meshes (reference
src/render_system/pathtrace_shader.rs:652-686 + scene.rs TLAS lifecycle):
TPUs have no RT hardware, and every triangle in the reference's world
geometry is an axis-aligned voxel face (chunk.rs:147-281), so marching the
grid directly yields the *same hit set* as the hardware traversal:

  - a face exists between cells P -> Q iff the owning cell renders
    (is not air) and the neighbouring cell is translucent
    (block.rs:121-127, chunk.rs:212-275);
  - ray queries use no cull flags (pathtrace_shader.rs:659), so faces are
    hit from both sides: we report "entering" hits (face of Q, normal
    against the ray) and "exiting" hits (face of P, normal along the ray,
    which is how the reference sees terrain from inside);
  - hits with t outside [t_min, t_max] = [EPSILON_BLOCK, 1000] are ignored
    (pathtrace_shader.rs:653-654).

Everything here is shape-static, mask-vectorized jnp over a flat ray
batch — it jits for TPU (and is the oracle-tested reference for the
Pallas kernels in ops/pallas/).

Face indexing matches block.rs BlockFace: 0=left(-x) 1=right(+x)
2=down(-y) 3=up(+y) 4=back(-z) 5=front(+z).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(3.0e38)

# ---------------------------------------------------------------------------
# Per-(face, triangle) shading frames.
#
# The reference derives the tangent frame from the hit triangle's edges
# (pathtrace_shader.rs:345-357): normal = cross(e01, e02), tangent = e01,
# bitangent = cross(normal, tangent). Voxel faces are axis-aligned quads of
# two fixed triangles (chunk.rs:211-275), so the frames are *constants* per
# (face, triangle). Values below were derived symbolically from the mesh
# winding tables; test_dda.py re-derives them numerically from
# game.chunk.FACE_POSITIONS as an oracle.
#
# Triangle selection: each quad splits along the a+b=1 diagonal of its
# in-plane fractional coords (a, b) = the two world axes spanning the face
# in axis order; tri1 iff a + b > 1.
# ---------------------------------------------------------------------------

_S2 = 1.0 / np.sqrt(2.0, dtype=np.float64)

FACE_NORMALS = np.array(
    [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]], np.float32
)

# (6 faces, 2 tris, 3) tangent / bitangent
FACE_TANGENTS = np.array(
    [
        [[0, _S2, -_S2], [0, 0, -1]],          # left
        [[0, -_S2, _S2], [0, 0, 1]],           # right
        [[1, 0, 0], [0, 0, 1]],                # down
        [[_S2, 0, -_S2], [1, 0, 0]],           # up
        [[_S2, -_S2, 0], [1, 0, 0]],           # back
        [[1, 0, 0], [0, 1, 0]],                # front
    ],
    np.float32,
)
FACE_BITANGENTS = np.array(
    [
        [[0, -_S2, -_S2], [0, -1, 0]],         # left
        [[0, -_S2, -_S2], [0, -1, 0]],         # right
        [[0, 0, 1], [-1, 0, 0]],               # down
        [[-_S2, 0, -_S2], [0, 0, -1]],         # up
        [[-_S2, -_S2, 0], [0, -1, 0]],         # back
        [[0, 1, 0], [-1, 0, 0]],               # front
    ],
    np.float32,
)

# uv = const + coeff . frac  (derived from chunk.rs uv tables; see SURVEY)
# rows: face; cols: [const_u, du/dx, du/dy, du/dz]
FACE_U_AFFINE = np.array(
    [
        [1, 0, 0, -1],   # left:  u = 1 - fz
        [0, 0, 0, 1],    # right: u = fz
        [0, 1, 0, 0],    # down:  u = fx
        [1, -1, 0, 0],   # up:    u = 1 - fx
        [0, 1, 0, 0],    # back:  u = fx
        [1, -1, 0, 0],   # front: u = 1 - fx
    ],
    np.float32,
)
FACE_V_AFFINE = np.array(
    [
        [1, 0, -1, 0],   # left:  v = 1 - fy
        [1, 0, -1, 0],   # right: v = 1 - fy
        [0, 0, 0, 1],    # down:  v = fz
        [0, 0, 0, 1],    # up:    v = fz
        [1, 0, -1, 0],   # back:  v = 1 - fy
        [1, 0, -1, 0],   # front: v = 1 - fy
    ],
    np.float32,
)

# in-plane axis selectors per face for the triangle diagonal test:
# (a_axis, b_axis) in world-axis order
FACE_PLANE_AXES = np.array(
    [[1, 2], [1, 2], [0, 2], [0, 2], [0, 1], [0, 1]], np.int32
)


class TraceResult(NamedTuple):
    """Per-ray hit record (grid-local coordinates)."""

    hit: jax.Array        # bool
    t: jax.Array          # float32, distance along (unit) direction
    block: jax.Array      # uint8 id of the block owning the hit face
    face: jax.Array       # int32 in [0, 6)
    cell: jax.Array       # int32 (..., 3) cell coords of the owning block
    entering: jax.Array   # bool: True if the face normal opposes the ray


def _lookup_u8(lut: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take(lut, idx.astype(jnp.int32), axis=0)


def trace(
    grid: jax.Array,
    translucent: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_min: float = 0.001,
    t_max: float = 1000.0,
) -> TraceResult:
    """March rays through `grid`.

    Args:
      grid: (X, Y, Z) uint8 block ids; the id `air` must satisfy
        translucent[air] = True and is identified as len(translucent)-1.
      translucent: (n_blocks+1,) bool lookup (air last).
      origin, direction: (..., 3) float32 in grid-local coords (cell size 1).
        direction need not be normalized, but t is measured in its units —
        callers pass normalized dirs, matching the reference.
    """
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    n = o.shape[0]
    size = jnp.asarray(grid.shape, jnp.float32)
    size_i = jnp.asarray(grid.shape, jnp.int32)
    air = jnp.uint8(translucent.shape[0] - 1)
    strides = jnp.asarray(
        [grid.shape[1] * grid.shape[2], grid.shape[2], 1], jnp.int32
    )
    flat_grid = grid.reshape(-1)

    def cell_block(cell, inside):
        c = jnp.clip(cell, 0, size_i - 1)
        flat = (c * strides).sum(-1)
        b = jnp.take(flat_grid, flat, axis=0)
        return jnp.where(inside, b, air)

    d_safe = jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d)
    inv_d = 1.0 / d_safe

    # slab clip against [0, size]^3
    t_lo = (0.0 - o) * inv_d
    t_hi = (size - o) * inv_d
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)
    t_enter = t_near.max(-1)
    t_exit = t_far.min(-1)
    enter_axis = jnp.argmax(t_near, axis=-1)

    t0 = jnp.maximum(t_enter, jnp.float32(t_min))
    valid = (t0 <= t_exit) & (t0 <= t_max)

    p0 = o + t0[:, None] * d
    cell = jnp.clip(jnp.floor(p0).astype(jnp.int32), 0, size_i - 1)
    cur_block = cell_block(cell, valid)

    # a ray entering the grid from outside crosses into its entry cell at
    # t_enter: that's a face hit if the entry cell renders (outside = air,
    # which is translucent)
    starts_outside = t_enter > t_min
    entry_renders = cur_block != air
    entry_face = enter_axis * 2 + jnp.where(
        jnp.take_along_axis(d, enter_axis[:, None], axis=-1)[:, 0] > 0, 0, 1
    )
    hit0 = valid & starts_outside & entry_renders & (t_enter >= t_min) & (t_enter <= t_max)

    state = dict(
        alive=valid & ~hit0,
        cell=cell,
        cur_block=cur_block,
        hit=hit0,
        t=jnp.where(hit0, t_enter, jnp.float32(0.0)),
        block=jnp.where(hit0, cur_block, air),
        face=jnp.where(hit0, entry_face.astype(jnp.int32), 0),
        hit_cell=jnp.where(hit0[:, None], cell, 0),
        entering=hit0,
        steps=jnp.int32(0),
    )

    max_steps = int(grid.shape[0] + grid.shape[1] + grid.shape[2] + 3)
    translucent_b = translucent.astype(jnp.bool_)

    def cond(s):
        return (s["steps"] < max_steps) & s["alive"].any()

    def body(s):
        cell = s["cell"]
        cur = s["cur_block"]
        # t at the next boundary along each axis
        next_b = cell.astype(jnp.float32) + (d > 0).astype(jnp.float32)
        t_axes = (next_b - o) * inv_d
        t_axes = jnp.where(jnp.abs(d) < 1e-12, _BIG, t_axes)
        axis = jnp.argmin(t_axes, axis=-1)
        t_next = jnp.take_along_axis(t_axes, axis[:, None], axis=-1)[:, 0]
        step_sign = jnp.sign(
            jnp.take_along_axis(d, axis[:, None], axis=-1)[:, 0]
        ).astype(jnp.int32)
        step = jnp.zeros_like(cell).at[jnp.arange(n), axis].set(step_sign)
        new_cell = cell + step
        inside = ((new_cell >= 0) & (new_cell < size_i)).all(-1)
        new_block = cell_block(new_cell, inside)

        cur_tl = _lookup_u8(translucent_b, cur)
        new_tl = _lookup_u8(translucent_b, new_block)
        entering_hit = (new_block != air) & cur_tl   # face of Q, toward us
        exiting_hit = (cur != air) & new_tl          # face of P, from behind
        in_range = (t_next >= t_min) & (t_next <= t_max)
        any_hit = s["alive"] & in_range & (entering_hit | exiting_hit)

        face_pos = axis * 2 + jnp.where(step_sign > 0, 0, 1)  # face of Q toward P
        face_neg = axis * 2 + jnp.where(step_sign > 0, 1, 0)  # face of P toward Q
        face = jnp.where(entering_hit, face_pos, face_neg).astype(jnp.int32)
        hblock = jnp.where(entering_hit, new_block, cur)
        hcell = jnp.where(entering_hit[:, None], new_cell, cell)

        rec = any_hit & ~s["hit"]
        alive = s["alive"] & ~any_hit & inside & (t_next <= t_max)
        return dict(
            alive=alive,
            cell=new_cell,
            cur_block=new_block,
            hit=s["hit"] | any_hit,
            t=jnp.where(rec, t_next, s["t"]),
            block=jnp.where(rec, hblock, s["block"]),
            face=jnp.where(rec, face, s["face"]),
            hit_cell=jnp.where(rec[:, None], hcell, s["hit_cell"]),
            entering=jnp.where(rec, entering_hit, s["entering"]),
            steps=s["steps"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)

    def r(x, extra=()):
        return x.reshape(shape + extra)

    return TraceResult(
        hit=r(s["hit"]),
        t=r(s["t"]),
        block=r(s["block"]),
        face=r(s["face"]),
        cell=r(s["hit_cell"], (3,)),
        entering=r(s["entering"]),
    )


def build_distance_field(grid: jax.Array, air_id: int, cap: int = 15) -> jax.Array:
    """Chebyshev distance-to-nearest-renderable-cell, capped (uint8).

    The empty-space-skipping structure: if dist[c] = v >= 1, every cell
    within chebyshev radius v-1 of c is air, so a ray at c can advance to
    the boundary of that box without face tests ("proximity clouds").
    Rebuilt functionally (a few min-pool sweeps) — the TPU analog of the
    reference's acceleration-structure rebuild, ~1 ms instead of a
    BLAS/TLAS pipeline.
    """
    renders = grid != jnp.uint8(air_id)
    dist = jnp.where(renders, 0, cap).astype(jnp.uint8)
    for _ in range(cap):
        neighbour_min = -jax.lax.reduce_window(
            -dist.astype(jnp.int32),
            -cap,
            jax.lax.max,
            window_dimensions=(3, 3, 3),
            window_strides=(1, 1, 1),
            padding="SAME",
        )
        dist = jnp.minimum(dist, (neighbour_min + 1).astype(jnp.uint8))
    return dist


def _cheb_cone(box: int) -> np.ndarray:
    """(box, box, box) int32 chebyshev distance from the box centre."""
    r = box // 2
    ax = np.abs(np.arange(box) - r)
    return np.maximum.reduce(np.meshgrid(ax, ax, ax, indexing="ij")).astype(np.int32)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("cap",))
def _dist_add_solid(dist, start, offset, cap: int):
    """dist after a cell becomes renderable: min with the chebyshev cone.

    start: box corner in grid coords; offset: edited cell's position inside
    the box (both pre-clamped by the caller). Exact: a new solid at c can
    only lower distances, to exactly min(old, cheb(p, c))."""
    box = 2 * cap + 1
    # chebyshev distance from the edited cell's in-box position, computed
    # directly (the cone shifted to an off-centre apex when clamped)
    ii = jnp.abs(jnp.arange(box, dtype=jnp.int32) - offset[0])
    jj = jnp.abs(jnp.arange(box, dtype=jnp.int32) - offset[1])
    kk = jnp.abs(jnp.arange(box, dtype=jnp.int32) - offset[2])
    shifted = jnp.maximum(
        jnp.maximum(ii[:, None, None], jj[None, :, None]), kk[None, None, :]
    )
    patch = jax.lax.dynamic_slice(dist, start, (box, box, box)).astype(jnp.int32)
    patch = jnp.minimum(patch, shifted).astype(dist.dtype)
    return jax.lax.dynamic_update_slice(dist, patch, start)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("air_id", "cap"))
def _dist_recompute_box(dist, grid, start, inner_start, air_id: int, cap: int):
    """Recompute the distance field in a (4cap+1)^3 box around an edit.

    Needed when a cell stops rendering (distances can only grow, and only
    within chebyshev radius cap of the edit; those values depend on solids
    within 2cap of it, all inside the box — the big box always covers the
    inner (2cap+1)^3 write-back region padded by cap or clipped at the
    grid boundary, so every inner cell's full influencer neighbourhood is
    available and the local result is exact)."""
    big_box = 4 * cap + 1
    inner_box = 2 * cap + 1
    gbox = jax.lax.dynamic_slice(grid, start, (big_box,) * 3)
    renders = gbox != jnp.uint8(air_id)
    d = jnp.where(renders, 0, cap).astype(jnp.int32)
    for _ in range(cap):
        neighbour_min = -jax.lax.reduce_window(
            -d, -cap, jax.lax.max,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1), padding="SAME",
        )
        d = jnp.minimum(d, neighbour_min + 1)
    rel = inner_start - start
    inner = jax.lax.dynamic_slice(d, (rel[0], rel[1], rel[2]), (inner_box,) * 3)
    return jax.lax.dynamic_update_slice(
        dist, inner.astype(dist.dtype), inner_start
    )


def update_distance_field(
    dist: jax.Array,
    grid: jax.Array,
    cell,
    became_solid: bool,
    air_id: int,
    cap: int = 15,
) -> jax.Array:
    """Incremental build_distance_field after a single-cell renderability
    change at `cell` (grid must already hold the new value). Exact: equal
    to a full rebuild (tests/test_dda.py::test_incremental_distance_field).

    An edit at c only affects dist within chebyshev radius cap-1 of c
    (values are capped at cap, so farther cells never depended on c).
    """
    X, Y, Z = dist.shape
    size = np.asarray([X, Y, Z])
    c = np.asarray(cell, np.int64)
    box = 2 * cap + 1
    big_box = 4 * cap + 1
    if min(X, Y, Z) < big_box:
        # tiny grids: full rebuild is already cheap
        return build_distance_field(grid, air_id, cap)
    if became_solid:
        start = np.clip(c - cap, 0, size - box)
        offset = c - start
        return _dist_add_solid(
            dist, jnp.asarray(start, jnp.int32), jnp.asarray(offset, jnp.int32), cap
        )
    start = np.clip(c - 2 * cap, 0, size - big_box)
    inner_start = np.clip(c - cap, 0, size - box)
    return _dist_recompute_box(
        dist, grid, jnp.asarray(start, jnp.int32),
        jnp.asarray(inner_start, jnp.int32), int(air_id), cap
    )


import os as _os

TRACE_COMPACT_K = int(_os.environ.get("VRV_TRACE_K", 12))       # full-batch iters
TRACE_COMPACT_CAP = int(_os.environ.get("VRV_TRACE_CAP", 1 << 16))  # tail width


def trace_skip(
    grid: jax.Array,
    dist: jax.Array,
    translucent: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_min: float = 0.001,
    t_max: float = 1000.0,
) -> TraceResult:
    """`trace` with distance-field empty-space skipping. Same results.

    The production tracer, shaped by the TPU cost model (docs/PERF.md):
    one fused int32 gather per DDA step, dense component math for every
    axis selection, exact radius-(dist-1) skip jumps across known-air
    boxes — and TAIL COMPACTION: after TRACE_COMPACT_K full-batch
    iterations (which resolve the vast majority of rays), the few
    still-marching rays are sorted to a bounded prefix and finish in a
    narrow loop, so the lockstep batch no longer pays ~max-steps x
    batch-width for a handful of long horizon/tunnel rays.
    """
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    n = o.shape[0]

    h = _trace_setup(grid, dist, translucent, o, d, t_min, t_max)
    state = _trace_init(h)
    body = _trace_body(h)
    max_steps = h["max_steps"]

    def cond_all(s):
        return (s["steps"] < max_steps) & s["alive"].any()

    if n <= TRACE_COMPACT_CAP:
        s = jax.lax.while_loop(cond_all, body, state)
        return _trace_result(s, shape)

    # ---- phase 1: full batch until the alive set fits the tail cap ----
    # the cap scales with the batch (n/8, 64K-aligned): with a fixed cap a
    # multi-million-ray batch would grind full-width until its alive count
    # drained to the cap, wiping out the compaction win
    cap = min(n, max(TRACE_COMPACT_CAP, ((n // 8 + 0xFFFF) >> 16) << 16))

    # keep full width while the alive set is too big to compact; below a
    # batch fraction, compact immediately (late bounces start mostly dead,
    # so their phase 1 is ~zero iterations)
    thresh = max(cap, n // 6)

    def cond_p1(s):
        alive_n = s["alive"].sum()
        more = (alive_n > cap) | ((s["steps"] < TRACE_COMPACT_K) & (alive_n > thresh))
        return (s["steps"] < max_steps) & (alive_n > 0) & more

    s1 = jax.lax.while_loop(cond_p1, body, state)

    # ---- compact: stable-argsort alive rays to the front, then gather
    # only the cap-sized prefix (sorting a 2-tuple + narrow gathers is far
    # cheaper than carrying every ray field through the sort) ----
    i32 = jnp.int32
    key = (~s1["alive"]).astype(i32)
    ids = jnp.arange(n, dtype=i32)
    _, perm = jax.lax.sort((key, ids), num_keys=1, is_stable=True)
    s_ids = perm[:cap]
    sox = jnp.take(o[:, 0], s_ids)
    soy = jnp.take(o[:, 1], s_ids)
    soz = jnp.take(o[:, 2], s_ids)
    sdx = jnp.take(d[:, 0], s_ids)
    sdy = jnp.take(d[:, 1], s_ids)
    sdz = jnp.take(d[:, 2], s_ids)
    cellpack = (s1["cx"] << 20) | (s1["cy"] << 10) | s1["cz"]
    s_cellpack = jnp.take(cellpack, s_ids)
    s_comb = jnp.take(s1["comb"], s_ids)
    was_alive = jnp.take(s1["alive"], s_ids, axis=0)

    # ---- phase 2: narrow loop over the compacted tail ----
    o2 = jnp.stack([sox, soy, soz], axis=-1)
    d2 = jnp.stack([sdx, sdy, sdz], axis=-1)
    h2 = _trace_setup(grid, dist, translucent, o2, d2, t_min, t_max)
    air8 = jnp.uint8(translucent.shape[0] - 1)
    state2 = dict(
        alive=was_alive,
        cx=(s_cellpack >> 20) & 1023,
        cy=(s_cellpack >> 10) & 1023,
        cz=s_cellpack & 1023,
        comb=s_comb,
        hit=jnp.zeros(cap, bool),
        t=jnp.zeros(cap, jnp.float32),
        block=jnp.full(cap, air8),
        face=jnp.zeros(cap, i32),
        hx=jnp.zeros(cap, i32),
        hy=jnp.zeros(cap, i32),
        hz=jnp.zeros(cap, i32),
        entering=jnp.zeros(cap, bool),
        steps=s1["steps"],
    )
    body2 = _trace_body(h2)
    s2 = jax.lax.while_loop(cond_all, body2, state2)

    # ---- scatter tail results back (only rays that entered phase 2) ----
    dest = jnp.where(was_alive, s_ids, i32(n))
    out = dict(s1)
    for f in ("hit", "t", "block", "face", "hx", "hy", "hz", "entering"):
        out[f] = out[f].at[dest].set(s2[f], mode="drop")
    return _trace_result(out, shape)


def _trace_result(s, shape) -> TraceResult:
    cell = jnp.stack([s["hx"], s["hy"], s["hz"]], axis=-1).reshape(shape + (3,))
    return TraceResult(
        hit=s["hit"].reshape(shape),
        t=s["t"].reshape(shape),
        block=s["block"].reshape(shape),
        face=s["face"].reshape(shape),
        cell=cell,
        entering=s["entering"].reshape(shape),
    )


def _trace_setup(grid, dist, translucent, o, d, t_min, t_max) -> dict:
    """Precompute everything the DDA stepper closes over (flat (n,3) rays)."""
    f32 = jnp.float32
    X, Y, Z = grid.shape
    air = int(translucent.shape[0] - 1)

    # fused per-cell word: block<<16 | translucent<<9 | renders<<8 | dist
    tl_i = translucent.astype(jnp.int32)
    flat_comb = (
        (grid.reshape(-1).astype(jnp.int32) << 16)
        | (jnp.take(tl_i, grid.reshape(-1).astype(jnp.int32)) << 9)
        | ((grid.reshape(-1) != jnp.uint8(air)).astype(jnp.int32) << 8)
        | dist.reshape(-1).astype(jnp.int32)
    )
    outside_comb = jnp.int32((air << 16) | (1 << 9) | 255)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    tiny = 1e-12
    bigx = jnp.abs(dx) < tiny
    bigy = jnp.abs(dy) < tiny
    bigz = jnp.abs(dz) < tiny
    ix = 1.0 / jnp.where(bigx, f32(tiny), dx)
    iy = 1.0 / jnp.where(bigy, f32(tiny), dy)
    iz = 1.0 / jnp.where(bigz, f32(tiny), dz)

    def lookup(cx, cy, cz, inside):
        fx = jnp.clip(cx, 0, X - 1)
        fy = jnp.clip(cy, 0, Y - 1)
        fz = jnp.clip(cz, 0, Z - 1)
        flat = (fx * Y + fy) * Z + fz
        got = jnp.take(flat_comb, flat, axis=0)
        return jnp.where(inside, got, outside_comb)

    return dict(
        X=X, Y=Y, Z=Z, air=air, t_min=t_min, t_max=t_max,
        lookup=lookup,
        o=(ox, oy, oz), d=(dx, dy, dz), inv=(ix, iy, iz),
        big=(bigx, bigy, bigz),
        max_steps=int(X + Y + Z + 3),
    )


def _trace_init(h) -> dict:
    """Initial state: slab clip + boundary-entry hit (flat batch)."""
    f32 = jnp.float32
    i32 = jnp.int32
    ox, oy, oz = h["o"]
    dx, dy, dz = h["d"]
    ix, iy, iz = h["inv"]
    bigx, bigy, bigz = h["big"]
    X, Y, Z = h["X"], h["Y"], h["Z"]
    t_min, t_max = h["t_min"], h["t_max"]
    air8 = jnp.uint8(h["air"])

    def slab(o1, inv, big, size):
        lo = (0.0 - o1) * inv
        hi = (size - o1) * inv
        tn = jnp.minimum(lo, hi)
        tf = jnp.maximum(lo, hi)
        inside1 = (o1 >= 0.0) & (o1 <= size)
        tn = jnp.where(big, jnp.where(inside1, -_BIG, _BIG), tn)
        tf = jnp.where(big, jnp.where(inside1, _BIG, -_BIG), tf)
        return tn, tf

    tnx, tfx = slab(ox, ix, bigx, f32(X))
    tny, tfy = slab(oy, iy, bigy, f32(Y))
    tnz, tfz = slab(oz, iz, bigz, f32(Z))
    t_enter = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    t_exit = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    enter_is_x = t_enter == tnx
    enter_is_y = (~enter_is_x) & (t_enter == tny)
    enter_axis = jnp.where(enter_is_x, 0, jnp.where(enter_is_y, 1, 2))
    d_enter = jnp.where(enter_is_x, dx, jnp.where(enter_is_y, dy, dz))

    t0 = jnp.maximum(t_enter, f32(t_min))
    # zero-direction rays (terminated paths feed d = 0 into later bounces)
    # must be invalid outright: inside the grid they would otherwise sit in
    # the skip branch making no progress for max_steps iterations — this
    # single mask was worth ~60x on 4-bounce frames (docs/PERF.md)
    degenerate = bigx & bigy & bigz
    valid = (t0 <= t_exit) & (t0 <= t_max) & ~degenerate

    cx = jnp.clip(jnp.floor(ox + t0 * dx).astype(i32), 0, X - 1)
    cy = jnp.clip(jnp.floor(oy + t0 * dy).astype(i32), 0, Y - 1)
    cz = jnp.clip(jnp.floor(oz + t0 * dz).astype(i32), 0, Z - 1)
    cur_comb = h["lookup"](cx, cy, cz, valid)
    cur_renders = (cur_comb >> 8) & 1

    starts_outside = t_enter > t_min
    entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
    hit0 = (
        valid & starts_outside & (cur_renders == 1)
        & (t_enter >= t_min) & (t_enter <= t_max)
    )

    return dict(
        alive=valid & ~hit0,
        cx=cx, cy=cy, cz=cz,
        comb=cur_comb,
        hit=hit0,
        t=jnp.where(hit0, t_enter, f32(0.0)),
        block=jnp.where(hit0, (cur_comb >> 16).astype(jnp.uint8), air8),
        face=jnp.where(hit0, entry_face.astype(i32), 0),
        hx=jnp.where(hit0, cx, 0),
        hy=jnp.where(hit0, cy, 0),
        hz=jnp.where(hit0, cz, 0),
        entering=hit0,
        steps=jnp.int32(0),
    )


def _trace_body(h):
    """One DDA step (skip-jump or exact crossing) as a while_loop body."""
    f32 = jnp.float32
    i32 = jnp.int32
    ox, oy, oz = h["o"]
    dx, dy, dz = h["d"]
    ix, iy, iz = h["inv"]
    bigx, bigy, bigz = h["big"]
    X, Y, Z = h["X"], h["Y"], h["Z"]
    t_min, t_max = h["t_min"], h["t_max"]
    lookup = h["lookup"]

    def body(s):
        scx, scy, scz = s["cx"], s["cy"], s["cz"]
        comb = s["comb"]
        cur_tl = (comb >> 9) & 1
        cur_rd = (comb >> 8) & 1
        v = comb & 255
        can_skip = s["alive"] & (v >= 3)
        r = (v - 1).astype(f32)
        ri_ = v - 1  # int radius

        # --- skip branch: exact jump to the LAST known-air cell of the
        # radius-(v-1) safety box (see docs/PERF.md) ---
        fx, fy, fz = scx.astype(f32), scy.astype(f32), scz.astype(f32)
        tbx = jnp.where(bigx, _BIG, jnp.where(dx > 0, (fx + 1.0 + r - ox) * ix, (fx - r - ox) * ix))
        tby = jnp.where(bigy, _BIG, jnp.where(dy > 0, (fy + 1.0 + r - oy) * iy, (fy - r - oy) * iy))
        tbz = jnp.where(bigz, _BIG, jnp.where(dz > 0, (fz + 1.0 + r - oz) * iz, (fz - r - oz) * iz))
        t_skip = jnp.minimum(jnp.minimum(tbx, tby), tbz)
        ex_x = t_skip == tbx
        ex_y = (~ex_x) & (t_skip == tby)
        ex_z = ~(ex_x | ex_y)

        def skip_axis(is_exit, c, o1, d1, sgn_pos):
            exact = c + jnp.where(sgn_pos, ri_, -ri_)
            flo = jnp.clip(
                jnp.floor(o1 + t_skip * d1).astype(i32), c - ri_, c + ri_
            )
            return jnp.where(is_exit, exact, flo)

        kx = skip_axis(ex_x, scx, ox, dx, dx > 0)
        ky = skip_axis(ex_y, scy, oy, dy, dy > 0)
        kz = skip_axis(ex_z, scz, oz, dz, dz > 0)
        skip_inside = (
            (kx >= 0) & (kx < X) & (ky >= 0) & (ky < Y) & (kz >= 0) & (kz < Z)
        )
        skip_out = ~skip_inside | (t_skip > t_max)

        # --- exact branch: one-cell DDA step with face logic ---
        tax = jnp.where(bigx, _BIG, (fx + (dx > 0) - ox) * ix)
        tay = jnp.where(bigy, _BIG, (fy + (dy > 0) - oy) * iy)
        taz = jnp.where(bigz, _BIG, (fz + (dz > 0) - oz) * iz)
        t_next = jnp.minimum(jnp.minimum(tax, tay), taz)
        ax_x = t_next == tax
        ax_y = (~ax_x) & (t_next == tay)
        axis = jnp.where(ax_x, 0, jnp.where(ax_y, 1, 2))
        d_axis = jnp.where(ax_x, dx, jnp.where(ax_y, dy, dz))
        sgn = jnp.where(d_axis > 0, 1, -1).astype(i32)
        ex = scx + jnp.where(ax_x, sgn, 0)
        ey = scy + jnp.where(ax_y, sgn, 0)
        ez = scz + jnp.where(ax_x | ax_y, 0, sgn)
        inside_exact = (
            (ex >= 0) & (ex < X) & (ey >= 0) & (ey < Y) & (ez >= 0) & (ez < Z)
        )

        nx = jnp.where(can_skip, kx, ex)
        ny = jnp.where(can_skip, ky, ey)
        nz = jnp.where(can_skip, kz, ez)
        inside = jnp.where(can_skip, skip_inside, inside_exact)
        new_comb = lookup(nx, ny, nz, inside)
        new_tl = (new_comb >> 9) & 1
        new_rd = (new_comb >> 8) & 1

        entering_hit = (new_rd == 1) & (cur_tl == 1) & ~can_skip
        exiting_hit = (cur_rd == 1) & (new_tl == 1) & ~can_skip
        in_range = (t_next >= t_min) & (t_next <= t_max)
        any_hit = s["alive"] & in_range & (entering_hit | exiting_hit)

        face_pos = axis * 2 + jnp.where(sgn > 0, 0, 1)
        face_neg = axis * 2 + jnp.where(sgn > 0, 1, 0)
        face = jnp.where(entering_hit, face_pos, face_neg).astype(i32)
        hblock = jnp.where(
            entering_hit, (new_comb >> 16), (comb >> 16)
        ).astype(jnp.uint8)

        rec = any_hit & ~s["hit"]
        dead_exact = ~inside_exact | (t_next > t_max)
        dead = jnp.where(can_skip, skip_out, dead_exact)
        alive = s["alive"] & ~any_hit & ~dead
        return dict(
            alive=alive,
            cx=nx, cy=ny, cz=nz,
            comb=new_comb,
            hit=s["hit"] | any_hit,
            t=jnp.where(rec, t_next, s["t"]),
            block=jnp.where(rec, hblock, s["block"]),
            face=jnp.where(rec, face, s["face"]),
            hx=jnp.where(rec, jnp.where(entering_hit, nx, scx), s["hx"]),
            hy=jnp.where(rec, jnp.where(entering_hit, ny, scy), s["hy"]),
            hz=jnp.where(rec, jnp.where(entering_hit, nz, scz), s["hz"]),
            entering=jnp.where(rec, entering_hit, s["entering"]),
            steps=s["steps"] + 1,
        )

    return body


def trace_brute_force(
    grid: np.ndarray,
    translucent: np.ndarray,
    origin: np.ndarray,
    direction: np.ndarray,
    t_min: float = 0.001,
    t_max: float = 1000.0,
    step: float = 1e-3,
):
    """Tiny-step marching oracle for tests (NumPy, single ray). Slow."""
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    size = np.array(grid.shape)
    air = len(translucent) - 1

    def block_at(c):
        if (c < 0).any() or (c >= size).any():
            return air
        return int(grid[tuple(c)])

    t = t_min
    prev_cell = np.floor(o + t * d).astype(np.int64)
    while t <= t_max:
        t += step
        cell = np.floor(o + t * d).astype(np.int64)
        if (cell == prev_cell).all():
            continue
        if np.abs(cell - prev_cell).sum() > 1:
            return None  # crossed two boundaries within one step: ambiguous
        p, q = block_at(prev_cell), block_at(cell)
        if q != air and translucent[p]:
            axis = int(np.argmax(np.abs(cell - prev_cell)))
            face = axis * 2 + (0 if d[axis] > 0 else 1)
            return dict(hit=True, block=q, face=face, cell=cell, entering=True)
        if p != air and translucent[q]:
            axis = int(np.argmax(np.abs(cell - prev_cell)))
            face = axis * 2 + (1 if d[axis] > 0 else 0)
            return dict(hit=True, block=p, face=face, cell=prev_cell, entering=False)
        prev_cell = cell
        if (cell < -1).any() or (cell > size).any():
            break
    return dict(hit=False)


# ---------------------------------------------------------------------------
# Beam pre-pass: conservative cone march for camera rays.
#
# All primary rays of one sample batch share an origin (the eye,
# reference pathtrace_shader.rs:895), so an 8x8 pixel tile forms a cone:
# ray i's point at its own parameter s satisfies
# |p_i(s) - p_c(s)| = s * |d_i - d_c| <= s * c_tile. A distance-field
# value v at the central position certifies that every cell within
# chebyshev radius v-1 (hence the euclidean ball of radius v-1) is air,
# and cells outside the grid are air by definition. Advancing the
# central parameter by delta keeps the whole cone in proven air while
# (t + delta) * c_tile + delta <= v - 1 - eps, so
#   delta = (v - 1 - eps - t * c_tile) / (1 + c_tile).
# The march stops when delta falls under half a cell; the returned T is
# a per-tile parameter such that every tile ray is in air for its own
# parameter <= T, letting the real tracer start at eye + (T - 0.5) * d_i.
# ---------------------------------------------------------------------------


def beam_march(
    dist: jax.Array,
    d_c: jax.Array,
    c_tile: jax.Array,
    eye: jax.Array,
    max_iters: int = 96,
) -> jax.Array:
    """Per-tile safe advance T. d_c (n,3) unit central dirs, c_tile (n,)."""
    X, Y, Z = dist.shape
    dims = jnp.asarray([X, Y, Z], jnp.float32)
    eps = jnp.float32(0.05)
    dist_flat = dist.reshape(-1).astype(jnp.float32)

    def body(state):
        t, alive, it = state
        p = eye[None, :] + t[:, None] * d_c
        cell = jnp.floor(p)
        inside = jnp.all((cell >= 0) & (cell < dims), axis=-1)
        ci = cell.astype(jnp.int32)
        idx = (ci[:, 0] * Y + ci[:, 1]) * Z + ci[:, 2]
        v = jnp.take(dist_flat, jnp.where(inside, idx, 0), axis=0)
        delta = (v - 1.0 - eps - t * c_tile) / (1.0 + c_tile)
        ok = alive & inside & (delta >= 0.5)
        t = jnp.where(ok, t + delta, t)
        return t, ok, it + 1

    def cond(state):
        _, alive, it = state
        return jnp.any(alive) & (it < max_iters)

    n = d_c.shape[0]
    t0 = jnp.zeros((n,), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    t, _, _ = jax.lax.while_loop(cond, body, (t0, alive0, jnp.int32(0)))
    return t


def beam_advance(
    dist: jax.Array,
    eye: jax.Array,
    d: jax.Array,
    tile: int = 8,
) -> jax.Array:
    """Per-ray safe advance for camera rays d of shape (spp, H, W, 3).

    Returns adv (spp, H, W): each ray is provably in air for its own
    parameter <= adv (adv = max(T_tile - 0.5, 0)), so tracing may start
    from eye + adv * d with unchanged results.
    """
    spp, H, W, _ = d.shape
    if H % tile or W % tile:
        return jnp.zeros((spp, H, W), jnp.float32)
    dt = d.reshape(spp, H // tile, tile, W // tile, tile, 3)
    d_c = dt.mean(axis=(0, 2, 4))                              # (Ht, Wt, 3)
    d_c = d_c / jnp.sqrt((d_c * d_c).sum(-1, keepdims=True))
    diff = dt - d_c[None, :, None, :, None, :]
    c_tile = jnp.sqrt((diff * diff).sum(-1)).max(axis=(0, 2, 4))
    T = beam_march(dist, d_c.reshape(-1, 3), c_tile.reshape(-1), eye)
    T = T.reshape(1, H // tile, 1, W // tile, 1)
    adv = jnp.maximum(T - 0.5, 0.0)
    return jnp.broadcast_to(
        adv, (spp, H // tile, tile, W // tile, tile)
    ).reshape(spp, H, W)
