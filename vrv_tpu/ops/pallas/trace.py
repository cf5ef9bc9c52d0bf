"""Pallas DDA trace kernel: VMEM-resident world, ray-tile grid.

The voxel world is tiny by TPU standards (128^3 block ids + skip
distances pack into a 4 MB uint16 table), so the entire scene fits in
VMEM — the kernel streams ray tiles through the grid dimension and every
DDA step's lookup is a VMEM gather instead of an HBM round-trip, which is
the difference between this kernel and the XLA formulation in ops/dda.py
(where each while_loop iteration re-touches HBM).

Semantics are identical to ops/dda.trace_skip (same packing: block id in
the high byte, chebyshev skip distance low). Tested against it in
interpret mode; enabled on TPU when tools/probe_tpu.py shows in-kernel
gathers are supported & profitable on the installed jax/libtpu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrv_tpu.ops import dda

RAY_TILE = 2048  # rays per kernel instance


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_world(grid: jax.Array, dist: jax.Array) -> jax.Array:
    """(X,Y,Z) uint8 block + uint8 skip distance -> flat uint16 comb table."""
    comb = (grid.astype(jnp.uint32) << 8) | dist.astype(jnp.uint32)
    return comb.reshape(-1).astype(jnp.uint16)


def _trace_kernel(
    size_x: int, size_y: int, size_z: int,
    n_blocks: int, t_min: float, t_max: float, max_steps: int,
    comb_ref, translucent_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    hit_ref, t_ref, block_ref, face_ref, cellx_ref, celly_ref, cellz_ref,
    entering_ref,
):
    f32 = jnp.float32
    i32 = jnp.int32
    air = jnp.uint8(n_blocks - 1)
    sx, sy, sz = f32(size_x), f32(size_y), f32(size_z)
    comb = comb_ref[:]
    translucent = translucent_ref[:]
    outside_comb = ((n_blocks - 1) << 8) | 255

    o = [ox_ref[:], oy_ref[:], oz_ref[:]]
    d = [dx_ref[:], dy_ref[:], dz_ref[:]]
    size_f = [sx, sy, sz]
    size_i = [i32(size_x), i32(size_y), i32(size_z)]
    strides = [size_y * size_z, size_z, 1]

    d_safe = [jnp.where(jnp.abs(di) < 1e-12, f32(1e-12), di) for di in d]
    inv = [1.0 / ds for ds in d_safe]

    # slab clip
    t_enter = jnp.full_like(o[0], -3e38)
    t_exit = jnp.full_like(o[0], 3e38)
    enter_axis = jnp.zeros_like(o[0], dtype=i32)
    for ax in range(3):
        lo = (0.0 - o[ax]) * inv[ax]
        hi = (size_f[ax] - o[ax]) * inv[ax]
        tn = jnp.minimum(lo, hi)
        tf = jnp.maximum(lo, hi)
        enter_axis = jnp.where(tn > t_enter, ax, enter_axis)
        t_enter = jnp.maximum(t_enter, tn)
        t_exit = jnp.minimum(t_exit, tf)

    t0 = jnp.maximum(t_enter, f32(t_min))
    degenerate = (
        (jnp.abs(d[0]) < 1e-12) & (jnp.abs(d[1]) < 1e-12) & (jnp.abs(d[2]) < 1e-12)
    )
    valid = (t0 <= t_exit) & (t0 <= t_max) & ~degenerate

    cell = []
    for ax in range(3):
        p = o[ax] + t0 * d[ax]
        cell.append(jnp.clip(jnp.floor(p).astype(i32), 0, size_i[ax] - 1))

    def lookup(cx, cy, cz, inside):
        flat = cx * strides[0] + cy * strides[1] + cz * strides[2]
        got = jnp.take(comb, flat, axis=0).astype(i32)
        return jnp.where(inside, got, outside_comb)

    cur_comb = lookup(cell[0], cell[1], cell[2], valid)
    cur_block = (cur_comb >> 8).astype(jnp.uint8)

    d_enter = (
        jnp.where(enter_axis == 0, d[0], jnp.where(enter_axis == 1, d[1], d[2]))
    )
    entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
    starts_outside = t_enter > t_min
    hit0 = (
        valid & starts_outside & (cur_block != air)
        & (t_enter >= t_min) & (t_enter <= t_max)
    )

    state = dict(
        alive=valid & ~hit0,
        cx=cell[0], cy=cell[1], cz=cell[2],
        comb=cur_comb,
        hit=hit0,
        t=jnp.where(hit0, t_enter, f32(0.0)),
        block=jnp.where(hit0, cur_block, air),
        face=jnp.where(hit0, entry_face, 0),
        hx=jnp.where(hit0, cell[0], 0),
        hy=jnp.where(hit0, cell[1], 0),
        hz=jnp.where(hit0, cell[2], 0),
        entering=hit0,
    )

    def body(_, s):
        cells = [s["cx"], s["cy"], s["cz"]]
        cur = (s["comb"] >> 8).astype(jnp.uint8)
        v = s["comb"] & 255
        can_skip = s["alive"] & (v >= 3)
        r = (v - 2).astype(f32)

        # skip branch
        t_skip = jnp.full_like(o[0], 3e38)
        for ax in range(3):
            cf = cells[ax].astype(f32)
            tb = jnp.where(d[ax] > 0, (cf + 1.0 + r - o[ax]) * inv[ax],
                           (cf - r - o[ax]) * inv[ax])
            tb = jnp.where(jnp.abs(d[ax]) < 1e-12, f32(3e38), tb)
            t_skip = jnp.minimum(t_skip, tb)
        skip_cell = []
        skip_inside = jnp.ones_like(s["alive"])
        for ax in range(3):
            p = o[ax] + (t_skip + 1e-4) * d[ax]
            c = jnp.floor(p).astype(i32)
            skip_inside = skip_inside & (c >= 0) & (c < size_i[ax])
            skip_cell.append(c)
        skip_out = ~skip_inside | (t_skip > t_max)

        # exact branch
        t_next = jnp.full_like(o[0], 3e38)
        axis = jnp.zeros_like(o[0], dtype=i32)
        for ax in range(3):
            nb = cells[ax].astype(f32) + jnp.where(d[ax] > 0, 1.0, 0.0)
            ta = (nb - o[ax]) * inv[ax]
            ta = jnp.where(jnp.abs(d[ax]) < 1e-12, f32(3e38), ta)
            axis = jnp.where(ta < t_next, ax, axis)
            t_next = jnp.minimum(t_next, ta)
        d_axis = jnp.where(axis == 0, d[0], jnp.where(axis == 1, d[1], d[2]))
        step_sign = jnp.where(d_axis > 0, 1, -1).astype(i32)
        exact_cell = []
        inside_exact = jnp.ones_like(s["alive"])
        for ax in range(3):
            c = cells[ax] + jnp.where(axis == ax, step_sign, 0)
            inside_exact = inside_exact & (c >= 0) & (c < size_i[ax])
            exact_cell.append(c)

        new_cell = [
            jnp.where(can_skip, skip_cell[ax], exact_cell[ax]) for ax in range(3)
        ]
        inside = jnp.where(can_skip, skip_inside, inside_exact)
        new_comb = lookup(
            jnp.clip(new_cell[0], 0, size_i[0] - 1),
            jnp.clip(new_cell[1], 0, size_i[1] - 1),
            jnp.clip(new_cell[2], 0, size_i[2] - 1),
            inside,
        )
        new_block = (new_comb >> 8).astype(jnp.uint8)

        cur_tl = jnp.take(translucent, cur.astype(i32), axis=0)
        new_tl = jnp.take(translucent, new_block.astype(i32), axis=0)
        entering_hit = (new_block != air) & cur_tl & ~can_skip
        exiting_hit = (cur != air) & new_tl & ~can_skip
        in_range = (t_next >= t_min) & (t_next <= t_max)
        any_hit = s["alive"] & in_range & (entering_hit | exiting_hit)

        face_pos = axis * 2 + jnp.where(step_sign > 0, 0, 1)
        face_neg = axis * 2 + jnp.where(step_sign > 0, 1, 0)
        face = jnp.where(entering_hit, face_pos, face_neg)
        hblock = jnp.where(entering_hit, new_block, cur)
        hc = [jnp.where(entering_hit, new_cell[ax], cells[ax]) for ax in range(3)]

        rec = any_hit & ~s["hit"]
        dead_exact = ~inside_exact | (t_next > t_max)
        dead = jnp.where(can_skip, skip_out, dead_exact)
        alive = s["alive"] & ~any_hit & ~dead
        return dict(
            alive=alive,
            cx=new_cell[0], cy=new_cell[1], cz=new_cell[2],
            comb=new_comb,
            hit=s["hit"] | any_hit,
            t=jnp.where(rec, t_next, s["t"]),
            block=jnp.where(rec, hblock, s["block"]),
            face=jnp.where(rec, face, s["face"]),
            hx=jnp.where(rec, hc[0], s["hx"]),
            hy=jnp.where(rec, hc[1], s["hy"]),
            hz=jnp.where(rec, hc[2], s["hz"]),
            entering=jnp.where(rec, entering_hit, s["entering"]),
        )

    s = jax.lax.fori_loop(0, max_steps, body, state)

    hit_ref[:] = s["hit"]
    t_ref[:] = s["t"]
    block_ref[:] = s["block"]
    face_ref[:] = s["face"]
    cellx_ref[:] = s["hx"]
    celly_ref[:] = s["hy"]
    cellz_ref[:] = s["hz"]
    entering_ref[:] = s["entering"]


def trace_pallas(
    grid: jax.Array,
    dist: jax.Array,
    translucent: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    t_min: float = 0.001,
    t_max: float = 1000.0,
    interpret: bool = False,
) -> dda.TraceResult:
    """Pallas analog of ops/dda.trace_skip; same TraceResult contract."""
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    n = o.shape[0]
    n_pad = _ceil_to(max(n, RAY_TILE), RAY_TILE)
    pad = n_pad - n
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)

    X, Y, Z = grid.shape
    comb = pack_world(grid, dist)
    tl = translucent.astype(jnp.bool_)
    n_blocks = translucent.shape[0]
    max_steps = int(X + Y + Z + 3)

    kernel = functools.partial(
        _trace_kernel, X, Y, Z, n_blocks, float(t_min), float(t_max), max_steps
    )
    grid_spec = pl.GridSpec(
        grid=(n_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # comb (whole world)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # translucent
        ]
        + [
            pl.BlockSpec((RAY_TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        out_specs=[
            pl.BlockSpec((RAY_TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(8)
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad,), jnp.bool_),     # hit
        jax.ShapeDtypeStruct((n_pad,), jnp.float32),   # t
        jax.ShapeDtypeStruct((n_pad,), jnp.uint8),     # block
        jax.ShapeDtypeStruct((n_pad,), jnp.int32),     # face
        jax.ShapeDtypeStruct((n_pad,), jnp.int32),     # cellx
        jax.ShapeDtypeStruct((n_pad,), jnp.int32),     # celly
        jax.ShapeDtypeStruct((n_pad,), jnp.int32),     # cellz
        jax.ShapeDtypeStruct((n_pad,), jnp.bool_),     # entering
    ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(comb, tl, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])

    hit, t, block, face, cx, cy, cz, entering = outs

    def r(x, *more):
        return x[:n].reshape(shape)

    cell = jnp.stack([cx[:n], cy[:n], cz[:n]], axis=-1).reshape(shape + (3,))
    return dda.TraceResult(
        hit=r(hit), t=r(t), block=r(block), face=r(face),
        cell=cell, entering=r(entering),
    )
