"""Pallas TPU kernel: the procedural tracer's march, VMEM-resident.

ops/dda_proc.py removes the per-step gather; this kernel removes the
per-step HBM state traffic that remains in the XLA while_loop version
(every iteration of a lax.while_loop round-trips the multi-MB carry
through HBM: ~60 B/ray/step r+w). Here each (8, 128)-ray block loads its
origins/directions into VMEM once, marches to completion in registers
with a per-block early exit (jnp.any(alive) — tile-level divergence
instead of whole-batch lockstep), and writes two words per ray at the
end. Every op in the loop body is dense VPU math: the occupancy test is
the arithmetic-hash simplex evaluation (ops/noise.py), exactly the
computation ops/dda_proc._make_occupancy performs, so results are
bit-identical to trace_proc (asserted in tests/test_pallas_proc.py).

Scope: the fine marching loop for worldgen occupancy. Edits and the
coarse skip table are handled by the caller: scenes with edits fall back
to the XLA trace_proc (Scene handles this; edited cells are rare and the
XLA path is exact), and the coarse table's one-hot matmul read is an XLA
formulation — in-kernel the blobby bench world profits little from it
(90% of 8^3 blocks contain solids, docs/PERF.md).

Replaces the retired ops/pallas/trace.py grid-gather kernel, whose
measured 9.7 ns/element in-kernel gather rate matched XLA's scalar-loop
floor and was never production-viable (VERDICT r1 weak #3).

Output encoding (per ray):
  t       float32
  packed  int32: hit | entering<<1 | face<<2 | cx<<5 | cy<<14 | cz<<23
          (grids up to 512^3)
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrv_tpu.ops.noise import _seed_mix

# np scalar, not jnp: a module-level jnp array would be a captured constant,
# which pallas kernels reject
_BIG = np.float32(3.0e38)

BLOCK_ROWS = 8   # rays per block = BLOCK_ROWS * 128
LANES = 128

import os as _os

# cell-steps per while-loop iteration (A/B knob; docs/PERF.md)
UNROLL = int(_os.environ.get("VRV_PALLAS_UNROLL", "1"))


def _simplex3_seeded(x, y, z, seed_mix):
    """ops/noise.simplex3 with the host-side seed mix precomputed.

    Inlined here (rather than imported) only to take seed_mix as a traced
    value-free constant; the math must stay textually identical to
    ops/noise.simplex3 so the two compile to the same per-element program.
    """
    from vrv_tpu.ops.noise import _F3, _G3, _grad_dot, _grad_index

    s = (x + y + z) * _F3
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    k = jnp.floor(z + s)
    t = (i + j + k) * _G3
    x0 = x - (i - t)
    y0 = y - (j - t)
    z0 = z - (k - t)
    gx = x0 >= y0
    gy = y0 >= z0
    gz = x0 >= z0
    i1 = (gx & gz).astype(jnp.float32)
    j1 = ((~gx) & gy).astype(jnp.float32)
    k1 = ((~gy) & (~gz)).astype(jnp.float32)
    i2 = (gx | (gy & gz)).astype(jnp.float32)
    j2 = ((~gx) | gy).astype(jnp.float32)
    k2 = (~(gy & (gx | gz))).astype(jnp.float32)
    x1 = x0 - i1 + _G3
    y1 = y0 - j1 + _G3
    z1 = z0 - k1 + _G3
    x2 = x0 - i2 + 2.0 * _G3
    y2 = y0 - j2 + 2.0 * _G3
    z2 = z0 - k2 + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3
    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)
    kk = k.astype(jnp.int32)

    def gi(di, dj, dk):
        return _grad_index(ii + di, jj + dj, kk + dk, seed_mix)

    g0 = gi(0, 0, 0)
    g1 = gi(i1.astype(jnp.int32), j1.astype(jnp.int32), k1.astype(jnp.int32))
    g2 = gi(i2.astype(jnp.int32), j2.astype(jnp.int32), k2.astype(jnp.int32))
    g3 = gi(1, 1, 1)

    def corner(gidx, cx, cy, cz):
        tt = 0.5 - cx * cx - cy * cy - cz * cz
        tt = jnp.maximum(tt, 0.0)
        dot = _grad_dot(gidx, cx, cy, cz)
        return (tt * tt) * (tt * tt) * dot

    n = (
        corner(g0, x0, y0, z0)
        + corner(g1, x1, y1, z1)
        + corner(g2, x2, y2, z2)
        + corner(g3, x3, y3, z3)
    )
    return 76.7 * 0.864 * n


def _trace_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_ref, packed_ref,
    *, ps, t_min, t_max,
):
    f32 = jnp.float32
    i32 = jnp.int32
    X, Y, Z = ps.shape
    gox, goy, goz = ps.origin
    thr = f32(ps.threshold)
    inv_scale = f32(1.0 / ps.noise_scale)
    inv_falloff = f32(1.0 / ps.y_falloff)
    seed_mix = _seed_mix(ps.seed)

    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]

    tiny = f32(1e-12)
    bigx = jnp.abs(dx) < tiny
    bigy = jnp.abs(dy) < tiny
    bigz = jnp.abs(dz) < tiny
    ix = 1.0 / jnp.where(bigx, tiny, dx)
    iy = 1.0 / jnp.where(bigy, tiny, dy)
    iz = 1.0 / jnp.where(bigz, tiny, dz)

    def solid_at(cx, cy, cz, inside):
        wx = cx.astype(f32) + gox
        wy = cy.astype(f32) + goy
        wz = cz.astype(f32) + goz
        dens = (
            _simplex3_seeded(wx * inv_scale, wy * inv_scale, wz * inv_scale, seed_mix)
            - wy * inv_falloff
        )
        return (dens > thr) & inside

    # ---- init: slab clip + boundary-entry hit (dda_proc._init formulas) ----
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
    degenerate = bigx & bigy & bigz
    valid = (t0 <= t_exit) & (t0 <= f32(t_max)) & ~degenerate

    cx = jnp.clip(jnp.floor(ox + t0 * dx).astype(i32), 0, X - 1)
    cy = jnp.clip(jnp.floor(oy + t0 * dy).astype(i32), 0, Y - 1)
    cz = jnp.clip(jnp.floor(oz + t0 * dz).astype(i32), 0, Z - 1)
    cur_solid = solid_at(cx, cy, cz, valid)

    starts_outside = t_enter > f32(t_min)
    entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
    hit0 = valid & starts_outside & cur_solid & (t_enter >= f32(t_min)) & (
        t_enter <= f32(t_max)
    )

    zero = jnp.zeros_like(cx)
    # Mosaic cannot carry vector<i1> through scf.while (scf.yield fails to
    # legalize) — every boolean loop-carry travels as an i32 0/1 mask and
    # is re-derived with != 0 inside the body
    state = (
        (valid & ~hit0).astype(i32),                     # alive
        cx, cy, cz,                                      # cell
        cur_solid.astype(i32),                           # cur_solid
        hit0.astype(i32),                                # hit
        jnp.where(hit0, t_enter, f32(0.0)),              # t
        jnp.where(hit0, entry_face.astype(i32), zero),   # face
        jnp.where(hit0, cx, zero),                       # hx
        jnp.where(hit0, cy, zero),                       # hy
        jnp.where(hit0, cz, zero),                       # hz
        hit0.astype(i32),                                # entering
        jnp.int32(0),                                    # steps
    )
    max_steps = int(X + Y + Z + 3)

    def cond(s):
        return (jnp.max(s[0]) > 0) & (s[12] < max_steps)

    def body(s):
        (alive_i, scx, scy, scz, cur_solid_i, hit_i, t, face, hx, hy, hz,
         entering_i, steps) = s
        alive = alive_i != 0
        cur_solid = cur_solid_i != 0
        hit = hit_i != 0
        entering = entering_i != 0
        fx, fy, fz = scx.astype(f32), scy.astype(f32), scz.astype(f32)
        tax = jnp.where(bigx, _BIG, (fx + (dx > 0) - ox) * ix)
        tay = jnp.where(bigy, _BIG, (fy + (dy > 0) - oy) * iy)
        taz = jnp.where(bigz, _BIG, (fz + (dz > 0) - oz) * iz)
        t_next = jnp.minimum(jnp.minimum(tax, tay), taz)
        ax_x = t_next == tax
        ax_y = (~ax_x) & (t_next == tay)
        axis = jnp.where(ax_x, 0, jnp.where(ax_y, 1, 2))
        d_axis = jnp.where(ax_x, dx, jnp.where(ax_y, dy, dz))
        sgn = jnp.where(d_axis > 0, 1, -1).astype(i32)
        nx = scx + jnp.where(ax_x, sgn, 0)
        ny = scy + jnp.where(ax_y, sgn, 0)
        nz = scz + jnp.where(ax_x | ax_y, 0, sgn)
        inside = (
            (nx >= 0) & (nx < X) & (ny >= 0) & (ny < Y) & (nz >= 0) & (nz < Z)
        )
        new_solid = solid_at(nx, ny, nz, inside)

        entering_hit = new_solid & ~cur_solid
        exiting_hit = cur_solid & ~new_solid
        in_range = (t_next >= f32(t_min)) & (t_next <= f32(t_max))
        any_hit = alive & in_range & (entering_hit | exiting_hit)
        nface = jnp.where(
            entering_hit,
            axis * 2 + jnp.where(sgn > 0, 0, 1),
            axis * 2 + jnp.where(sgn > 0, 1, 0),
        ).astype(i32)

        rec = any_hit & ~hit
        dead = ~inside | (t_next > f32(t_max))
        return (
            (alive & ~any_hit & ~dead).astype(i32),
            nx, ny, nz,
            new_solid.astype(i32),
            (hit | any_hit).astype(i32),
            jnp.where(rec, t_next, t),
            jnp.where(rec, nface, face),
            jnp.where(rec, jnp.where(entering_hit, nx, scx), hx),
            jnp.where(rec, jnp.where(entering_hit, ny, scy), hy),
            jnp.where(rec, jnp.where(entering_hit, nz, scz), hz),
            # bitwise select: Mosaic rejects select_n on i1 vectors
            # (legalizes through i8, then fails the i8->i1 trunci)
            ((rec & entering_hit) | (~rec & entering)).astype(i32),
            steps + 1,
        )

    unroll = UNROLL
    if unroll > 1:
        # compose the body: k cell-steps per loop iteration. Bit-identical
        # (same visit order; finished rays are masked no-ops) — trades
        # loop-control overhead for at most k-1 wasted masked steps
        inner = body

        def body(s, _inner=inner, _k=unroll):
            for _ in range(_k):
                s = _inner(s)
            return s

    s = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, hit_i, t, face, hx, hy, hz, entering_i, _) = s
    t_ref[:] = t
    packed_ref[:] = (
        hit_i
        | (entering_i << 1)
        | (face << 2)
        | (hx << 5)
        | (hy << 14)
        | (hz << 23)
    )


@functools.partial(jax.jit, static_argnames=("ps", "t_min", "t_max", "interpret"))
def _trace_proc_pallas_flat(ps, o, d, t_min, t_max, interpret=False):
    n = o.shape[0]
    rows = (n + LANES - 1) // LANES
    rows_pad = (rows + BLOCK_ROWS - 1) // BLOCK_ROWS * BLOCK_ROWS
    n_pad = rows_pad * LANES

    def prep(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(rows_pad, LANES)

    # padding rays get d = 0 -> degenerate -> invalid -> never marched
    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])

    grid = (rows_pad // BLOCK_ROWS,)
    spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0))
    t, packed = pl.pallas_call(
        functools.partial(_trace_kernel, ps=ps, t_min=t_min, t_max=t_max),
        grid=grid,
        in_specs=[spec] * 6,
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz)
    return t.reshape(-1)[:n], packed.reshape(-1)[:n]


def trace_proc_pallas(ps, origin, direction, t_min=0.001, t_max=1000.0,
                      pd=None, interpret=False):
    """Same contract as dda_proc.trace_proc (edit-free worlds only)."""
    from vrv_tpu.ops.dda import TraceResult
    from vrv_tpu.ops.dda_proc import _hit_blocks, assemble

    if ps.n_edits:
        raise ValueError("pallas proc tracer supports edit-free worlds; "
                         "Scene falls back to the XLA tracer when edits exist")
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    t, packed = _trace_proc_pallas_flat(ps, o, d, float(t_min), float(t_max),
                                        interpret=interpret)
    hit = (packed & 1) == 1
    entering = ((packed >> 1) & 1) == 1
    face = (packed >> 2) & 7
    hx = (packed >> 5) & 511
    hy = (packed >> 14) & 511
    hz = (packed >> 23) & 511
    pw = assemble(ps, pd)
    blocks = _hit_blocks(pw, hx, hy, hz, hit)
    cell = jnp.stack([hx, hy, hz], axis=-1)
    return TraceResult(
        hit=hit.reshape(shape),
        t=t.reshape(shape),
        block=blocks.reshape(shape),
        face=face.reshape(shape),
        cell=cell.reshape(shape + (3,)),
        entering=entering.reshape(shape),
    )
