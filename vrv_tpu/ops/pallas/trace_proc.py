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

Scope: the fine marching loop for worldgen occupancy PLUS the padded
edit list (game set_block deltas, <= Scene.PROC_EDIT_CAP cells). Edits
ride in SMEM as two scalars each (packed cell key + solid/translucent
flags), hoisted out of the loop; the per-step cost is one dense vector
compare per edit — the same dense-compare semantics as
ops/dda_proc._make_occupancy, so edited worlds stay bit-identical to
the XLA tracer. The in-kernel constant skip certificates (coarse_const)
are baked only for pristine worlds (render/scene._proc_finalize); with
edits the kernel marches without them — measured neutral on the bench
scene (docs/PERF.md round-2 table).

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
# On-chip retune (v5e, graded entry scene, in-kernel NEE, 2026-08-19):
# u12 477.5 / u16 464.2 / u20 452.1 / u24 443.7 / u32 443.0 ms/frame —
# 24 takes the knee (32 ties but compiles 1.4x slower).
UNROLL = int(_os.environ.get("VRV_PALLAS_UNROLL", "24"))

# force interpret mode (tests: runs the kernels as XLA ops on any backend)
INTERPRET = bool(int(_os.environ.get("VRV_PALLAS_INTERPRET", "0")))


def _grad_dot_sx(gi, cx, cy, cz):
    """ops/noise._grad_dot by sign-bit xor — VALUE-identical, convert-free.

    s * v with s an EXACT +-1.0 equals v with its IEEE sign bit flipped
    (for every finite/inf/nan v), so the two +-1 scale factors become two
    xors on the float bits: 2 i32->f32 converts + 2 muls + 2 subs + 2
    muls per corner collapse to shifts/xors/bitcasts, which the v5e VPU
    runs at full rate (tools/vpu_probe.py). Equality with _grad_dot is
    gated in tests/test_march_opt.py."""
    i32 = jnp.int32
    g0 = gi < 4
    g1 = (gi >= 4) & (gi < 8)
    a = jnp.where(g0 | g1, cx, cy)
    b = jnp.where(g0, cy, cz)
    bc = jax.lax.bitcast_convert_type
    sa = bc(bc(a, i32) ^ ((gi & 1) << 31), jnp.float32)
    sb = bc(bc(b, i32) ^ ((gi & 2) << 30), jnp.float32)
    return sa + sb


def _simplex3_seeded(x, y, z, seed_mix, opt=False):
    """ops/noise.simplex3 with the host-side seed mix precomputed.

    Inlined here (rather than imported) only to take seed_mix as a traced
    value-free constant; with opt=False the math stays textually identical
    to ops/noise.simplex3 so the two compile to the same per-element
    program. opt=True (cfg.pallas_march_opt) selects VALUE-identical
    convert/select-lean forms (bool-derived corner offsets, sign-xor
    gradient dots) — measured op costs in tools/vpu_probe.py put
    f32<->i32 converts at ~2x an ALU op on the v5e VPU while the hash's
    i32 multiplies are full-rate, so the converts are what go.
    Bit-identity old-vs-new gated in tests/test_march_opt.py.
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
    b_i1 = gx & gz
    b_j1 = (~gx) & gy
    b_k1 = (~gy) & (~gz)
    b_i2 = gx | (gy & gz)
    b_j2 = (~gx) | gy
    b_k2 = ~(gy & (gx | gz))
    i1 = b_i1.astype(jnp.float32)
    j1 = b_j1.astype(jnp.float32)
    k1 = b_k1.astype(jnp.float32)
    i2 = b_i2.astype(jnp.float32)
    j2 = b_j2.astype(jnp.float32)
    k2 = b_k2.astype(jnp.float32)
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
    if opt:
        # corner-offset ints straight from the ranking bools (the f32
        # forms take the round trip bool->f32->i32 otherwise: two real
        # converts per component)
        zero_i = jnp.zeros_like(ii)
        one_i = jnp.ones_like(ii)
        g1 = gi(jnp.where(b_i1, one_i, zero_i),
                jnp.where(b_j1, one_i, zero_i),
                jnp.where(b_k1, one_i, zero_i))
        g2 = gi(jnp.where(b_i2, one_i, zero_i),
                jnp.where(b_j2, one_i, zero_i),
                jnp.where(b_k2, one_i, zero_i))
    else:
        g1 = gi(i1.astype(jnp.int32), j1.astype(jnp.int32),
                k1.astype(jnp.int32))
        g2 = gi(i2.astype(jnp.int32), j2.astype(jnp.int32),
                k2.astype(jnp.int32))
    g3 = gi(1, 1, 1)
    gdot = _grad_dot_sx if opt else _grad_dot

    def corner(gidx, cx, cy, cz):
        tt = 0.5 - cx * cx - cy * cy - cz * cz
        tt = jnp.maximum(tt, 0.0)
        dot = gdot(gidx, cx, cy, cz)
        return (tt * tt) * (tt * tt) * dot

    n = (
        corner(g0, x0, y0, z0)
        + corner(g1, x1, y1, z1)
        + corner(g2, x2, y2, z2)
        + corner(g3, x3, y3, z3)
    )
    return 76.7 * 0.864 * n


def _const_word_tree(words, idx):
    """Select words[idx] per lane from compile-time constant ints.

    words: python ints (padded to a power of two); idx: (8,128) i32.
    Lowered as a binary select tree — len(words)-1 vector selects, zero
    memory traffic (this is the gather-free constant read the coarse
    skip rides; legal because the pallas tracer only runs on edit-free
    worldgen scenes, where the occupancy is a pure function of the
    static ProcStatic)."""

    def sel(base, m):
        if m == 0:
            w = words[base] if base < len(words) else 0
            return jnp.int32(np.int32(np.uint32(w)))
        half = 1 << (m - 1)
        b = (idx >> (m - 1)) & 1
        return jnp.where(b == 1, sel(base + half, m - 1), sel(base, m - 1))

    nbits = max(1, (len(words) - 1).bit_length())
    return sel(0, nbits)


def _pack_occupancy(occ: np.ndarray):
    """(Bx, By, Bz) bool -> tuple of i32 bit-words, C-order flat index."""
    flat = np.ascontiguousarray(occ).ravel()
    nw = (flat.size + 31) // 32
    words = np.zeros(nw, np.uint32)
    idxs = np.nonzero(flat)[0]
    np.bitwise_or.at(words, idxs >> 5, np.uint32(1) << (idxs & 31).astype(np.uint32))
    return tuple(int(w) for w in words)


def coarse_consts(coarse: np.ndarray, grid: np.ndarray = None, air_id: int = 0):
    """Static skip structures from the scene's coarse distance table.

    Level 2: 32-cell superblocks (4x4x4 8-cell blocks, a superblock is
    occupied if any member block is; the 8-cell level itself is NOT
    shipped — measured in-kernel, its select-tree cost ~ its win).
    Level 3 (from `grid` when given): per 8x8 (x,z) column-block height
    envelope — y_low[bx,bz] = 1 + the highest solid y anywhere in that
    column region (0 if none), so every cell with y >= y_low is air.
    This is the certificate that serves terrain-GRAZING rays, whose
    blocks all contain solids below them (block occupancy never fires);
    worldgen air lies above the terrain (density falls with +y).

    Returns a hashable ((shape2, words2), env) tuple; env = ((Bx, Bz),
    bits, words) with y_low packed 4 x 8-bit or 2 x 16-bit per word, or
    None without `grid`. The tuple is a jit-static argument (hashed per
    call), so dead levels are deliberately not carried.
    """
    occ = np.asarray(coarse) == 0
    s1 = occ.shape
    sup_shape = tuple((s + 3) // 4 for s in s1)
    pad = [(0, 4 * ss - s) for ss, s in zip(sup_shape, s1)]
    occ_p = np.pad(occ, pad, constant_values=False)
    sup = occ_p.reshape(
        sup_shape[0], 4, sup_shape[1], 4, sup_shape[2], 4
    ).any(axis=(1, 3, 5))

    env = None
    if grid is not None:
        g = np.asarray(grid)
        X, Y, Z = g.shape
        from vrv_tpu.ops.dda_proc import COARSE_BLOCK as B
        Bx, Bz = (X + B - 1) // B, (Z + B - 1) // B
        solid = g != np.uint8(air_id)
        solid = np.pad(solid, [(0, Bx * B - X), (0, 0), (0, Bz * B - Z)])
        # (Bx, B, Y, Bz, B) -> any over the in-block x/z -> (Bx, Y, Bz)
        col = solid.reshape(Bx, B, Y, Bz, B).any(axis=(1, 4))
        ys = np.arange(Y, dtype=np.int64)[None, :, None]
        y_top = np.where(col, ys, -1).max(axis=1)          # (Bx, Bz)
        y_low = (y_top + 1).astype(np.uint32)
        flat = y_low.ravel()
        if Y <= 255:
            # 4 x 8-bit per word: a 4x smaller select tree in-kernel
            nw = (flat.size + 3) // 4
            words = np.zeros(nw, np.uint32)
            for i, v in enumerate(flat):
                words[i >> 2] |= np.uint32(v) << np.uint32(8 * (i & 3))
            env = ((Bx, Bz), 8, tuple(int(w) for w in words))
        else:
            nw = (flat.size + 1) // 2
            words = np.zeros(nw, np.uint32)
            for i, v in enumerate(flat):
                words[i >> 1] |= np.uint32(v) << np.uint32(16 * (i & 1))
            env = ((Bx, Bz), 16, tuple(int(w) for w in words))

    return (
        (sup_shape, _pack_occupancy(sup)),
        env,
    )


def _edit_overrides(ek_ref, ef_ref, n_edits):
    """Hoist the padded edit list out of the march loop.

    Each edit travels as two SMEM scalars: a packed cell key
    (x<<20 | y<<10 | z; padding rows use 0x3FFFFFFF, unreachable for
    grids <= 512 per axis) and a flag word (solid | translucent<<1).
    Scalar reads happen ONCE per kernel (loop-invariant); the per-step
    cost is the dense vector compare against each key — the same
    dense-compare semantics as ops/dda_proc._make_occupancy, so results
    stay bit-identical to the XLA tracer (tests/test_pallas_proc.py).
    """
    ekeys = [ek_ref[e] for e in range(n_edits)]
    esol = [ef_ref[e] & 1 for e in range(n_edits)]
    etl = [(ef_ref[e] >> 1) & 1 for e in range(n_edits)]
    eblk = [(ef_ref[e] >> 2) & 0xFF for e in range(n_edits)]
    return ekeys, esol, etl, eblk


def _apply_edits(cx, cy, cz, wg_solid, edits, cmp="bool"):
    """(solid, translucent) for candidate cells, worldgen + edit overrides.

    wg_solid excludes the `inside` mask (applied by the caller after the
    solid override, matching dda_proc._make_occupancy's order).

    Per-edit cost is the design constraint at large E (the per-chunk
    gate bounds WHERE it is paid, this bounds HOW MUCH): one vector
    compare + three i1 accumulates, all full-rate mask ops — the earlier
    i32 form paid a ~2x convert (.astype) plus two multiplies per edit
    (tools/vpu_probe.py op prices). Same boolean values."""
    ekeys, esol, etl = edits[:3]
    key = (cx << 20) | (cy << 10) | cz
    if cmp == "i32":
        i32 = jnp.int32
        edited = jnp.zeros_like(cx)
        sol_i = jnp.zeros_like(cx)
        tl_i = jnp.zeros_like(cx)
        for e in range(len(ekeys)):
            mi = (key == ekeys[e]).astype(i32)
            edited = edited | mi
            sol_i = sol_i | (mi * esol[e])
            tl_i = tl_i | (mi * etl[e])
        edited_b = edited != 0
        solid = (edited_b & (sol_i != 0)) | (~edited_b & wg_solid)
        return solid, edited_b, tl_i
    edited_b = jnp.zeros(cx.shape, bool)
    sol_b = jnp.zeros(cx.shape, bool)
    tl_b = jnp.zeros(cx.shape, bool)
    for e in range(len(ekeys)):
        m = key == ekeys[e]
        edited_b = edited_b | m
        sol_b = sol_b | (m & (esol[e] != 0))
        tl_b = tl_b | (m & (etl[e] != 0))
    # bitwise selects: Mosaic rejects select_n on i1 vectors
    solid = (edited_b & sol_b) | (~edited_b & wg_solid)
    return solid, edited_b, tl_b.astype(jnp.int32)


# ---------------------------------------------------------------------------
# March machinery shared by BOTH kernels (_trace_kernel here and
# path_proc._path_kernel). The formulas must stay bit-identical across the
# tracers — the fused==staged and pallas==XLA parity gates depend on it —
# so there is exactly one copy; every argument is a loop-invariant value
# or the current per-lane state, never a ref.
# ---------------------------------------------------------------------------


def slab_clip(o1, inv, big, size):
    """Per-axis slab interval for the grid [0, size] (dda_proc._init)."""
    lo = (0.0 - o1) * inv
    hi = (size - o1) * inv
    tn = jnp.minimum(lo, hi)
    tf = jnp.maximum(lo, hi)
    inside1 = (o1 >= 0.0) & (o1 <= size)
    tn = jnp.where(big, jnp.where(inside1, -_BIG, _BIG), tn)
    tf = jnp.where(big, jnp.where(inside1, _BIG, -_BIG), tf)
    return tn, tf


def occ_read(level, bx, by, bz):
    """Bit lookup into a packed compile-time occupancy bitset."""
    (Bx, By, Bz), words = level
    idx = (bx * By + by) * Bz + bz
    word = _const_word_tree(words, idx >> 5)
    return (word & (jnp.int32(1) << (idx & 31))) != 0


def derive_y_cut(ps, edits, E):
    """Upward-exit certificate bound: every cell with cy >= y_cut is air —
    worldgen bound from the pristine grid, solid edits raise it at runtime
    from their SMEM keys (loop-invariant scalar math, once per kernel).
    None when the bound is at/above the grid top (compiled out)."""
    if not (0 <= ps.y_air < ps.shape[1]):
        return None
    y_cut = jnp.int32(ps.y_air)
    if E:
        ekeys, esol = edits[0], edits[1]
        for e in range(E):
            ey = (ekeys[e] >> 10) & 0x3FF
            y_cut = jnp.maximum(y_cut, jnp.where(esol[e] != 0, ey + 1, 0))
    return y_cut


def coarse_skip(coarse, mask, scx, scy, scz, ox, oy, oz, dx, dy, dz,
                ix, iy, iz, bigx, bigy, bigz, dims, tmax_v):
    """Constant air-region certificates at the current cell (the in-kernel
    analog of dda_proc's coarse skip; all data baked as compile-time
    words, zero memory traffic):
      box: the 32-cell superblock containing the cell is all-air;
      env: the cell lies at/above the 8x8 column-block's height envelope
           (y >= y_low => air) — serves terrain-grazing rays, whose
           blocks are never empty.
    The ray jumps to the last air cell inside the farther certified
    region. `mask` is the per-lane is-marching predicate. Returns
    (kx, ky, kz, skip_inside, skip_out, can_skip, t_land), where t_land
    is the ray parameter at which the ray ENTERS the landing cell — the
    exact t of the last skipped DDA crossing (same plane, same
    arithmetic), i.e. the largest t an exhaustive march would have
    tested during the skipped span. Consumers that need "how far has
    the march provably progressed" (the instance early-exit) must use
    t_land, NOT the region-exit t: the exit plane can lie past a solid
    boundary hit the exhaustive march would record."""
    f32 = jnp.float32
    i32 = jnp.int32
    X, Y, Z = dims
    lvl2, env = coarse
    occ2 = occ_read(lvl2, scx >> 5, scy >> 5, scz >> 5)
    box_ok = ~occ2
    box_lo_x = ((scx >> 5) * 32).astype(f32)
    box_lo_y = ((scy >> 5) * 32).astype(f32)
    box_lo_z = ((scz >> 5) * 32).astype(f32)
    bf = f32(32.0)

    def region_skip(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
        tbx = jnp.where(bigx, _BIG, jnp.where(
            dx > 0, (hi_x - ox) * ix, (lo_x - ox) * ix))
        tby = jnp.where(bigy, _BIG, jnp.where(
            dy > 0, (hi_y - oy) * iy, (lo_y - oy) * iy))
        tbz = jnp.where(bigz, _BIG, jnp.where(
            dz > 0, (hi_z - oz) * iz, (lo_z - oz) * iz))
        t_skip = jnp.minimum(jnp.minimum(tbx, tby), tbz)
        ex_x = t_skip == tbx
        ex_y = (~ex_x) & (t_skip == tby)

        def skip_axis(is_exit, lo, hi, o1, d1):
            # land on the LAST air cell in the region on this axis
            exact = jnp.where(d1 > 0, hi, lo).astype(i32) - (d1 > 0)
            flo = jnp.clip(
                jnp.floor(o1 + t_skip * d1).astype(i32),
                lo.astype(i32),
                hi.astype(i32) - 1,
            )
            return jnp.where(is_exit, exact, flo)

        kx = skip_axis(ex_x, lo_x, hi_x, ox, dx)
        ky = skip_axis(ex_y, lo_y, hi_y, oy, dy)
        kz = skip_axis(~(ex_x | ex_y), lo_z, hi_z, oz, dz)
        return t_skip, kx, ky, kz

    tb, bkx, bky, bkz = region_skip(
        box_lo_x, box_lo_y, box_lo_z,
        box_lo_x + bf, box_lo_y + bf, box_lo_z + bf,
    )
    if env is not None:
        (Bx, Bz), ebits, ewords = env
        eidx = (scx >> 3) * Bz + (scz >> 3)
        if ebits == 8:
            eword = _const_word_tree(ewords, eidx >> 2)
            y_low = (eword >> (8 * (eidx & 3))) & 0xFF
        else:
            eword = _const_word_tree(ewords, eidx >> 1)
            y_low = (eword >> (16 * (eidx & 1))) & 0xFFFF
        env_ok = scy >= y_low
        te, ekx, eky, ekz = region_skip(
            ((scx >> 3) * 8).astype(f32), y_low.astype(f32),
            ((scz >> 3) * 8).astype(f32),
            ((scx >> 3) * 8 + 8).astype(f32), f32(Y),
            ((scz >> 3) * 8 + 8).astype(f32),
        )
        pick_env = env_ok & (~box_ok | (te >= tb))
        t_skip = jnp.where(pick_env, te, tb)
        kx = jnp.where(pick_env, ekx, bkx)
        ky = jnp.where(pick_env, eky, bky)
        kz = jnp.where(pick_env, ekz, bkz)
        cert = box_ok | env_ok
    else:
        t_skip, kx, ky, kz = tb, bkx, bky, bkz
        cert = box_ok
    # the landing must never fall BEHIND the march: the non-exit axes
    # recompute the position at t_skip from the ORIGIN in f32, and at a
    # cell corner that can round one cell backward (e.g. y@t_skip =
    # 27.000002 -> floor 27 when the march already sits in cell 26) —
    # an un-clamped backward landing makes skip/step oscillate forever
    # and the lane retires as a step-budget MISS through solid terrain
    kx = jnp.where(dx > 0, jnp.maximum(kx, scx), jnp.minimum(kx, scx))
    ky = jnp.where(dy > 0, jnp.maximum(ky, scy), jnp.minimum(ky, scy))
    kz = jnp.where(dz > 0, jnp.maximum(kz, scz), jnp.minimum(kz, scz))
    skip_inside = (
        (kx >= 0) & (kx < X) & (ky >= 0) & (ky < Y) & (kz >= 0) & (kz < Z)
    )
    skip_out = ~skip_inside | (t_skip > tmax_v)
    can_skip = (
        mask & cert
        & ((kx != scx) | (ky != scy) | (kz != scz))
    )
    # entry t into the landing cell: max over axes of the cell's entry
    # planes, each computed with the DDA crossing's exact expression
    # ((plane - o) * inv with plane an exact small float) so the value
    # is bit-identical to the crossing the exhaustive march computes
    tlx = jnp.where(bigx, -_BIG, (kx.astype(f32) + (dx <= 0) - ox) * ix)
    tly = jnp.where(bigy, -_BIG, (ky.astype(f32) + (dy <= 0) - oy) * iy)
    tlz = jnp.where(bigz, -_BIG, (kz.astype(f32) + (dz <= 0) - oz) * iz)
    t_land = jnp.maximum(jnp.maximum(tlx, tly), tlz)
    return kx, ky, kz, skip_inside, skip_out, can_skip, t_land


def step_consts(dx, dy, dz):
    """Per-axis march-loop invariants, hoisted out of the step body
    (cfg.pallas_march_opt): the (d > 0) plane offsets as f32, the step
    signs as i32, and the ENTERING-face codes (axis*2 + (sgn < 0)) per
    axis. In the single-bounce kernel these are true loop invariants; the
    path kernel carries them per lane and refreshes them at retire (the
    direction changes only there). 9 values, all (8,128)."""
    f32 = jnp.float32
    i32 = jnp.int32
    px = (dx > 0).astype(f32)
    py = (dy > 0).astype(f32)
    pz = (dz > 0).astype(f32)
    sx = jnp.where(dx > 0, 1, -1).astype(i32)
    sy = jnp.where(dy > 0, 1, -1).astype(i32)
    sz = jnp.where(dz > 0, 1, -1).astype(i32)
    fex = jnp.where(dx > 0, 0, 1).astype(i32)
    fey = jnp.where(dy > 0, 2, 3).astype(i32)
    fez = jnp.where(dz > 0, 4, 5).astype(i32)
    return (px, py, pz, sx, sy, sz, fex, fey, fez)


def exact_step(scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz,
               bigx, bigy, bigz, dims, consts=None):
    """One exact DDA cell step (dda_proc._body formulas). Returns
    (t_next, axis_or_face, sgn, ex_, ey_, ez_, inside_exact, ax_x, ax_y).

    consts (cfg.pallas_march_opt): the step_consts tuple — the per-axis
    compares and the axis*2+parity face arithmetic collapse into selects
    of precomputed values, and the second slot of the return becomes the
    ENTERING-face code (axis*2 + (sgn < 0)) instead of the axis index
    (the callers only ever used axis to build that code; the exiting code
    is its xor with 1). All returned values are bit-identical to the
    consts=None forms (tests/test_march_opt.py)."""
    f32 = jnp.float32
    i32 = jnp.int32
    X, Y, Z = dims
    fx, fy, fz = scx.astype(f32), scy.astype(f32), scz.astype(f32)
    if consts is not None:
        px, py, pz, sx, sy, sz, fex, fey, fez = consts
        tax = jnp.where(bigx, _BIG, (fx + px - ox) * ix)
        tay = jnp.where(bigy, _BIG, (fy + py - oy) * iy)
        taz = jnp.where(bigz, _BIG, (fz + pz - oz) * iz)
        t_next = jnp.minimum(jnp.minimum(tax, tay), taz)
        ax_x = t_next == tax
        ax_y = (~ax_x) & (t_next == tay)
        face_ent = jnp.where(ax_x, fex, jnp.where(ax_y, fey, fez))
        sgn = jnp.where(ax_x, sx, jnp.where(ax_y, sy, sz))
        ex_ = scx + jnp.where(ax_x, sgn, 0)
        ey_ = scy + jnp.where(ax_y, sgn, 0)
        ez_ = scz + jnp.where(ax_x | ax_y, 0, sgn)
        inside_exact = (
            (ex_ >= 0) & (ex_ < X) & (ey_ >= 0) & (ey_ < Y)
            & (ez_ >= 0) & (ez_ < Z)
        )
        return t_next, face_ent, sgn, ex_, ey_, ez_, inside_exact, ax_x, ax_y
    tax = jnp.where(bigx, _BIG, (fx + (dx > 0) - ox) * ix)
    tay = jnp.where(bigy, _BIG, (fy + (dy > 0) - oy) * iy)
    taz = jnp.where(bigz, _BIG, (fz + (dz > 0) - oz) * iz)
    t_next = jnp.minimum(jnp.minimum(tax, tay), taz)
    ax_x = t_next == tax
    ax_y = (~ax_x) & (t_next == tay)
    axis = jnp.where(ax_x, 0, jnp.where(ax_y, 1, 2))
    d_axis = jnp.where(ax_x, dx, jnp.where(ax_y, dy, dz))
    sgn = jnp.where(d_axis > 0, 1, -1).astype(i32)
    ex_ = scx + jnp.where(ax_x, sgn, 0)
    ey_ = scy + jnp.where(ax_y, sgn, 0)
    ez_ = scz + jnp.where(ax_x | ax_y, 0, sgn)
    inside_exact = (
        (ex_ >= 0) & (ex_ < X) & (ey_ >= 0) & (ey_ < Y) & (ez_ >= 0) & (ez_ < Z)
    )
    return t_next, axis, sgn, ex_, ey_, ez_, inside_exact, ax_x, ax_y


def _trace_kernel(
    *refs, ps, t_min, t_max, unroll=1, coarse=None, max_steps_cap=0,
    has_tcap=False, opt=False,
):
    f32 = jnp.float32
    i32 = jnp.int32
    X, Y, Z = ps.shape
    gox, goy, goz = ps.origin
    thr = f32(ps.threshold)
    inv_scale = f32(1.0 / ps.noise_scale)
    inv_falloff = f32(1.0 / ps.y_falloff)
    seed_mix = _seed_mix(ps.seed)
    E = ps.n_edits

    gate = E > EDIT_GATE_MIN and getattr(ps, "edit_gate_mode", "boxes") != "off"
    if E and gate:
        (ek_ref, ef_ref, ebox_ref, ox_ref, oy_ref, oz_ref,
         dx_ref, dy_ref, dz_ref, *rest) = refs
        edits = _edit_overrides(ek_ref, ef_ref, E)
    elif E:
        (ek_ref, ef_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         *rest) = refs
        edits = _edit_overrides(ek_ref, ef_ref, E)
    else:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, *rest) = refs
    if has_tcap:
        # per-lane t ceiling (shadow rays: the march past the light point
        # cannot change visibility — see render/megakernel.py's vis rule)
        tcap_ref, t_ref, packed_ref = rest
    else:
        t_ref, packed_ref = rest

    # upward-exit certificate bound (ProcStatic.y_air): every cell with
    # Compiled out when the bound is at/above the grid top (solid-capable
    # everywhere — true for the reference worldgen's shallow y_falloff at
    # ground-level windows): the cert could never fire there and edits
    # only raise the bound. See derive_y_cut.
    y_cut = derive_y_cut(ps, edits if E else None, E)

    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    tmax_v = jnp.minimum(f32(t_max), tcap_ref[:]) if has_tcap else f32(t_max)

    tiny = f32(1e-12)
    bigx = jnp.abs(dx) < tiny
    bigy = jnp.abs(dy) < tiny
    bigz = jnp.abs(dz) < tiny
    ix = 1.0 / jnp.where(bigx, tiny, dx)
    iy = 1.0 / jnp.where(bigy, tiny, dy)
    iz = 1.0 / jnp.where(bigz, tiny, dz)
    # hoisted per-axis step invariants (cfg.pallas_march_opt): directions
    # never change in this kernel, so the per-step compares/face math
    # collapse to selects of these
    consts = step_consts(dx, dy, dz) if opt else None

    def solid_tl_at(cx, cy, cz, inside, use_edits=True):
        """(solid, translucent) at candidate cells — dda_proc._make_occupancy
        + _make_translucency semantics (translucent == ~solid absent edits;
        glass-style edits may be solid AND translucent).

        use_edits=False compiles the pure-worldgen form — legal only when
        the caller proves no edit cell is reachable (the per-chunk edit
        gate; results are then bit-identical to the edited form)."""
        wx = cx.astype(f32) + gox
        wy = cy.astype(f32) + goy
        wz = cz.astype(f32) + goz
        dens = (
            _simplex3_seeded(wx * inv_scale, wy * inv_scale, wz * inv_scale,
                             seed_mix, opt=opt)
            - wy * inv_falloff
        )
        s = dens > thr
        if E and use_edits:
            s, edited_b, tl_i = _apply_edits(cx, cy, cz, s, edits,
                                             cmp=ps.edit_cmp)
        s = s & inside
        t = ~s
        if E and use_edits:
            t = (edited_b & (tl_i != 0)) | (~edited_b & t)
        return s, t

    # ---- init: slab clip + boundary-entry hit (dda_proc._init formulas) ----
    tnx, tfx = slab_clip(ox, ix, bigx, f32(X))
    tny, tfy = slab_clip(oy, iy, bigy, f32(Y))
    tnz, tfz = slab_clip(oz, iz, bigz, f32(Z))
    t_enter = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    t_exit = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    enter_is_x = t_enter == tnx
    enter_is_y = (~enter_is_x) & (t_enter == tny)
    enter_axis = jnp.where(enter_is_x, 0, jnp.where(enter_is_y, 1, 2))
    d_enter = jnp.where(enter_is_x, dx, jnp.where(enter_is_y, dy, dz))

    t0 = jnp.maximum(t_enter, f32(t_min))
    degenerate = bigx & bigy & bigz
    valid = (t0 <= t_exit) & (t0 <= tmax_v) & ~degenerate

    cx = jnp.clip(jnp.floor(ox + t0 * dx).astype(i32), 0, X - 1)
    cy = jnp.clip(jnp.floor(oy + t0 * dy).astype(i32), 0, Y - 1)
    cz = jnp.clip(jnp.floor(oz + t0 * dz).astype(i32), 0, Z - 1)
    cur_solid, cur_tl = solid_tl_at(cx, cy, cz, valid)

    starts_outside = t_enter > f32(t_min)
    entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
    hit0 = valid & starts_outside & cur_solid & (t_enter >= f32(t_min)) & (
        t_enter <= tmax_v
    )

    zero = jnp.zeros_like(cx)
    # Mosaic cannot carry vector<i1> through scf.while (scf.yield fails to
    # legalize) — every boolean loop-carry travels as an i32 0/1 mask and
    # is re-derived with != 0 inside the body. cur_tl is carried only on
    # edited worlds (index 13); absent edits translucent == ~solid.
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
    ) + ((cur_tl.astype(i32),) if E else ())
    max_steps = int(X + Y + Z + 3)
    if max_steps_cap:
        max_steps = min(max_steps, int(max_steps_cap))  # probe-only

    def cond(s):
        return (jnp.max(s[0]) > 0) & (s[12] < max_steps)

    def body(s, use_edits=True):
        (alive_i, scx, scy, scz, cur_solid_i, hit_i, t, face, hx, hy, hz,
         entering_i, steps) = s[:13]
        alive = alive_i != 0
        cur_solid = cur_solid_i != 0
        cur_tl = (s[13] != 0) if E else ~cur_solid
        hit = hit_i != 0
        entering = entering_i != 0

        if coarse is not None:
            kx, ky, kz, skip_inside, skip_out, can_skip, _ = coarse_skip(
                coarse, alive, scx, scy, scz, ox, oy, oz, dx, dy, dz,
                ix, iy, iz, bigx, bigy, bigz, (X, Y, Z), tmax_v,
            )
        else:
            kx = ky = kz = scx  # unused
            skip_inside = skip_out = jnp.zeros_like(alive)
            can_skip = jnp.zeros_like(alive)

        (t_next, axis, sgn, ex_, ey_, ez_, inside_exact,
         ax_x, ax_y) = exact_step(
            scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz,
            bigx, bigy, bigz, (X, Y, Z), consts=consts,
        )

        nx = jnp.where(can_skip, kx, ex_)
        ny = jnp.where(can_skip, ky, ey_)
        nz = jnp.where(can_skip, kz, ez_)
        inside = (can_skip & skip_inside) | (~can_skip & inside_exact)
        new_solid, new_tl = solid_tl_at(nx, ny, nz, inside, use_edits)

        entering_hit = new_solid & cur_tl & ~can_skip
        exiting_hit = cur_solid & new_tl & ~can_skip
        in_range = (t_next >= f32(t_min)) & (t_next <= tmax_v)
        any_hit = alive & in_range & (entering_hit | exiting_hit)
        if opt:
            # `axis` IS the entering-face code here (exact_step consts
            # form); the exiting code is the same axis, opposite parity
            nface = jnp.where(entering_hit, axis, axis ^ 1).astype(i32)
        else:
            nface = jnp.where(
                entering_hit,
                axis * 2 + jnp.where(sgn > 0, 0, 1),
                axis * 2 + jnp.where(sgn > 0, 1, 0),
            ).astype(i32)

        rec = any_hit & ~hit
        dead_exact = ~inside_exact | (t_next > tmax_v)
        dead = (can_skip & skip_out) | (~can_skip & dead_exact)
        if y_cut is not None:
            # in air, moving up (cy non-decreasing), at/above the all-air
            # bound: no hit can follow -> retire as a miss now (records
            # stay zero, identical to marching to the grid exit)
            dead = dead | (~cur_solid & (dy >= 0.0) & (scy >= y_cut))
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
        ) + ((new_tl.astype(i32),) if E else ())

    step_fn = body
    k_steps = max(1, unroll)

    def _chunk(s, use_edits):
        # compose the body: k cell-steps per loop iteration. Bit-identical
        # (same visit order; finished rays are masked no-ops) — trades
        # loop-control overhead for at most k-1 wasted masked steps
        for _ in range(k_steps):
            s = step_fn(s, use_edits)
        return s

    if gate:
        # per-chunk edit gate (E > EDIT_GATE_MIN): a chunk tests cells at
        # most k_steps from its start cells (coarse skips are never baked
        # for edited worlds), so when no lane is within k_steps + 1 of
        # any edit-cluster box the edit-free chunk is bit-identical — the
        # O(E) per-step compare is paid only near the edits
        # (tests/test_edit_gate.py)
        assert coarse is None, "edit gate assumes no baked coarse skips"
        near_fn = _make_near(ebox_ref, k_steps)

        def body(s):
            return jax.lax.cond(
                near_fn(s[1], s[2], s[3], s[0] != 0),
                lambda ss: _chunk(ss, True),
                lambda ss: _chunk(ss, False),
                s,
            )
    else:
        def body(s):
            return _chunk(s, True)

    s = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, hit_i, t, face, hx, hy, hz, entering_i, _) = s[:13]
    t_ref[:] = t
    packed_ref[:] = (
        hit_i
        | (entering_i << 1)
        | (face << 2)
        | (hx << 5)
        | (hy << 14)
        | (hz << 23)
    )


# above this many edit rows the kernels gate the per-step edit compare
# behind a per-chunk block-level lax.cond on "any lane within reach of
# an edit-cluster box" — O(E) per step only in chunks near the edits
EDIT_GATE_MIN = 8


def _make_near(ebox_ref, k_steps):
    """Per-chunk edit-gate predicate: any lane within chunk reach
    (k_steps + 1 cells) of any edit-cluster box.

    ebox_ref: SMEM (C*6,) i32 — per-coarse-block tight boxes of the edit
    set ([xmin,xmax,ymin,ymax,zmin,zmax] each; pad rows lo > hi never
    match). Box scalars are read ONCE (loop-invariant), pre-inflated by
    the margin; the per-chunk cost is C boxes x ~11 vector compare/and
    ops + one any() reduce. Sound because a chunk's tested cells lie
    within k_steps of its start cells (no coarse skips under edits) and
    dead-lane drift only widens the lane set (conservative)."""
    m = int(k_steps) + 1
    C = ebox_ref.shape[0] // 6
    boxes = []
    for c in range(C):
        boxes.append((
            ebox_ref[c * 6 + 0] - m, ebox_ref[c * 6 + 1] + m,
            ebox_ref[c * 6 + 2] - m, ebox_ref[c * 6 + 3] + m,
            ebox_ref[c * 6 + 4] - m, ebox_ref[c * 6 + 5] + m,
        ))

    def near(scx, scy, scz, active=None):
        # `active` masks out resolved/dead lanes: their cells DRIFT
        # (march_opt level 2 drops the freeze selects), and an unmasked
        # test let drifting cells wander through the edit boxes until
        # nearly every chunk gated ON (the round-5 gate hunt measured
        # the unmasked gate NET-NEGATIVE vs dense compares)
        nearv = jnp.zeros(scx.shape, bool)
        for x0, x1, y0, y1, z0, z1 in boxes:
            nearv = nearv | (
                (scx >= x0) & (scx <= x1)
                & (scy >= y0) & (scy <= y1)
                & (scz >= z0) & (scz <= z1)
            )
        if active is not None:
            nearv = nearv & active
        return jnp.max(nearv.astype(jnp.int32)) > 0

    return near


def edit_smem_args(ps, pd):
    """(edit_key, edit_flags[, edit_aabb]) SMEM arrays for a kernel call,
    or () when the world is edit-free. Key packing must match
    _apply_edits. The AABB row [xmin,xmax,ymin,ymax,zmin,zmax] ships only
    for E > EDIT_GATE_MIN (the per-chunk edit gate)."""
    if not ps.n_edits:
        return ()
    if not pd or pd.get("edit_cells") is None:
        raise ValueError("ProcStatic.n_edits > 0 requires pd edit arrays")
    ec = pd["edit_cells"].astype(jnp.int32)            # (E, 3); pad rows < 0
    valid = ec[:, 0] >= 0
    key = (ec[:, 0] << 20) | (ec[:, 1] << 10) | ec[:, 2]
    ekey = jnp.where(valid, key, jnp.int32(0x3FFFFFFF))
    eflg = (
        pd["edit_solid"].astype(jnp.int32)
        | (pd["edit_translucent"].astype(jnp.int32) << 1)
        # block id at bits 2-9: the path kernel's retire reads it for the
        # hit material (in-kernel radiance t_mat + the edited-cell
        # constant-material scatter); the march itself only reads bits 0-1
        | (pd["edit_blocks"].astype(jnp.int32) << 2)
    )
    if (ps.n_edits <= EDIT_GATE_MIN
            or getattr(ps, "edit_gate_mode", "boxes") == "off"):
        return (ekey, eflg)
    if (pd.get("edit_cboxes") is not None
            and getattr(ps, "edit_gate_mode", "boxes") == "boxes"):
        # per-coarse-block tight boxes (render/scene._proc_finalize):
        # the gate tests lanes against each box, so chunks near ONE part
        # of the world's bounding extent but far from every actual edit
        # cluster stay on the edit-free body
        return (ekey, eflg, pd["edit_cboxes"].astype(jnp.int32).reshape(-1))
    # fallback (hand-built pd without boxes): one global AABB
    big = jnp.int32(1 << 20)
    lo = jnp.where(valid[:, None], ec, big)
    hi = jnp.where(valid[:, None], ec, -big)
    ebox = jnp.stack([
        lo[:, 0].min(), hi[:, 0].max(),
        lo[:, 1].min(), hi[:, 1].max(),
        lo[:, 2].min(), hi[:, 2].max(),
    ]).astype(jnp.int32)
    return (ekey, eflg, ebox)


@functools.partial(
    jax.jit,
    static_argnames=("ps", "t_min", "t_max", "interpret", "unroll", "coarse",
                     "max_steps_cap", "block_rows", "hw", "opt"),
)
def _trace_proc_pallas_flat(ps, o, d, edit_args, t_min, t_max, interpret=False,
                            unroll=1, coarse=None, max_steps_cap=0,
                            block_rows=None, hw=None, tcap=None, opt=False):
    br = block_rows or BLOCK_ROWS
    n = o.shape[0]
    if hw is not None:
        # 2D image-tile blocking: rays arrive as (R, W) pixel rows x
        # columns (R = spp*height); each (br, LANES) pallas block is then
        # a br x 128 PIXEL TILE — spatially local, so a block's rays share
        # march length and the per-block early exit fires together. The
        # flat 1D packing instead gives each block 1024 consecutive
        # row-major pixels = a strip spanning the whole image width
        # (sky and mountain in one block -> worst-ray divergence).
        R, Wd = hw
        rows_pad = (R + br - 1) // br * br
        lanes_pad = (Wd + LANES - 1) // LANES * LANES

        def prep(x):
            # padding rays get d = 0 -> degenerate -> never marched
            return jnp.pad(
                x.reshape(R, Wd), ((0, rows_pad - R), (0, lanes_pad - Wd))
            )

        grid = (rows_pad // br, lanes_pad // LANES)
        spec = pl.BlockSpec((br, LANES), lambda i, j: (i, j))
        out_shape = (rows_pad, lanes_pad)

        def post(x):
            return x[:R, :Wd].reshape(-1)
    else:
        rows = (n + LANES - 1) // LANES
        rows_pad = (rows + br - 1) // br * br
        n_pad = rows_pad * LANES

        def prep(x):
            return jnp.pad(x, (0, n_pad - n)).reshape(rows_pad, LANES)

        grid = (rows_pad // br,)
        spec = pl.BlockSpec((br, LANES), lambda i: (i, 0))
        out_shape = (rows_pad, LANES)

        def post(x):
            return x.reshape(-1)[:n]

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    tcap_args = () if tcap is None else (prep(tcap),)

    # the padded edit list rides in SMEM: two (E,) i32 arrays, read once
    # per kernel as loop-invariant scalars (see _edit_overrides)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    t, packed = pl.pallas_call(
        functools.partial(
            _trace_kernel, ps=ps, t_min=t_min, t_max=t_max, unroll=unroll,
            coarse=coarse, max_steps_cap=max_steps_cap,
            has_tcap=tcap is not None, opt=opt,
        ),
        grid=grid,
        in_specs=[smem] * len(edit_args) + [spec] * (6 + len(tcap_args)),
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
        ],
        interpret=interpret,
    )(*edit_args, ox, oy, oz, dx, dy, dz, *tcap_args)
    return post(t), post(packed)


def trace_proc_pallas(ps, origin, direction, t_min=0.001, t_max=1000.0,
                      pd=None, interpret=False, unroll=None, max_steps_cap=0,
                      block_rows=None, hw=None, tcap=None, march_opt=True):
    """Same contract as dda_proc.trace_proc (incl. the padded edit list).

    hw=(R, W): optional pixel-grid shape of the flattened ray batch
    (R = rows = spp*height, W = image width); enables 2D image-tile
    blocking (see _trace_proc_pallas_flat). Results are identical either
    way — only the block->ray assignment changes.

    tcap: optional (n,) per-lane t ceiling (effective t_max =
    min(t_max, tcap[i])). Shadow rays pass their light distance: marching
    past the light point cannot change the visibility verdict, and
    unoccluded shadow rays otherwise march to the grid exit.
    """
    from vrv_tpu.ops.dda import TraceResult
    from vrv_tpu.ops.dda_proc import _hit_blocks, assemble

    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    if hw is not None and hw[0] * hw[1] != o.shape[0]:
        raise ValueError(f"hw {hw} does not tile {o.shape[0]} rays")
    import vrv_tpu.ops.pallas.trace_proc as _self

    t, packed = _trace_proc_pallas_flat(ps, o, d, edit_smem_args(ps, pd),
                                        float(t_min), float(t_max),
                                        interpret=interpret or _self.INTERPRET,
                                        unroll=UNROLL if unroll is None else unroll,
                                        coarse=(ps.coarse_const or None)
                                        if ps.use_coarse else None,
                                        max_steps_cap=max_steps_cap,
                                        block_rows=block_rows, hw=hw,
                                        tcap=None if tcap is None
                                        else tcap.reshape(-1).astype(jnp.float32),
                                        opt=bool(march_opt))
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
