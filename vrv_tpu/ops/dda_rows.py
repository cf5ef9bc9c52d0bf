"""Row-fetching DDA tracer: 32 z-cells per gather.

tools/probe_tpu.py measured TPU random access at ~8 ns per gather *row*
regardless of row width (a 128-byte row costs the same as 1 byte), while
vector ALU is effectively free. This tracer exploits that: the world is
packed as rows of 32 consecutive z-cells (int32 words carrying block id,
translucent/renders flags, and chebyshev skip distance), and each DDA
iteration

  1. skip-jumps across empty space when the current cell's distance
     value allows (as ops/dda.trace_skip), else
  2. scans ALL z-boundary crossings inside the fetched row up to the
     next x/y boundary with dense lane math (one masked argmin over 32
     lanes replaces up to 31 sequential gather steps), then
  3. takes the earliest remaining crossing (x/y or row edge) as a
     single exact step,

so one gather serves an entire column span instead of one cell. Hit
semantics are identical to ops/dda.trace (oracle-tested byte-equality in
tests/test_dda_rows.py).

Requires grid Z % 32 == 0 (the framework's chunk size, chunk.rs:15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vrv_tpu.ops.dda import TraceResult, _BIG

W = 8  # default cells per row (power of two; W=8 measured fastest on v5e)


def pack_rows(
    grid: jax.Array, dist: jax.Array, translucent: jax.Array, w: int = W
) -> jax.Array:
    """(X,Y,Z) world -> (X*Y*Z/w, w) int32 row table.

    Word layout: block<<16 | translucent<<9 | renders<<8 | dist.
    """
    X, Y, Z = grid.shape
    assert Z % w == 0, f"Z={Z} must be a multiple of {w}"
    air = translucent.shape[0] - 1
    tl_i = translucent.astype(jnp.int32)
    comb = (
        (grid.astype(jnp.int32) << 16)
        | (jnp.take(tl_i, grid.astype(jnp.int32)) << 9)
        | ((grid != jnp.uint8(air)).astype(jnp.int32) << 8)
        | dist.astype(jnp.int32)
    )
    return comb.reshape(X * Y * (Z // w), w)


def trace_rows(
    grid_shape,
    rows: jax.Array,
    n_blocks: int,
    origin: jax.Array,
    direction: jax.Array,
    t_min: float = 0.001,
    t_max: float = 1000.0,
    _tail: bool = False,
    row_offset=None,
) -> TraceResult:
    """Trace rays against a packed row table (see pack_rows).

    Large batches use compaction-by-restart: after TRACE_COMPACT_K
    full-width iterations the few still-marching rays are gathered to a
    bounded prefix and RE-TRACED from scratch at narrow width — the trace
    is deterministic in (o, d), so the retraced result is identical and no
    mid-flight state needs to survive the compaction (the redone early
    steps cost ~nothing at tail width).
    """
    X, Y, Z = grid_shape
    W = rows.shape[1]  # row width (shadows the module default)
    W_SHIFT = W.bit_length() - 1
    assert 1 << W_SHIFT == W, "row width must be a power of two"
    air = n_blocks - 1
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    n = o.shape[0]
    f32, i32 = jnp.float32, jnp.int32

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    outside_word = jnp.int32((air << 16) | (1 << 9) | 255)
    n_z_rows = Z // W

    def fetch_row(cx, cy, cz, inside):
        fx = jnp.clip(cx, 0, X - 1)
        fy = jnp.clip(cy, 0, Y - 1)
        fz = jnp.clip(cz, 0, Z - 1)
        ridx = (fx * Y + fy) * n_z_rows + (fz >> W_SHIFT)
        if row_offset is not None:
            ridx = ridx + row_offset
        row = jnp.take(rows, ridx, axis=0)                      # (n, W)
        return jnp.where(inside[:, None], row, outside_word)

    def select_lane(row, lane):
        # dense 32-way select (lane in [0, W))
        oh = lane[:, None] == jnp.arange(W, dtype=i32)[None, :]
        return jnp.where(oh, row, 0).sum(-1)

    tiny = 1e-12
    bigx = jnp.abs(dx) < tiny
    bigy = jnp.abs(dy) < tiny
    bigz = jnp.abs(dz) < tiny
    ix = 1.0 / jnp.where(bigx, f32(tiny), dx)
    iy = 1.0 / jnp.where(bigy, f32(tiny), dy)
    iz = 1.0 / jnp.where(bigz, f32(tiny), dz)

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
    valid = (t0 <= t_exit) & (t0 <= t_max) & ~(bigx & bigy & bigz)

    cx = jnp.clip(jnp.floor(ox + t0 * dx).astype(i32), 0, X - 1)
    cy = jnp.clip(jnp.floor(oy + t0 * dy).astype(i32), 0, Y - 1)
    cz = jnp.clip(jnp.floor(oz + t0 * dz).astype(i32), 0, Z - 1)
    row = fetch_row(cx, cy, cz, valid)
    comb = select_lane(row, cz & (W - 1))
    cur_renders = (comb >> 8) & 1

    starts_outside = t_enter > t_min
    entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
    hit0 = (
        valid & starts_outside & (cur_renders == 1)
        & (t_enter >= t_min) & (t_enter <= t_max)
    )

    state = dict(
        alive=valid & ~hit0,
        cx=cx, cy=cy, cz=cz,
        comb=comb,
        row=row,
        hit=hit0,
        t=jnp.where(hit0, t_enter, f32(0.0)),
        block=jnp.where(hit0, (comb >> 16).astype(jnp.uint8), jnp.uint8(air)),
        face=jnp.where(hit0, entry_face.astype(i32), 0),
        hx=jnp.where(hit0, cx, 0),
        hy=jnp.where(hit0, cy, 0),
        hz=jnp.where(hit0, cz, 0),
        entering=hit0,
        steps=jnp.int32(0),
    )

    # every iteration advances >= 1 cell along the path (skip jumps may be
    # single-cell), so the exact tracer's bound applies; the loop exits as
    # soon as all rays resolve
    max_steps = int(X + Y + Z + 3)

    lanes = jnp.arange(W, dtype=i32)[None, :]                     # (1, W)

    def cond(s):
        return (s["steps"] < max_steps) & s["alive"].any()

    def body(s):
        scx, scy, scz = s["cx"], s["cy"], s["cz"]
        comb = s["comb"]
        row = s["row"]
        cur_tl = (comb >> 9) & 1
        cur_rd = (comb >> 8) & 1
        v = comb & 255
        fx, fy, fz = scx.astype(f32), scy.astype(f32), scz.astype(f32)

        can_skip = s["alive"] & (v >= 3)
        r = (v - 2).astype(f32)

        # ---- skip branch ----
        tbx = jnp.where(bigx, _BIG, jnp.where(dx > 0, (fx + 1.0 + r - ox) * ix, (fx - r - ox) * ix))
        tby = jnp.where(bigy, _BIG, jnp.where(dy > 0, (fy + 1.0 + r - oy) * iy, (fy - r - oy) * iy))
        tbz = jnp.where(bigz, _BIG, jnp.where(dz > 0, (fz + 1.0 + r - oz) * iz, (fz - r - oz) * iz))
        t_skip = jnp.minimum(jnp.minimum(tbx, tby), tbz) + 1e-4
        kx = jnp.floor(ox + t_skip * dx).astype(i32)
        ky = jnp.floor(oy + t_skip * dy).astype(i32)
        kz = jnp.floor(oz + t_skip * dz).astype(i32)
        skip_inside = (
            (kx >= 0) & (kx < X) & (ky >= 0) & (ky < Y) & (kz >= 0) & (kz < Z)
        )
        skip_out = ~skip_inside | (t_skip > t_max)

        # ---- in-row z scan (only when not skipping) ----
        base = scz & ~(W - 1)
        j = scz - base                                            # lane of cur cell
        rd = (row >> 8) & 1                                       # (n, W)
        tl = (row >> 9) & 1
        up = dz > 0

        # boundary at lane k: crossing k -> k+1 (up) or k -> k-1 (down)
        rd_up = jnp.concatenate([rd[:, 1:], jnp.zeros((n, 1), i32)], axis=1)
        tl_up = jnp.concatenate([tl[:, 1:], jnp.ones((n, 1), i32)], axis=1)
        rd_dn = jnp.concatenate([jnp.zeros((n, 1), i32), rd[:, :-1]], axis=1)
        tl_dn = jnp.concatenate([jnp.ones((n, 1), i32), tl[:, :-1]], axis=1)
        nb_rd = jnp.where(up[:, None], rd_up, rd_dn)
        nb_tl = jnp.where(up[:, None], tl_up, tl_dn)
        hit_b = ((nb_rd == 1) & (tl == 1)) | ((rd == 1) & (nb_tl == 1))  # (n, W)

        # t of boundary at lane k
        plane = base[:, None].astype(f32) + jnp.where(
            up[:, None], lanes.astype(f32) + 1.0, lanes.astype(f32)
        )
        t_k = (plane - oz[:, None]) * iz[:, None]                 # (n, W)

        # next x/y boundary from the current cell
        tax = jnp.where(bigx, _BIG, (fx + (dx > 0) - ox) * ix)
        tay = jnp.where(bigy, _BIG, (fy + (dy > 0) - oy) * iy)
        t_xy = jnp.minimum(tax, tay)

        lane_valid = jnp.where(
            up[:, None],
            (lanes >= j[:, None]) & (lanes <= W - 2),
            (lanes <= j[:, None]) & (lanes >= 1),
        )
        mask = (
            lane_valid
            & hit_b.astype(bool)
            & (t_k >= t_min)
            & (t_k < t_xy[:, None])     # x/y (and ties) win, matching exact DDA
            & (t_k <= t_max)
            & ~bigz[:, None]
        )
        any_z_hit = s["alive"] & ~can_skip & mask.any(-1)
        # first boundary along travel: min lane when up, max lane when down
        lane_score = jnp.where(mask, lanes, jnp.where(up[:, None], W, -1))
        k_up = lane_score.min(-1)
        lane_score2 = jnp.where(mask, lanes, -1)
        k_dn = lane_score2.max(-1)
        k_hit = jnp.where(up, k_up, k_dn).astype(i32)
        k_safe = jnp.clip(k_hit, 0, W - 1)

        comb_cur_k = select_lane(row, k_safe)
        nb_lane = jnp.clip(k_safe + jnp.where(up, 1, -1), 0, W - 1)
        comb_nb_k = select_lane(row, nb_lane)
        z_enter_hit = (((comb_nb_k >> 8) & 1) == 1) & (((comb_cur_k >> 9) & 1) == 1)
        t_z = select_lane(
            jax.lax.bitcast_convert_type(t_k, jnp.int32), k_safe
        )
        t_z = jax.lax.bitcast_convert_type(t_z, jnp.float32)
        face_z = jnp.where(up, jnp.where(z_enter_hit, 4, 5), jnp.where(z_enter_hit, 5, 4))
        block_z = jnp.where(z_enter_hit, comb_nb_k >> 16, comb_cur_k >> 16)
        hz_z = base + jnp.where(z_enter_hit, nb_lane, k_safe)

        # ---- edge/x-y exact step (when no in-row hit and not skipping) ----
        # earliest of: x/y boundary, z row-edge boundary. The ray may have
        # crossed non-hit z boundaries within the row before this step, so
        # its *current* z-cell at crossing time is floor(z(t_next)) — flags
        # along a hit-free span are provably constant (any flag change is a
        # hit boundary) but the block id inside a solid run can change, so
        # the step re-selects the lane at the crossing.
        t_edge = jnp.where(
            bigz, _BIG,
            (jnp.where(up, base.astype(f32) + W, base.astype(f32)) - oz) * iz,
        )
        step_is_xy = t_xy <= t_edge
        ax_x = step_is_xy & (tax <= tay)
        ax_y = step_is_xy & ~ax_x
        t_next = jnp.where(step_is_xy, t_xy, t_edge)
        sgn_x = jnp.where(dx > 0, 1, -1).astype(i32)
        sgn_y = jnp.where(dy > 0, 1, -1).astype(i32)
        sgn_z = jnp.where(up, 1, -1).astype(i32)
        z_cur_step = jnp.where(
            step_is_xy,
            jnp.clip(
                jnp.floor(oz + t_next * dz).astype(i32), base, base + W - 1
            ),
            jnp.where(up, base + W - 1, base),
        )
        comb_step = select_lane(row, z_cur_step & (W - 1))
        step_tl = (comb_step >> 9) & 1
        step_rd = (comb_step >> 8) & 1
        ex = scx + jnp.where(ax_x, sgn_x, 0)
        ey = scy + jnp.where(ax_y, sgn_y, 0)
        ez = jnp.where(
            step_is_xy, z_cur_step, jnp.where(up, base + W, base - 1)
        )
        axis = jnp.where(ax_x, 0, jnp.where(ax_y, 1, 2))
        sgn = jnp.where(ax_x, sgn_x, jnp.where(ax_y, sgn_y, sgn_z))
        inside_exact = (
            (ex >= 0) & (ex < X) & (ey >= 0) & (ey < Y) & (ez >= 0) & (ez < Z)
        )

        # ---- combine: choose the next cell for the single fetch ----
        take_step = s["alive"] & ~can_skip & ~any_z_hit
        nx = jnp.where(can_skip, kx, jnp.where(any_z_hit, scx, ex))
        ny = jnp.where(can_skip, ky, jnp.where(any_z_hit, scy, ey))
        nz = jnp.where(can_skip, kz, jnp.where(any_z_hit, scz, ez))
        inside = jnp.where(can_skip, skip_inside, inside_exact | any_z_hit)
        new_row = fetch_row(nx, ny, nz, inside)
        new_comb = select_lane(new_row, jnp.clip(nz, 0, Z - 1) & (W - 1))
        new_tl = (new_comb >> 9) & 1
        new_rd = (new_comb >> 8) & 1

        entering_hit = (new_rd == 1) & (step_tl == 1) & take_step
        exiting_hit = (step_rd == 1) & (new_tl == 1) & take_step
        in_range = (t_next >= t_min) & (t_next <= t_max)
        step_hit = take_step & in_range & (entering_hit | exiting_hit)

        face_pos = axis * 2 + jnp.where(sgn > 0, 0, 1)
        face_neg = axis * 2 + jnp.where(sgn > 0, 1, 0)

        any_hit = any_z_hit | step_hit
        rec = any_hit & ~s["hit"]
        face = jnp.where(
            any_z_hit, face_z, jnp.where(entering_hit, face_pos, face_neg)
        ).astype(i32)
        hblock = jnp.where(
            any_z_hit, block_z,
            jnp.where(entering_hit, new_comb >> 16, comb_step >> 16),
        ).astype(jnp.uint8)
        t_rec = jnp.where(any_z_hit, t_z, t_next)
        hx = jnp.where(any_z_hit, scx, jnp.where(entering_hit, nx, scx))
        hy = jnp.where(any_z_hit, scy, jnp.where(entering_hit, ny, scy))
        hz = jnp.where(
            any_z_hit, hz_z, jnp.where(entering_hit, nz, z_cur_step)
        )
        entering_rec = jnp.where(any_z_hit, z_enter_hit, entering_hit)

        dead_step = take_step & (~inside_exact | (t_next > t_max))
        dead = jnp.where(can_skip, skip_out, dead_step)
        alive = s["alive"] & ~any_hit & ~dead
        return dict(
            alive=alive,
            cx=nx, cy=ny, cz=nz,
            comb=new_comb,
            row=new_row,
            hit=s["hit"] | any_hit,
            t=jnp.where(rec, t_rec, s["t"]),
            block=jnp.where(rec, hblock, s["block"]),
            face=jnp.where(rec, face, s["face"]),
            hx=jnp.where(rec, hx, s["hx"]),
            hy=jnp.where(rec, hy, s["hy"]),
            hz=jnp.where(rec, hz, s["hz"]),
            entering=jnp.where(rec, entering_rec, s["entering"]),
            steps=s["steps"] + 1,
        )

    from vrv_tpu.ops import dda as _dda

    if _tail or n <= _dda.TRACE_COMPACT_CAP:
        s = jax.lax.while_loop(cond, body, state)
    else:
        cap = min(
            n, max(_dda.TRACE_COMPACT_CAP, ((n // 8 + 0xFFFF) >> 16) << 16)
        )

        thresh = max(cap, n // 6)

        def cond_p1(s):
            alive_n = s["alive"].sum()
            more = (alive_n > cap) | (
                (s["steps"] < _dda.TRACE_COMPACT_K) & (alive_n > thresh)
            )
            return (s["steps"] < max_steps) & (alive_n > 0) & more

        s = jax.lax.while_loop(cond_p1, body, state)
        key = (~s["alive"]).astype(i32)
        ids = jnp.arange(n, dtype=i32)
        _, perm = jax.lax.sort((key, ids), num_keys=1, is_stable=True)
        s_ids = perm[:cap]
        was_alive = jnp.take(s["alive"], s_ids, axis=0)
        o2 = jnp.take(o, s_ids, axis=0)
        # zero direction marks padding rays degenerate -> skipped instantly
        d2 = jnp.where(was_alive[:, None], jnp.take(d, s_ids, axis=0), 0.0)
        off2 = (
            None if row_offset is None else jnp.take(row_offset, s_ids, axis=0)
        )
        r2 = trace_rows(
            grid_shape, rows, n_blocks, o2, d2, t_min, t_max,
            _tail=True, row_offset=off2,
        )
        dest = jnp.where(was_alive, s_ids, i32(n))
        s = dict(s)
        for fname, val in (
            ("hit", r2.hit), ("t", r2.t), ("block", r2.block),
            ("face", r2.face), ("hx", r2.cell[:, 0]), ("hy", r2.cell[:, 1]),
            ("hz", r2.cell[:, 2]), ("entering", r2.entering),
        ):
            s[fname] = s[fname].at[dest].set(val, mode="drop")

    def rshape(x):
        return x.reshape(shape)

    cell = jnp.stack([s["hx"], s["hy"], s["hz"]], axis=-1).reshape(shape + (3,))
    return TraceResult(
        hit=rshape(s["hit"]),
        t=rshape(s["t"]),
        block=rshape(s["block"]),
        face=rshape(s["face"]),
        cell=cell,
        entering=rshape(s["entering"]),
    )


# ---------------------------------------------------------------------------
# Per-ray major-axis packing: three transposed row tables so every ray's
# dominant direction gets multi-cell row scans (cubic grids).
# Cyclic layouts: table 0 = x-major (Y,Z,X), table 1 = y-major (Z,X,Y),
# table 2 = z-major (X,Y,Z). A ray with dominant axis p swizzles its
# coordinates into the layout where that axis is the row axis, traces with
# a per-ray table offset, and un-swizzles the hit.
# ---------------------------------------------------------------------------


def pack_rows_3axis(
    grid: jax.Array, dist: jax.Array, translucent: jax.Array, w: int = 4
) -> jax.Array:
    """(S,S,S) world -> (3 * S^3/w, w) int32 concatenated row tables."""
    X, Y, Z = grid.shape
    assert X == Y == Z, "3-axis packing requires a cubic grid"
    comb = pack_rows(grid, dist, translucent, w).reshape(X, Y, Z)
    tables = [
        comb.transpose(1, 2, 0).reshape(-1, w),   # x-major
        comb.transpose(2, 0, 1).reshape(-1, w),   # y-major
        comb.reshape(-1, w),                      # z-major
    ]
    return jnp.concatenate(tables, axis=0)


# layout -> original axis map per permutation (cyclic swizzles)
_UNSWZ = np.array([[1, 2, 0], [2, 0, 1], [0, 1, 2]], np.int32)  # layout -> orig


def _select3(p, a, b, c):
    return jnp.where(p == 0, a, jnp.where(p == 1, b, c))


def trace_rows_major(
    grid_shape,
    rows3: jax.Array,
    n_blocks: int,
    origin: jax.Array,
    direction: jax.Array,
    t_min: float = 0.001,
    t_max: float = 1000.0,
) -> TraceResult:
    """Major-axis-packed trace (see pack_rows_3axis). Cubic grids only."""
    X, Y, Z = grid_shape
    assert X == Y == Z
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    w = rows3.shape[1]
    table_rows = (X * Y * Z) // w

    ad = jnp.abs(d)
    p = jnp.where(
        (ad[:, 0] >= ad[:, 1]) & (ad[:, 0] >= ad[:, 2]), 0,
        jnp.where(ad[:, 1] >= ad[:, 2], 1, 2),
    ).astype(jnp.int32)

    def swz(v):
        # layout coords (x', y', z') where z' is the ray's dominant axis
        vx = _select3(p, v[:, 1], v[:, 2], v[:, 0])
        vy = _select3(p, v[:, 2], v[:, 0], v[:, 1])
        vz = _select3(p, v[:, 0], v[:, 1], v[:, 2])
        return jnp.stack([vx, vy, vz], axis=-1)

    res = trace_rows(
        grid_shape, rows3, n_blocks, swz(o), swz(d), t_min, t_max,
        row_offset=(p * table_rows),
    )

    # un-swizzle cell + face axis back to original space
    flat = res.cell.reshape(-1, 3)
    cx = _select3(p, flat[:, 2], flat[:, 1], flat[:, 0])
    cy = _select3(p, flat[:, 0], flat[:, 2], flat[:, 1])
    cz = _select3(p, flat[:, 1], flat[:, 0], flat[:, 2])
    cell = jnp.stack([cx, cy, cz], axis=-1).reshape(shape + (3,))
    face_flat = res.face.reshape(-1)
    axis_l = face_flat >> 1
    sign = face_flat & 1
    axis_o = _select3(
        p,
        jnp.asarray(_UNSWZ[0])[axis_l],
        jnp.asarray(_UNSWZ[1])[axis_l],
        jnp.asarray(_UNSWZ[2])[axis_l],
    )
    face = (axis_o * 2 + sign).reshape(shape)
    return TraceResult(
        hit=res.hit, t=res.t, block=res.block, face=face, cell=cell,
        entering=res.entering,
    )


def trace_rows_auto(
    grid_shape, rows, n_blocks, origin, direction,
    t_min: float = 0.001, t_max: float = 1000.0,
) -> TraceResult:
    """Dispatch on table size: a 3x-sized table is a pack_rows_3axis table."""
    X, Y, Z = grid_shape
    if rows.shape[0] * rows.shape[1] == 3 * X * Y * Z:
        return trace_rows_major(
            grid_shape, rows, n_blocks, origin, direction, t_min, t_max
        )
    return trace_rows(grid_shape, rows, n_blocks, origin, direction, t_min, t_max)
