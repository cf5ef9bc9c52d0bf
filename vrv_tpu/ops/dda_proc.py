"""Procedural voxel tracer: a DDA with ZERO per-step memory gathers.

The performance wall of the grid tracers (ops/dda.py, ops/dda_rows.py) is
the ~8 ns/element random-access floor of TPU gathers (docs/PERF.md): every
DDA step needs the next cell's occupancy, and fetching it from the HBM
grid lowers to a scalar loop. This tracer removes the fetch entirely by
*recomputing* the world instead of reading it — legal because the world IS
a function: worldgen occupancy is `density(cell) > threshold` with
`density = simplex3(cell/scale) - y/falloff` (game/chunk.py:58-86,
reference src/game_system/chunk.rs:69-96), and ops/noise.simplex3 is
built on an arithmetic lattice hash, so one occupancy test is ~150 dense
VPU ops and no memory traffic. Compute-over-memory is the idiomatic TPU
trade; the reference instead pays for dedicated RT hardware traversing a
memory-resident BVH (pathtrace_shader.rs:652-686).

Empty-space skipping (the role of the fine distance field in trace_skip)
comes from a conservative COARSE distance table: the grid is divided into
8^3-cell blocks, dist_c[C] = 0 if block C contains any non-air cell, else
1 + chebyshev distance (in blocks) to the nearest non-empty block. A value
v >= 1 certifies the axis-aligned box of blocks within chebyshev radius
v-1 of C to be pure air, and the ray jumps to the last air cell before
leaving that box. The table is 16^3 for the 128^3 world and is read with
a one-hot matmul — (n,256)@(256,16) rides the MXU — plus a dense 16-wide
in-row select, NOT a gather.

World edits are exact: each edited cell (game set_block) is carried in a
small padded list. Per fine step the candidate cell is compared against
every edit (dense, O(n_edits) VPU ops); coarse skips stay sound because
the coarse table is rebuilt from the EDITED grid on every set_block
(cheap: 4K cells), so solid edits zero their block's distance before any
skip certificate can cross them.

Semantics are identical to ops/dda.trace / trace_skip — same entry clip,
same tie rules (x beats y beats z on equal boundary t), same
entering/exiting hit definitions, same TraceResult — and oracle-tested
against them (tests/test_dda_proc.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vrv_tpu.ops.dda import TraceResult
from vrv_tpu.ops.noise import simplex3

_BIG = jnp.float32(3.0e38)

COARSE_BLOCK = 8  # fine cells per coarse cell, per axis


class ProcStatic(NamedTuple):
    """Hashable worldgen parameters — jit-static (session constants, like
    the reference's compile-time worldgen consts in chunk.rs:69-96)."""

    seed: int
    noise_scale: float
    y_falloff: float
    threshold: float
    origin: Tuple[int, int, int]
    shape: Tuple[int, int, int]
    grass: int
    stone: int
    air: int
    n_edits: int          # padded length of the edit arrays (0 = no edits)
    use_coarse: bool = True
    # compile-time empty-box skip structures for the pallas kernel
    # (ops/pallas/trace_proc.coarse_consts; () = none). Static is sound
    # because the pallas tracer only serves edit-free worldgen scenes.
    coarse_const: tuple = ()
    # True when every reachable block's materials are statically
    # lambertian (metallicity == 0 and alpha == 1 on all texels of
    # grass/stone) — the precondition for the fused path kernel
    # (ops/pallas/path_proc.py), whose in-kernel scatter needs no texels.
    lambert_only: bool = False
    # True when every edit block is air or opaque-lambert (so translucent
    # == ~solid still holds and the fused kernel's in-kernel cosine
    # scatter stays correct). Glass edits set this False.
    edits_lambert: bool = True
    # Constant-material OPAQUE non-lambert blocks reachable via edits:
    # ((block_id, (metal_f0..metal_f5)), ...) — per-face constant
    # metallicity with alpha == 1 everywhere (the mirror class, incl. the
    # DEFAULT placed block, quirk Q7). The fused kernel's retire branches
    # the scatter on these constants (reflect vs cosine), so mirror
    # placements stay on the fast path; translucent == ~solid still
    # holds (opaque). Glass (texel-varying alpha, translucent) is in
    # edit_glass instead.
    edit_mats: tuple = ()
    # Edit-gate + per-edit-compare formulation knobs (A/B diagnostics;
    # all value-identical): gate 'boxes' = per-coarse-block tight boxes,
    # 'aabb' = one global AABB, 'off' = dense per-step compares
    # everywhere; cmp 'bool' = mask-op accumulate, 'i32' = the round-4
    # convert+multiply form. On-chip pricing in docs/PERF.md round 5.
    edit_gate_mode: str = "boxes"
    # on-chip verdict (docs/PERF.md round-5 gate hunt): the i32
    # compare+multiply form beats the i1 mask-op form by ~30% at E=256 —
    # Mosaic legalizes vector i1 accumulate chains poorly
    edit_cmp: str = "i32"
    # TRANSLUCENT const-metal edit blocks with byte-exact per-texel
    # alpha (the glass class): ((block_id, (metal_f0..f5),
    # ((words64 face0), ..., (words64 face5))), ...). The kernel's march
    # then carries a translucency bit (hit = entering solid from
    # translucent OR exiting solid into translucent — the mesher's face
    # emission rule), and the retire's scatter reads alpha from the
    # per-face constant word trees exactly like the instance machinery.
    edit_glass: tuple = ()
    # True when the fused path kernel can carry the current edit set:
    # every edited-in block is air, opaque-lambert, or in edit_mats.
    edits_fused: bool = True
    # Static tuple of opaque-lambert block ids placeable by edits —
    # extends the fused path's one-hot texel set beyond grass/stone
    # (render/megakernel.py tex_set).
    lambert_blocks: tuple = ()
    # Content dedup over the packed 8-channel atlas: tex_dedup[tid] is the
    # lowest texture id with byte-identical texels (identity when empty).
    # Lets megakernel group its one-hot tex_set by CONTENT — the shipped
    # assets have only 13 unique textures behind 42 face ids, so the
    # (n, K, C) fetch intermediate shrinks ~2.3x at identical results.
    tex_dedup: tuple = ()
    # Smallest cell y such that every PRISTINE-worldgen cell with
    # cy >= y_air is air (from the cached pristine grid; -1 = unknown).
    # Solid edits extend the bound at runtime inside the Pallas kernels
    # (from their SMEM keys), giving an upward-exit certificate: a
    # marching ray in air with dy >= 0 at/above the bound can retire as
    # a miss immediately — bit-identical to marching to the grid exit.
    y_air: int = -1


class ProcWorld(NamedTuple):
    """ProcStatic + the per-scene dynamic arrays, assembled INSIDE a jit
    region (never passed across a jit boundary: the scalar fields would
    become tracers)."""

    # statics (hashable)
    seed: int
    noise_scale: float
    y_falloff: float
    threshold: float
    origin: Tuple[int, int, int]
    shape: Tuple[int, int, int]
    grass: int
    stone: int
    air: int
    n_edits: int          # padded length of the edit arrays (0 = no edits)
    # dynamic arrays
    coarse: Optional[jax.Array] = None       # (Cx, Cy, Cz) uint8 coarse dist
    edit_cells: Optional[jax.Array] = None   # (n_edits, 3) int32; padding
    #   rows use an out-of-grid sentinel cell (never matches)
    edit_blocks: Optional[jax.Array] = None  # (n_edits,) uint8 (air = hole)
    edit_solid: Optional[jax.Array] = None   # (n_edits,) bool (renders?)
    edit_translucent: Optional[jax.Array] = None  # (n_edits,) bool


def assemble(ps: ProcStatic, pd: Optional[dict]) -> ProcWorld:
    """Combine static params with the dynamic array bundle (see Scene)."""
    pd = pd or {}
    return ProcWorld(
        seed=ps.seed, noise_scale=ps.noise_scale, y_falloff=ps.y_falloff,
        threshold=ps.threshold, origin=ps.origin, shape=ps.shape,
        grass=ps.grass, stone=ps.stone, air=ps.air, n_edits=ps.n_edits,
        coarse=pd.get("coarse") if ps.use_coarse else None,
        edit_cells=pd.get("edit_cells"),
        edit_blocks=pd.get("edit_blocks"),
        edit_solid=pd.get("edit_solid"),
        edit_translucent=pd.get("edit_translucent"),
    )


def build_coarse_dist(grid: np.ndarray, air_id: int, cap: int = 15) -> np.ndarray:
    """Coarse chebyshev distance-to-nearest-occupied-block table (uint8).

    0 = this 8^3 block contains at least one non-air cell; v >= 1 = every
    block within chebyshev radius v-1 is all-air. NumPy, host-side: it is
    rebuilt per world edit and the coarse grid is tiny (16^3 at 128^3).
    """
    g = np.asarray(grid)
    occ_shape = tuple((s + COARSE_BLOCK - 1) // COARSE_BLOCK for s in g.shape)
    pad = tuple(o * COARSE_BLOCK - s for o, s in zip(occ_shape, g.shape))
    solid = g != np.uint8(air_id)
    if any(pad):
        solid = np.pad(solid, [(0, p) for p in pad])
    occ = solid.reshape(
        occ_shape[0], COARSE_BLOCK, occ_shape[1], COARSE_BLOCK, occ_shape[2], COARSE_BLOCK
    ).any(axis=(1, 3, 5))
    dist = np.where(occ, 0, cap).astype(np.int32)
    for _ in range(cap):
        p = np.pad(dist, 1, constant_values=cap)
        neigh = np.min(
            [
                p[i : i + dist.shape[0], j : j + dist.shape[1], k : k + dist.shape[2]]
                for i in range(3)
                for j in range(3)
                for k in range(3)
            ],
            axis=0,
        )
        dist = np.minimum(dist, neigh + 1)
    return dist.astype(np.uint8)


def _make_coarse_reader(coarse: jax.Array):
    """Returns read(cxc, cyc, czc, inside) -> float32 coarse dist, gather-free.

    Two-level: a one-hot over the (Cx*Cy) row index hits the MXU as
    (n,rows)@(rows,Cz); the z select is a dense 16-wide masked sum.
    """
    Cx, Cy, Cz = coarse.shape
    table = coarse.astype(jnp.bfloat16).reshape(Cx * Cy, Cz)
    n_rows = Cx * Cy
    row_iota = jnp.arange(n_rows, dtype=jnp.int32)
    z_iota = jnp.arange(Cz, dtype=jnp.int32)

    def read(cxc, cyc, czc, inside):
        row = cxc * Cy + cyc
        onehot = (row[:, None] == row_iota[None, :]).astype(jnp.bfloat16)
        zrow = jax.lax.dot_general(
            onehot, table, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n, Cz)
        zsel = (czc[:, None] == z_iota[None, :]).astype(jnp.float32)
        v = (zrow * zsel).sum(axis=1)
        return jnp.where(inside, v, jnp.float32(255.0))

    return read


def _density_at(pw, wx, wy, wz):
    s = pw.noise_scale
    return simplex3(wx / s, wy / s, wz / s, seed=pw.seed) - wy / pw.y_falloff


def worldgen_blocks(ps: ProcStatic, cx, cy, cz):
    """Predicted block ids at grid-local int cells, as THIS tracer computes
    them (flat evaluation, no edits).

    The scene uses this to verify the procedural prediction against the
    actual grid: the same real-valued density function evaluated inside two
    differently-fused XLA programs can round differently for cells within
    ~1 ulp-chain of the threshold, flipping their solidity. Any such cell
    is absorbed into the edit list (render/scene._sync_proc), which the
    tracer then matches exactly — so worldgen/tracer fusion drift can never
    leak into images.
    """
    ox, oy, oz = ps.origin
    wx = cx.astype(jnp.float32) + ox
    wy = cy.astype(jnp.float32) + oy
    wz = cz.astype(jnp.float32) + oz
    thr = jnp.float32(ps.threshold)
    here = _density_at(ps, wx, wy, wz) > thr
    above = _density_at(ps, wx, wy + 1.0, wz) > thr
    return jnp.where(
        here,
        jnp.where(above, jnp.uint8(ps.stone), jnp.uint8(ps.grass)),
        jnp.uint8(ps.air),
    )


def _make_occupancy(pw: ProcWorld):
    """Returns solid(cx, cy, cz, inside) -> bool, pure dense math.

    cx/cy/cz are grid-local int32 cell coords; outside cells are air.
    Edits override the worldgen answer exactly (solid = "renders", i.e.
    any non-air block).
    """
    ox, oy, oz = pw.origin
    thr = jnp.float32(pw.threshold)

    def solid(cx, cy, cz, inside):
        wx = cx.astype(jnp.float32) + ox
        wy = cy.astype(jnp.float32) + oy
        wz = cz.astype(jnp.float32) + oz
        s = _density_at(pw, wx, wy, wz) > thr
        if pw.n_edits:
            ec = pw.edit_cells  # (E, 3)
            match = (
                (cx[:, None] == ec[None, :, 0])
                & (cy[:, None] == ec[None, :, 1])
                & (cz[:, None] == ec[None, :, 2])
            )  # (n, E)
            edited = match.any(axis=1)
            esolid = (match & pw.edit_solid[None, :]).any(axis=1)
            s = jnp.where(edited, esolid, s)
        return s & inside

    return solid


def _hit_blocks(pw: ProcWorld, hx, hy, hz, hit):
    """Block ids for hit cells (post-loop): worldgen grass/stone + edits."""
    ox, oy, oz = pw.origin
    wx = hx.astype(jnp.float32) + ox
    wy = hy.astype(jnp.float32) + oy
    wz = hz.astype(jnp.float32) + oz
    above = _density_at(pw, wx, wy + 1.0, wz) > jnp.float32(pw.threshold)
    blocks = jnp.where(above, jnp.uint8(pw.stone), jnp.uint8(pw.grass))
    if pw.n_edits:
        ec = pw.edit_cells
        match = (
            (hx[:, None] == ec[None, :, 0])
            & (hy[:, None] == ec[None, :, 1])
            & (hz[:, None] == ec[None, :, 2])
        )
        edited = match.any(axis=1)
        eb = (
            jnp.where(match, pw.edit_blocks[None, :].astype(jnp.int32), 0)
            .sum(axis=1)
            .astype(jnp.uint8)
        )
        blocks = jnp.where(edited, eb, blocks)
    return jnp.where(hit, blocks, jnp.uint8(pw.air))


def _make_translucency(pw: ProcWorld):
    """Returns translucent(cx, cy, cz, solid) -> bool.

    Worldgen blocks (grass/stone) are opaque and air is translucent, so
    absent edits translucency == ~solid. Edited cells may be translucent
    renderables (glass): those are solid AND translucent.
    """

    def translucent(cx, cy, cz, solidv):
        t = ~solidv
        if pw.n_edits:
            ec = pw.edit_cells
            match = (
                (cx[:, None] == ec[None, :, 0])
                & (cy[:, None] == ec[None, :, 1])
                & (cz[:, None] == ec[None, :, 2])
            )
            et = (match & pw.edit_translucent[None, :]).any(axis=1)
            edited = match.any(axis=1)
            t = jnp.where(edited, et, t)
        return t

    return translucent


import os as _os

PROC_COMPACT_K = int(_os.environ.get("VRV_PROC_K", 12))
PROC_COMPACT_CAP = int(_os.environ.get("VRV_PROC_CAP", 1 << 16))


def trace_proc(
    ps,
    origin: jax.Array,
    direction: jax.Array,
    t_min: float = 0.001,
    t_max: float = 1000.0,
    pd: Optional[dict] = None,
    tcap: Optional[jax.Array] = None,
) -> TraceResult:
    """March rays through the procedural world. Same contract as dda.trace.

    ps: a ProcStatic (jit-static scalars) OR a pre-assembled ProcWorld;
    pd: the dynamic array bundle (coarse + edits) when ps is a ProcStatic.
    origin/direction: (..., 3) float32 in grid-local coords.
    tcap: optional per-lane t ceiling (shadow rays pass their light
    distance — marching past it cannot change the visibility verdict;
    same contract as ops/pallas/trace_proc). Every t_max comparison in
    the march body broadcasts, so the vector rides the scalar's path.
    """
    pw = ps if isinstance(ps, ProcWorld) else assemble(ps, pd)
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    n = o.shape[0]

    tv = t_max if tcap is None else jnp.minimum(
        jnp.float32(t_max), tcap.reshape(-1).astype(jnp.float32)
    )
    h = _setup(pw, o, d, t_min, tv)
    state = _init(h)
    body = _body(h)
    max_steps = h["max_steps"]

    def cond_all(s):
        return (s["steps"] < max_steps) & s["alive"].any()

    if n <= PROC_COMPACT_CAP:
        s = jax.lax.while_loop(cond_all, body, state)
        return _result(pw, s, shape)

    # tail compaction, same strategy as dda.trace_skip: full width while the
    # alive set is large, then stable-sort the survivors to a bounded prefix
    cap = min(n, max(PROC_COMPACT_CAP, ((n // 8 + 0xFFFF) >> 16) << 16))
    thresh = max(cap, n // 6)

    def cond_p1(s):
        alive_n = s["alive"].sum()
        more = (alive_n > cap) | ((s["steps"] < PROC_COMPACT_K) & (alive_n > thresh))
        return (s["steps"] < max_steps) & (alive_n > 0) & more

    s1 = jax.lax.while_loop(cond_p1, body, state)

    i32 = jnp.int32
    key = (~s1["alive"]).astype(i32)
    ids = jnp.arange(n, dtype=i32)
    _, perm = jax.lax.sort((key, ids), num_keys=1, is_stable=True)
    s_ids = perm[:cap]
    o2 = jnp.stack([jnp.take(o[:, k], s_ids) for k in range(3)], axis=-1)
    d2 = jnp.stack([jnp.take(d[:, k], s_ids) for k in range(3)], axis=-1)
    cellpack = (s1["cx"] << 20) | (s1["cy"] << 10) | s1["cz"]
    s_cellpack = jnp.take(cellpack, s_ids)
    s_solid = jnp.take(s1["cur_solid"], s_ids)
    s_tl = jnp.take(s1["cur_tl"], s_ids)
    was_alive = jnp.take(s1["alive"], s_ids, axis=0)

    h2 = _setup(
        pw, o2, d2, t_min,
        tv if tcap is None else jnp.take(tv, s_ids),
    )
    state2 = dict(
        alive=was_alive,
        cx=(s_cellpack >> 20) & 1023,
        cy=(s_cellpack >> 10) & 1023,
        cz=s_cellpack & 1023,
        cur_solid=s_solid,
        cur_tl=s_tl,
        hit=jnp.zeros(cap, bool),
        t=jnp.zeros(cap, jnp.float32),
        face=jnp.zeros(cap, i32),
        hx=jnp.zeros(cap, i32),
        hy=jnp.zeros(cap, i32),
        hz=jnp.zeros(cap, i32),
        entering=jnp.zeros(cap, bool),
        steps=s1["steps"],
    )
    s2 = jax.lax.while_loop(cond_all, _body(h2), state2)

    dest = jnp.where(was_alive, s_ids, i32(n))
    out = dict(s1)
    for f in ("hit", "t", "face", "hx", "hy", "hz", "entering"):
        out[f] = out[f].at[dest].set(s2[f], mode="drop")
    return _result(pw, out, shape)


def _result(pw: ProcWorld, s, shape) -> TraceResult:
    hx, hy, hz = s["hx"], s["hy"], s["hz"]
    blocks = _hit_blocks(pw, hx, hy, hz, s["hit"])
    cell = jnp.stack([hx, hy, hz], axis=-1).reshape(shape + (3,))
    return TraceResult(
        hit=s["hit"].reshape(shape),
        t=s["t"].reshape(shape),
        block=blocks.reshape(shape),
        face=s["face"].reshape(shape),
        cell=cell,
        entering=s["entering"].reshape(shape),
    )


def _setup(pw: ProcWorld, o, d, t_min, t_max) -> dict:
    f32 = jnp.float32
    X, Y, Z = pw.shape
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    tiny = 1e-12
    bigx = jnp.abs(dx) < tiny
    bigy = jnp.abs(dy) < tiny
    bigz = jnp.abs(dz) < tiny
    ix = 1.0 / jnp.where(bigx, f32(tiny), dx)
    iy = 1.0 / jnp.where(bigy, f32(tiny), dy)
    iz = 1.0 / jnp.where(bigz, f32(tiny), dz)

    # NOTE on edits + skips: pw.coarse is built from the EDITED grid
    # (scene rebuilds it on set_block), so solid edits already zero their
    # block's coarse distance — every skip certificate accounts for them.

    return dict(
        X=X, Y=Y, Z=Z, t_min=t_min, t_max=t_max,
        occupancy=_make_occupancy(pw),
        translucency=_make_translucency(pw),
        coarse_read=_make_coarse_reader(pw.coarse) if pw.coarse is not None else None,
        o=(ox, oy, oz), d=(dx, dy, dz), inv=(ix, iy, iz),
        big=(bigx, bigy, bigz),
        max_steps=int(X + Y + Z + 3),
    )


def _init(h) -> dict:
    f32 = jnp.float32
    i32 = jnp.int32
    ox, oy, oz = h["o"]
    dx, dy, dz = h["d"]
    ix, iy, iz = h["inv"]
    bigx, bigy, bigz = h["big"]
    X, Y, Z = h["X"], h["Y"], h["Z"]
    t_min, t_max = h["t_min"], h["t_max"]

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
    valid = (t0 <= t_exit) & (t0 <= t_max) & ~degenerate

    cx = jnp.clip(jnp.floor(ox + t0 * dx).astype(i32), 0, X - 1)
    cy = jnp.clip(jnp.floor(oy + t0 * dy).astype(i32), 0, Y - 1)
    cz = jnp.clip(jnp.floor(oz + t0 * dz).astype(i32), 0, Z - 1)
    cur_solid = h["occupancy"](cx, cy, cz, valid)
    cur_tl = h["translucency"](cx, cy, cz, cur_solid)

    starts_outside = t_enter > t_min
    entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
    hit0 = (
        valid & starts_outside & cur_solid & (t_enter >= t_min) & (t_enter <= t_max)
    )

    return dict(
        alive=valid & ~hit0,
        cx=cx, cy=cy, cz=cz,
        cur_solid=cur_solid,
        cur_tl=cur_tl,
        hit=hit0,
        t=jnp.where(hit0, t_enter, f32(0.0)),
        face=jnp.where(hit0, entry_face.astype(i32), 0),
        hx=jnp.where(hit0, cx, 0),
        hy=jnp.where(hit0, cy, 0),
        hz=jnp.where(hit0, cz, 0),
        entering=hit0,
        steps=jnp.int32(0),
    )


def _body(h):
    """One marching step: coarse box-skip when certified, else exact DDA."""
    f32 = jnp.float32
    i32 = jnp.int32
    ox, oy, oz = h["o"]
    dx, dy, dz = h["d"]
    ix, iy, iz = h["inv"]
    bigx, bigy, bigz = h["big"]
    X, Y, Z = h["X"], h["Y"], h["Z"]
    t_min, t_max = h["t_min"], h["t_max"]
    occupancy = h["occupancy"]
    translucency = h["translucency"]
    coarse_read = h["coarse_read"]
    B = COARSE_BLOCK

    def body(s):
        scx, scy, scz = s["cx"], s["cy"], s["cz"]
        cur_solid = s["cur_solid"]
        cur_tl = s["cur_tl"]
        fx, fy, fz = scx.astype(f32), scy.astype(f32), scz.astype(f32)

        if coarse_read is not None:
            # --- coarse certificate at the current cell's block ---
            cxc, cyc, czc = scx // B, scy // B, scz // B
            v = coarse_read(cxc, cyc, czc, s["alive"])
            r = jnp.maximum(v - 1.0, 0.0)  # radius in blocks
            # air box in fine-cell units: [blk_lo - rB, blk_hi + rB]
            lo_x = (cxc.astype(f32) - r) * B
            lo_y = (cyc.astype(f32) - r) * B
            lo_z = (czc.astype(f32) - r) * B
            hi_x = (cxc.astype(f32) + 1.0 + r) * B
            hi_y = (cyc.astype(f32) + 1.0 + r) * B
            hi_z = (czc.astype(f32) + 1.0 + r) * B

            # exit t of the air box along the ray
            tbx = jnp.where(bigx, _BIG, jnp.where(dx > 0, (hi_x - ox) * ix, (lo_x - ox) * ix))
            tby = jnp.where(bigy, _BIG, jnp.where(dy > 0, (hi_y - oy) * iy, (lo_y - oy) * iy))
            tbz = jnp.where(bigz, _BIG, jnp.where(dz > 0, (hi_z - oz) * iz, (lo_z - oz) * iz))
            t_skip = jnp.minimum(jnp.minimum(tbx, tby), tbz)
            ex_x = t_skip == tbx
            ex_y = (~ex_x) & (t_skip == tby)
            ex_z = ~(ex_x | ex_y)

            def skip_axis(is_exit, lo, hi, o1, d1):
                # land on the LAST air cell inside the box along this axis
                exact = jnp.where(d1 > 0, hi, lo).astype(i32) - (d1 > 0)
                flo = jnp.clip(
                    jnp.floor(o1 + t_skip * d1).astype(i32),
                    lo.astype(i32),
                    hi.astype(i32) - 1,
                )
                return jnp.where(is_exit, exact, flo)

            kx = skip_axis(ex_x, lo_x, hi_x, ox, dx)
            ky = skip_axis(ex_y, lo_y, hi_y, oy, dy)
            kz = skip_axis(ex_z, lo_z, hi_z, oz, dz)
            # never land BEHIND the march: flo recomputes the position
            # at t_skip from the ORIGIN in f32, and at a cell corner
            # that can round one cell backward — a backward landing
            # makes skip/step oscillate until the step budget retires
            # the lane as a miss (see ops/pallas/trace_proc.coarse_skip)
            kx = jnp.where(dx > 0, jnp.maximum(kx, scx), jnp.minimum(kx, scx))
            ky = jnp.where(dy > 0, jnp.maximum(ky, scy), jnp.minimum(ky, scy))
            kz = jnp.where(dz > 0, jnp.maximum(kz, scz), jnp.minimum(kz, scz))
            skip_inside = (
                (kx >= 0) & (kx < X) & (ky >= 0) & (ky < Y) & (kz >= 0) & (kz < Z)
            )
            skip_out = ~skip_inside | (t_skip > t_max)
            # only take a skip that ADVANCES: the landing cell (last air cell
            # inside the box) can be the current cell itself, and re-skipping
            # from it would loop forever — the exact crossing below is the
            # one that steps OUT of a fully-consumed air box
            can_skip = (
                s["alive"] & (v >= 1.0)
                & ((kx != scx) | (ky != scy) | (kz != scz))
            )
        else:
            kx = ky = kz = scx  # unused
            skip_inside = skip_out = jnp.zeros_like(s["alive"])
            can_skip = jnp.zeros_like(s["alive"])

        # --- exact branch: one-cell DDA step (formulas = dda._trace_body) ---
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
        new_solid = occupancy(nx, ny, nz, inside)
        new_tl = translucency(nx, ny, nz, new_solid)

        entering_hit = new_solid & cur_tl & ~can_skip
        exiting_hit = cur_solid & new_tl & ~can_skip
        in_range = (t_next >= t_min) & (t_next <= t_max)
        any_hit = s["alive"] & in_range & (entering_hit | exiting_hit)

        face_pos = axis * 2 + jnp.where(sgn > 0, 0, 1)
        face_neg = axis * 2 + jnp.where(sgn > 0, 1, 0)
        face = jnp.where(entering_hit, face_pos, face_neg).astype(i32)

        rec = any_hit & ~s["hit"]
        dead_exact = ~inside_exact | (t_next > t_max)
        dead = jnp.where(can_skip, skip_out, dead_exact)
        alive = s["alive"] & ~any_hit & ~dead
        return dict(
            alive=alive,
            cx=nx, cy=ny, cz=nz,
            cur_solid=new_solid,
            cur_tl=new_tl,
            hit=s["hit"] | any_hit,
            t=jnp.where(rec, t_next, s["t"]),
            face=jnp.where(rec, face, s["face"]),
            hx=jnp.where(rec, jnp.where(entering_hit, nx, scx), s["hx"]),
            hy=jnp.where(rec, jnp.where(entering_hit, ny, scy), s["hy"]),
            hz=jnp.where(rec, jnp.where(entering_hit, nz, scz), s["hz"]),
            entering=jnp.where(rec, entering_hit, s["entering"]),
            steps=s["steps"] + 1,
        )

    return body
