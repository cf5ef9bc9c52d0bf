"""Fused multi-bounce path kernel: the TRUE TPU megakernel.

ops/pallas/trace_proc.py removed per-step memory traffic; this kernel
removes the per-bounce kernel launches and the cross-bounce divergence
that remained: each (8,128)-pixel ray block runs a persistent per-ray
state machine in VMEM — march the current bounce, and when it resolves,
record the hit, sample the next (cosine-hemisphere) direction in-kernel
and keep marching — until every ray has finished all its bounces. A
block's cost is max over rays of the TOTAL path steps, instead of the
sum over bounces of the per-bounce maxima (Jensen), and blocks whose
rays all die early exit without touching later bounces at all.

Scope (checked by the caller, render/megakernel.py): worldgen scenes
with murmur3 RNG and lambert-only materials for the reachable VOXEL
blocks (grass/stone: verified metallicity == 0 and alpha == 1 at asset
load, so the voxel scatter branch is statically lambertian and needs no
texel access). On top of that base the kernel carries, in-kernel:
  - world edits — the <=64-entry SMEM edit list, compared at hit
    resolution (air-or-opaque-lambert edits; ps.edits_lambert);
  - entity instances — SMEM triangles with per-bounce Moller-Trumbore
    and constant-material (mirror/transmit/lambert) scatter;
  - split NEE — per non-last bounce, flat-light-list sampling and a
    tcap'd shadow-ray sub-phase of the lane state machine (enabled by
    `lights`, cfg.pallas_inkernel_nee).
Texture-dependent radiance (reflectivity/emissivity fetches, sky, the
radiance unroll) stays in XLA: the kernel returns per-bounce hit
records + the sampled directions, and render/megakernel.py replays its
ordinary bounce loop over them — do_bounce sees exactly the ray chain
the kernel marched (directions are consumed from the kernel, so Mosaic
vs XLA transcendental rounding cannot desync the path; RNG draws are
pure uint32 murmur3, bit-equal across backends).

Reference anchor: this is the wavefront-vs-megakernel tension of
pathtrace_shader.rs resolved the TPU way — persistent-thread megakernel
IN the core, wavefront-style separation of texture IO OUTSIDE it.

Outputs per bounce b in [0, B): packed_b, t_b (trace_proc encoding);
for b >= 1 additionally the direction d_b the kernel sampled and
marched; with instances, per-bounce instance-hit records (prim, t,
bary); with lights, per non-last bounce the (chosen light index,
shadow visibility) pair (see trace_path_pallas's docstring).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vrv_tpu.ops.noise import _seed_mix
from vrv_tpu.ops.pallas.trace_proc import (
    BLOCK_ROWS,
    LANES,
    UNROLL,
    _BIG,
    _apply_edits,
    _const_word_tree,
    _edit_overrides,
    _simplex3_seeded,
    coarse_skip,
    derive_y_cut,
    edit_smem_args,
    exact_step,
    slab_clip,
    step_consts,
)

_2PI = float(2.0 * np.pi)


def _face_consts():
    """Per-face frame constants as python float lists (selected in-kernel
    with 6-way wheres — shade._FACE_CONST's rows; cu/cv are the per-face
    uv affine tables the in-kernel-radiance retire path needs)."""
    from vrv_tpu.ops import dda

    return dict(
        normal=dda.FACE_NORMALS.tolist(),
        tan0=dda.FACE_TANGENTS[:, 0].tolist(),
        tan1=dda.FACE_TANGENTS[:, 1].tolist(),
        bit0=dda.FACE_BITANGENTS[:, 0].tolist(),
        bit1=dda.FACE_BITANGENTS[:, 1].tolist(),
        axes=dda.FACE_PLANE_AXES.tolist(),
        cu=dda.FACE_U_AFFINE.tolist(),
        cv=dda.FACE_V_AFFINE.tolist(),
    )


def _const_f32_tree(vals, idx):
    """Select vals[idx] per lane from compile-time constant floats — the
    f32 sibling of trace_proc._const_word_tree (binary select tree,
    len(vals)-1 vector selects, zero memory traffic)."""

    def sel(base, m):
        if m == 0:
            v = vals[base] if base < len(vals) else 0.0
            return jnp.float32(v)
        half = 1 << (m - 1)
        b = (idx >> (m - 1)) & 1
        return jnp.where(b == 1, sel(base + half, m - 1), sel(base, m - 1))

    nbits = max(1, (len(vals) - 1).bit_length())
    return sel(0, nbits)


def _sel_face(face, vals):
    """6-way select of python scalars by the face index vector."""
    out = jnp.float32(vals[5])
    for f in range(4, -1, -1):
        out = jnp.where(face == f, jnp.float32(vals[f]), out)
    return out


def _draw(seed_u32, slot):
    """rng.draw in u32 vector math (murmur3 mode), inlined for Mosaic."""
    u32 = jnp.uint32
    h = seed_u32
    k = u32(slot) * u32(0x1B873593)
    h = h ^ k
    h = (h << u32(13)) | (h >> u32(19))
    h = h * u32(5) + u32(0xE6546B64)
    h = h ^ (h >> u32(16))
    h = h * u32(0x85EBCA6B)
    h = h ^ (h >> u32(13))
    h = h * u32(0xC2B2AE35)
    h = h ^ (h >> u32(16))
    m = (h & u32(0x007FFFFF)) | u32(0x3F800000)
    return jax.lax.bitcast_convert_type(m, jnp.float32) - jnp.float32(1.0)


def _combine(h, k):
    u32 = jnp.uint32
    k = k.astype(u32) * u32(0x1B873593) if hasattr(k, "astype") else u32(k) * u32(0x1B873593)
    h = h ^ k
    h = (h << u32(13)) | (h >> u32(19))
    return h * u32(5) + u32(0xE6546B64)


def _path_kernel(
    *refs,
    ps, t_min, t_max, n_bounces, unroll, coarse, retire_cond=True, n_inst=0,
    inst_mat=None, step_cap=0, has_done=False, n_lights=0, nee_pdf=False,
    opt=False, rad=None,
):
    """n_lights > 0 enables IN-KERNEL split NEE: after each non-last
    lambert hit the lane samples a light from the flat list (SMEM rows,
    exactly ops/nee.sample_light_flat's importance math and draw slots
    7/8/9), marches the shadow ray to its light distance as a sub-phase
    (tcap'd — marching past the light cannot change visibility), records
    the chosen light index + visibility bit, then resumes the saved
    cosine continuation. The XLA side recomputes the direct term from
    (index, draws) — pathtrace_shader.rs:779-872's in-kernel NEE, the
    TPU way (the emission texel fetch stays outside; VERDICT r2 item 2's
    follow-through)."""
    f32 = jnp.float32
    i32 = jnp.int32
    X, Y, Z = ps.shape
    gox, goy, goz = ps.origin
    thr = f32(ps.threshold)
    inv_scale = f32(1.0 / ps.noise_scale)
    inv_falloff = f32(1.0 / ps.y_falloff)
    seed_mix = _seed_mix(ps.seed)
    fc = _face_consts()
    B = n_bounces
    tiny = f32(1e-12)
    E = ps.n_edits

    from vrv_tpu.ops.pallas.trace_proc import EDIT_GATE_MIN

    gate = E > EDIT_GATE_MIN and ps.edit_gate_mode != "off"
    k = 0
    if E:
        ek_ref, ef_ref = refs[0], refs[1]
        edits = _edit_overrides(ek_ref, ef_ref, E)
        k = 2
        if gate:
            ebox_ref = refs[2]
            k = 3
    if n_inst:
        iv_ref = refs[k]
        k += 1
        # loop-invariant per-triangle scalars, read ONCE per kernel:
        # [v0(3) | v1(3) | v2(3) | texslot | uv0 uv1 uv2 (6)] per row;
        # per-texture constant metallicity + per-texel alpha byte words
        # arrive as compile-time constants in inst_mat
        inst_rows = [
            [iv_ref[j * 16 + c] for c in range(16)] for j in range(n_inst)
        ]
        inst_alpha_words, inst_metal = inst_mat
    if n_lights:
        # flat light list rows (SMEM, read once):
        # [v0(3)|v1(3)|v2(3)|power|area|tex|uv(6)] — the same padded
        # arrays ops/nee.sample_light_flat consumes, so in-kernel
        # importance/selection matches the XLA sampler's values
        lv_ref = refs[k]
        k += 1
        light_rows = [
            [lv_ref[j * 18 + c] for c in range(18)] for j in range(n_lights)
        ]
        # per-light centroids (loop-invariant scalar math)
        light_ctr = [
            (
                (r[0] + r[3] + r[6]) / 3.0,
                (r[1] + r[4] + r[7]) / 3.0,
                (r[2] + r[5] + r[8]) / 3.0,
            )
            for r in light_rows
        ]
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     seed_ref), rest = refs[k:k + 7], refs[k + 7:]
    if has_done:
        # tail-restart pass 2: lanes already resolved by the capped pass 1
        # start at pbounce = B, so all-done blocks exit before their first
        # chunk (the while cond is false at entry)
        done_ref, out_refs = rest[0], rest[1:]
    else:
        out_refs = rest

    seed0 = seed_ref[:]

    # upward-exit certificate bound (ProcStatic.y_air): every cell with
    # cy >= y_cut is air — worldgen bound from the pristine grid, solid
    # edits raise it at runtime from their SMEM keys (loop-invariant
    # scalar math, computed once per kernel). Compiled out when the bound
    # is at/above the grid top (solid-capable everywhere — true for the
    # reference worldgen's shallow y_falloff at ground-level windows):
    # the cert could never fire and edits only raise the bound.
    y_cut = derive_y_cut(ps, edits if E else None, E)

    def inst_intersect(ox, oy, oz, dx, dy, dz):
        """Nearest instance-triangle hit per lane (Moller-Trumbore over the
        SMEM triangle list; formula order mirrors ops.instances.
        trace_instances so interpret mode is bit-identical to the staged
        XLA pass). Returns (hit(bool), t, prim(i32), u, v)."""
        best_t = None
        for j in range(n_inst):
            r = inst_rows[j]
            v0x, v0y, v0z = r[0], r[1], r[2]
            e1x, e1y, e1z = r[3] - r[0], r[4] - r[1], r[5] - r[2]
            e2x, e2y, e2z = r[6] - r[0], r[7] - r[1], r[8] - r[2]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = (e1x * px + e1y * py) + e1z * pz
            ok = jnp.abs(det) > f32(1e-9)
            inv = 1.0 / jnp.where(ok, det, f32(1.0))
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            u = ((tvx * px + tvy * py) + tvz * pz) * inv
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = ((dx * qx + dy * qy) + dz * qz) * inv
            t = ((e2x * qx + e2y * qy) + e2z * qz) * inv
            ok = (
                ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t >= f32(t_min)) & (t <= f32(t_max))
            )
            t = jnp.where(ok, t, f32(3e38))
            if best_t is None:
                best_t, best_ok, best_u, best_v = t, ok, u, v
                best_j = jnp.zeros_like(t, i32)
            else:
                better = t < best_t  # strict: first-minimum like argmin
                best_ok = (better & ok) | (~better & best_ok)
                best_t = jnp.where(better, t, best_t)
                best_u = jnp.where(better, u, best_u)
                best_v = jnp.where(better, v, best_v)
                best_j = jnp.where(better, i32(j), best_j)
        return best_ok, best_t, best_j, best_u, best_v

    def inst_select(best_j):
        """Per-lane triangle constants for the chosen prim (16 values)."""
        out = [jnp.full_like(best_j, 0).astype(f32) for _ in range(16)]
        for j in range(n_inst):
            m = best_j == j
            for c in range(16):
                out[c] = jnp.where(m, inst_rows[j][c], out[c])
        return out

    # glass-class edits (ProcStatic.edit_glass) make translucency a real
    # per-cell property: the march then carries a translucency bit in
    # BIT 1 of the cur_solid_i state word (no state-shape change) and
    # hits on solid<->translucent transitions (the mesher's face
    # emission rule) — exactly trace_proc._trace_kernel's edited-world
    # semantics. Without glass, translucent == ~solid and the bit stays 0.
    GE = tuple(ps.edit_glass) if E else ()
    has_tl = bool(GE)

    def solid_tl_at(cx, cy, cz, inside, use_edits=True):
        # eligibility (edits_fused, checked by trace_path_pallas)
        # guarantees every edit block is air, OPAQUE (lambert or
        # edit_mats constant-material), or glass-class (edit_glass).
        # use_edits=False compiles the pure-worldgen form for the
        # per-chunk edit gate (legal only when no edit cell is reachable
        # from the chunk). Returns (solid, translucent) — formula order
        # mirrors trace_proc._trace_kernel.solid_tl_at.
        wx = cx.astype(f32) + gox
        wy = cy.astype(f32) + goy
        wz = cz.astype(f32) + goz
        dens = (
            _simplex3_seeded(wx * inv_scale, wy * inv_scale, wz * inv_scale,
                             seed_mix, opt=opt)
            - wy * inv_falloff
        )
        s = dens > thr
        edited_b = tl_i = None
        if E and use_edits:
            s, edited_b, tl_i = _apply_edits(cx, cy, cz, s, edits,
                                             cmp=ps.edit_cmp)
        s = s & inside
        t = ~s
        if E and use_edits and has_tl:
            t = (edited_b & (tl_i != 0)) | (~edited_b & t)
        return s, t

    def solid_at(cx, cy, cz, inside, use_edits=True):
        return solid_tl_at(cx, cy, cz, inside, use_edits)[0]

    def init_march(ox, oy, oz, dx, dy, dz, want):
        """Fresh march state for rays in `want` (dda_proc._init formulas).

        Returns (cx, cy, cz (i32), cur_pack (i32: solid | tl<<1), mhit,
        mdead (bool), t (f32), face (i32), hx, hy, hz (i32), entering
        (bool)) — the per-bounce trace record accumulators start zeroed.
        """
        bigx = jnp.abs(dx) < tiny
        bigy = jnp.abs(dy) < tiny
        bigz = jnp.abs(dz) < tiny
        ix = 1.0 / jnp.where(bigx, tiny, dx)
        iy = 1.0 / jnp.where(bigy, tiny, dy)
        iz = 1.0 / jnp.where(bigz, tiny, dz)

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
        valid = (t0 <= t_exit) & (t0 <= f32(t_max)) & ~degenerate & want

        cx = jnp.clip(jnp.floor(ox + t0 * dx).astype(i32), 0, X - 1)
        cy = jnp.clip(jnp.floor(oy + t0 * dy).astype(i32), 0, Y - 1)
        cz = jnp.clip(jnp.floor(oz + t0 * dz).astype(i32), 0, Z - 1)
        cur_solid, cur_tl = solid_tl_at(cx, cy, cz, valid)
        cur_pack = cur_solid.astype(i32)
        if has_tl:
            cur_pack = cur_pack | (cur_tl.astype(i32) << 1)

        starts_outside = t_enter > f32(t_min)
        entry_face = enter_axis * 2 + jnp.where(d_enter > 0, 0, 1)
        hit0 = valid & starts_outside & cur_solid & (t_enter >= f32(t_min)) & (
            t_enter <= f32(t_max)
        )
        zero = jnp.zeros_like(cx)
        return (
            cx, cy, cz, cur_pack,
            hit0,                                   # mhit
            ~valid & want,                          # mdead (invalid from start)
            jnp.where(hit0, t_enter, f32(0.0)),     # t
            jnp.where(hit0, entry_face.astype(i32), zero),
            jnp.where(hit0, cx, zero),
            jnp.where(hit0, cy, zero),
            jnp.where(hit0, cz, zero),
            hit0,                                   # entering
            ix, iy, iz,
            # per-segment step invariants (cfg.pallas_march_opt): refresh
            # with every fresh march, carried between retires
            step_consts(dx, dy, dz) if opt else (),
        )

    # ---- initial state ----
    ox0, oy0, oz0 = ox_ref[:], oy_ref[:], oz_ref[:]
    dx0, dy0, dz0 = dx_ref[:], dy_ref[:], dz_ref[:]
    all_rays = jnp.ones(ox0.shape, bool)
    (cx, cy, cz, cur_solid, mhit, mdead, t, face, hx, hy, hz, entering,
     ix, iy, iz, sc0) = init_march(ox0, oy0, oz0, dx0, dy0, dz0, all_rays)

    zf = jnp.zeros_like(ox0)
    zi = jnp.zeros_like(cx)
    if rad is not None:
        # in-kernel RADIANCE records (docs/PERF.md round-5): per bounce
        # (code = hit | branch<<1 | (t_mat*256+texel)<<3, cos_in,
        # spdf/rpdf ratio); per non-last bounce with lights
        # (w, cos_x/pi, geo [vis- and ok-folded], e_y rgb). The XLA side
        # reduces to one packed-atlas row fetch per bounce + the exact
        # accumulation chain — no TraceResult assembly, no resolve/shade.
        out_r = [(zi, zf, zf) for _ in range(B)]
        out_n = [(zf, zf, zf, zf, zf, zf) for _ in range(B - 1)] \
            if n_lights else []
        recs0 = (tuple(out_r), tuple(out_n))
    else:
        # per-bounce output accumulators (trace-record mode)
        out_t = [zf for _ in range(B)]
        out_packed = [zi for _ in range(B)]
        out_d = [(zf, zf, zf) for _ in range(B - 1)]  # dirs, bounces 1..B-1
        # instance-hit records per bounce: (prim or -1, bary u, bary v)
        out_i = [(zi - 1, zf, zf) for _ in range(B)] if n_inst else []
        # in-kernel NEE records per non-last bounce: (light idx or -1,
        # vis), plus (chosen importance, selection total W) when nee_pdf —
        # recording them lets the XLA direct term skip the whole (n, L)
        # importance recompute (it only needs the CHOSEN light's features
        # + these two scalars for the pdf bookkeeping)
        s_extra = (zf, zf) if nee_pdf else ()
        out_s = [(zi - 1, zi) + s_extra for _ in range(B - 1)] \
            if n_lights else []
        recs0 = (tuple(out_t), tuple(out_packed), tuple(out_d),
                 tuple(out_i), tuple(out_s))

    if n_inst:
        ihit0, it0, ij0, iu0, iv0 = inst_intersect(
            ox0, oy0, oz0, dx0, dy0, dz0
        )
        inst_st = (ihit0.astype(i32), it0, ij0, iu0, iv0)
    else:
        inst_st = ()
    # shadow sub-phase registers: in_shadow flag, the saved cosine
    # continuation direction, and the shadow ray's t ceiling
    sh_st = (zi, zf, zf, zf, jnp.full_like(ox0, f32(t_max))) if n_lights \
        else ()

    pb0 = jnp.zeros_like(cx)
    if has_done:
        pb0 = jnp.where(done_ref[:] != 0, i32(B), pb0)
    state = (
        pb0,                                    # pbounce
        ox0, oy0, oz0, dx0, dy0, dz0, ix, iy, iz,
        cx, cy, cz,
        cur_solid, mhit.astype(i32), mdead.astype(i32),
        t, face, hx, hy, hz, entering.astype(i32),
        inst_st, sh_st, sc0,
        recs0,
        jnp.int32(0),                           # chunk counter
    )

    max_steps_bounce = int(X + Y + Z + 3)
    n_marches = B + (B - 1 if n_lights else 0)   # paths + shadow sub-phases
    max_chunks = (n_marches * max_steps_bounce) // max(1, unroll) \
        + 2 * n_marches + 2
    if step_cap:
        # capped pass 1 of the tail restart: stop after ~step_cap march
        # steps; unfinished lanes are re-traced from scratch by pass 2
        # (deterministic -> bit-identical to an uncapped single pass)
        max_chunks = min(max_chunks, max(1, step_cap // max(1, unroll)))

    def cond(s):
        return (jnp.min(s[0]) < B) & (s[-1] < max_chunks)

    def march_step(s, use_edits=True):
        (pbounce, ox, oy, oz, dx, dy, dz, ix, iy, iz, scx, scy, scz,
         cur_solid_i, mhit_i, mdead_i, t, face, hx, hy, hz, entering_i,
         inst_st, sh_st, sc_st, recs, chunks) = s
        cur_solid = (cur_solid_i & 1) != 0
        cur_tl = ((cur_solid_i >> 1) & 1) != 0 if has_tl else None
        mhit = mhit_i != 0
        mdead = mdead_i != 0
        entering = entering_i != 0
        marching = (pbounce < B) & ~mhit & ~mdead
        # shadow lanes march to their light distance, not the grid exit
        tmax_v = jnp.minimum(f32(t_max), sh_st[4]) if n_lights else f32(t_max)

        bigx = jnp.abs(dx) < tiny
        bigy = jnp.abs(dy) < tiny
        bigz = jnp.abs(dz) < tiny

        if coarse is not None:
            (kx, ky, kz, skip_inside, skip_out, can_skip,
             t_land) = coarse_skip(
                coarse, marching, scx, scy, scz, ox, oy, oz, dx, dy, dz,
                ix, iy, iz, bigx, bigy, bigz, (X, Y, Z), tmax_v,
            )
        else:
            kx = ky = kz = scx
            skip_inside = skip_out = jnp.zeros_like(marching)
            can_skip = jnp.zeros_like(marching)

        (t_next, axis, sgn, ex_, ey_, ez_, inside_exact,
         ax_x, ax_y) = exact_step(
            scx, scy, scz, ox, oy, oz, dx, dy, dz, ix, iy, iz,
            bigx, bigy, bigz, (X, Y, Z),
            consts=sc_st if opt else None,
        )

        nx = jnp.where(can_skip, kx, ex_)
        ny = jnp.where(can_skip, ky, ey_)
        nz = jnp.where(can_skip, kz, ez_)
        inside = (can_skip & skip_inside) | (~can_skip & inside_exact)
        new_solid, new_tl = solid_tl_at(nx, ny, nz, inside & marching,
                                        use_edits)

        if has_tl:
            # mesher face-emission rule under translucent (glass) cells:
            # hit entering solid FROM a translucent cell, or exiting a
            # solid INTO a translucent one (trace_proc._trace_kernel's
            # edited-world semantics)
            entering_hit = new_solid & cur_tl & ~can_skip
            exiting_hit = cur_solid & new_tl & ~can_skip
        else:
            entering_hit = new_solid & ~cur_solid & ~can_skip
            exiting_hit = cur_solid & ~new_solid & ~can_skip
        in_range = (t_next >= f32(t_min)) & (t_next <= tmax_v)
        any_hit = marching & in_range & (entering_hit | exiting_hit)
        if opt:
            # `axis` IS the entering-face code in the consts form; the
            # exiting code is the same axis with the parity bit flipped
            nface = jnp.where(entering_hit, axis, axis ^ 1).astype(i32)
        else:
            nface = jnp.where(
                entering_hit,
                axis * 2 + jnp.where(sgn > 0, 0, 1),
                axis * 2 + jnp.where(sgn > 0, 1, 0),
            ).astype(i32)

        rec = any_hit & ~mhit
        dead_exact = ~inside_exact | (t_next > tmax_v)
        dead_now = marching & ~any_hit & (
            (can_skip & skip_out) | (~can_skip & dead_exact)
        )
        if y_cut is not None:
            # in air, moving up (cy non-decreasing), at/above the all-air
            # bound: no hit can follow -> retire as a miss now (records
            # stay zero, identical to marching to the grid exit)
            dead_now = dead_now | (
                marching & ~cur_solid & (dy >= 0.0) & (scy >= y_cut)
            )
        # opt >= 2: drop the resolved-lane freeze selects below — a
        # resolved lane's cell/cur_solid may keep "marching" along its
        # dead direction, and NOTHING reads them again (records are
        # rec-guarded; retire reads records + inst/sh state only; every
        # downstream mask includes `marching`). The single-bounce kernel
        # already lets dead lanes drift (its cell updates are
        # unconditional); this mirrors it. Output-identical
        # (tests/test_march_opt.py gates level 2 as well).
        if n_inst:
            # once the march passes the instance hit, no nearer voxel hit
            # can exist -> resolve now; retire's t-compare picks the
            # instance (exactly what an exhaustive march would conclude).
            # Skip lanes use t_land (entry into the landing cell == the
            # last skipped crossing), so the early-exit fires iff the
            # exhaustive march would have fired it during the skipped
            # span — the region-EXIT t would retire lanes whose very
            # next exact step records a boundary voxel hit.
            t_prog = jnp.where(can_skip, t_land, t_next) if coarse is not None else t_next
            dead_now = dead_now | (
                marching & ~any_hit & (inst_st[0] != 0) & (t_prog > inst_st[1])
            )
        new_pack = new_solid.astype(i32)
        if has_tl:
            new_pack = new_pack | (new_tl.astype(i32) << 1)
        if opt >= 2:
            ncx, ncy, ncz = nx, ny, nz
            ncur = new_pack
        else:
            keep = ~marching
            ncx = jnp.where(keep, scx, nx)
            ncy = jnp.where(keep, scy, ny)
            ncz = jnp.where(keep, scz, nz)
            # int select (was a bitwise i1 select pre-glass — Mosaic
            # rejects select_n on i1 vectors; the packed word is i32)
            ncur = jnp.where(keep, cur_solid_i, new_pack)
        return (
            pbounce, ox, oy, oz, dx, dy, dz, ix, iy, iz,
            ncx, ncy, ncz,
            ncur,
            (mhit | any_hit).astype(i32),
            (mdead | dead_now).astype(i32),
            jnp.where(rec, t_next, t),
            jnp.where(rec, nface, face),
            jnp.where(rec, jnp.where(entering_hit, nx, scx), hx),
            jnp.where(rec, jnp.where(entering_hit, ny, scy), hy),
            jnp.where(rec, jnp.where(entering_hit, nz, scz), hz),
            ((rec & entering_hit) | (~rec & entering)).astype(i32),
            inst_st, sh_st, sc_st, recs, chunks,
        )

    def retire(s):
        (pbounce, ox, oy, oz, dx, dy, dz, ix, iy, iz, scx, scy, scz,
         cur_solid_i, mhit_i, mdead_i, t, face, hx, hy, hz, entering_i,
         inst_st, sh_st, sc_st, recs, chunks) = s
        if rad is not None:
            o_r, o_n = list(recs[0]), list(recs[1])
        else:
            o_t, o_p, o_d, o_i, o_s = (list(r) for r in recs)
        mhit = mhit_i != 0
        mdead = mdead_i != 0
        entering = entering_i != 0
        active = pbounce < B
        resolved = active & (mhit | mdead)
        # shadow sub-phase lanes resolve into a visibility verdict, not a
        # path record
        if n_lights:
            in_sh = sh_st[0] != 0
            path_res = resolved & ~in_sh
            sh_res = resolved & in_sh
        else:
            path_res = resolved

        # --- instance-vs-voxel resolution (do_bounce's use_inst rule:
        # the instance wins iff it hit and the voxel either missed or
        # resolved strictly later) ---
        if n_inst:
            ihit = inst_st[0] != 0
            it_, ij_, iu_, iv_ = inst_st[1], inst_st[2], inst_st[3], inst_st[4]
            inst_wins = ihit & (mdead | (mhit & (it_ < t)))
            vox_hit = mhit & ~inst_wins
            t_fin = jnp.where(inst_wins, it_, t)
        else:
            inst_wins = jnp.zeros(ox.shape, bool)
            vox_hit = mhit
            t_fin = t

        if n_lights:
            # shadow verdict (megakernel's vis rule with tcap == dist-eps:
            # an occluder is any voxel or instance hit strictly before the
            # light): record per-bounce, then resume the saved continuation
            stc = sh_st[4]
            occl = mhit & (t < stc)
            if n_inst:
                occl = occl | (ihit & (it_ < stc))
            if rad is not None:
                # vis folds into the recorded geo: an occluded shadow
                # zeroes the direct term exactly like the XLA path's
                # `direct * vis3` (all factors finite and >= 0)
                for b in range(B - 1):
                    selv = sh_res & (pbounce == b)
                    nw, ncx, ngeo, ne0, ne1, ne2 = o_n[b]
                    o_n[b] = (nw, ncx,
                              jnp.where(selv & occl, f32(0.0), ngeo),
                              ne0, ne1, ne2)
            else:
                svis = (~occl).astype(i32)
                for b in range(B - 1):
                    selv = sh_res & (pbounce == b)
                    sb = o_s[b]
                    o_s[b] = (sb[0], jnp.where(selv, svis, sb[1])) + sb[2:]

        if rad is None:
            packed = (
                vox_hit.astype(i32)
                | (entering.astype(i32) << 1)
                | (face << 2)
                | (hx << 5)
                | (hy << 14)
                | (hz << 23)
            )
            for b in range(B):
                sel = path_res & (pbounce == b)
                o_t[b] = jnp.where(sel, t_fin, o_t[b])
                o_p[b] = jnp.where(sel, packed, o_p[b])
                if n_inst:
                    rp, ru, rv = o_i[b]
                    selw = sel & inst_wins
                    o_i[b] = (
                        jnp.where(selw, ij_, rp),
                        jnp.where(selw, iu_, ru),
                        jnp.where(selw, iv_, rv),
                    )

        # --- sample the next bounce for resolved HITS (voxel hits are
        # statically lambert; instance hits branch on their per-triangle
        # constant metallicity/alpha) ---
        advance = path_res & (mhit | inst_wins) & (pbounce < B - 1)
        seed_b = _combine(seed0, pbounce.astype(jnp.uint32))
        r4 = _draw(seed_b, 4)
        r5 = _draw(seed_b, 5)

        hpx = ox + t_fin * dx
        hpy = oy + t_fin * dy
        hpz = oz + t_fin * dz
        frx = hpx - hx.astype(f32)
        fry = hpy - hy.astype(f32)
        frz = hpz - hz.astype(f32)

        # tri1 selection: fa + fb > 1 in the face's in-plane axes
        a_ax = _sel_face(face, [fc["axes"][f][0] for f in range(6)]).astype(i32)
        b_ax = _sel_face(face, [fc["axes"][f][1] for f in range(6)]).astype(i32)

        def comp(vx, vy, vz, axis_idx):
            return jnp.where(
                axis_idx == 0, vx, jnp.where(axis_idx == 1, vy, vz)
            )

        fa = comp(frx, fry, frz, a_ax)
        fb = comp(frx, fry, frz, b_ax)
        tri1 = fa + fb > 1.0

        def frame_comp(key0, key1, c):
            v0 = _sel_face(face, [fc[key0][f][c] for f in range(6)])
            v1 = _sel_face(face, [fc[key1][f][c] for f in range(6)])
            return jnp.where(tri1, v1, v0)

        def _affine_uv(key):
            # voxel uv via the per-face affine tables (shade.resolve_hit:
            # u = cu0 + ((cu1*fx + cu2*fy) + cu3*fz)) — shared by the
            # glass-alpha lookup and the radiance-record texel
            c0 = _sel_face(face, [fc[key][f][0] for f in range(6)])
            c1 = _sel_face(face, [fc[key][f][1] for f in range(6)])
            c2 = _sel_face(face, [fc[key][f][2] for f in range(6)])
            c3 = _sel_face(face, [fc[key][f][3] for f in range(6)])
            return c0 + ((c1 * frx + c2 * fry) + c3 * frz)

        nx_ = _sel_face(face, [fc["normal"][f][0] for f in range(6)])
        ny_ = _sel_face(face, [fc["normal"][f][1] for f in range(6)])
        nz_ = _sel_face(face, [fc["normal"][f][2] for f in range(6)])
        tx_ = frame_comp("tan0", "tan1", 0)
        ty_ = frame_comp("tan0", "tan1", 1)
        tz_ = frame_comp("tan0", "tan1", 2)
        bx_ = frame_comp("bit0", "bit1", 0)
        by_ = frame_comp("bit0", "bit1", 1)
        bz_ = frame_comp("bit0", "bit1", 2)

        # cosine_weighted_sample_hemisphere + frame alignment
        z = r4
        r = jnp.sqrt(jnp.maximum(f32(0.0), 1.0 - z))
        phi = f32(_2PI) * r5
        h0 = r * jnp.cos(phi)
        h1 = jnp.sqrt(z)
        h2 = r * jnp.sin(phi)
        # formula order mirrors intersect.aligned_cosine_sample exactly
        # ((h0*t + h1*n) + h2*b, then d / sqrt(dot(d, d))) so interpret
        # mode is bit-identical to the staged do_bounce sampling
        ndx = h0 * tx_ + h1 * nx_ + h2 * bx_
        ndy = h0 * ty_ + h1 * ny_ + h2 * by_
        ndz = h0 * tz_ + h1 * nz_ + h2 * bz_
        ln = jnp.sqrt(ndx * ndx + ndy * ndy + ndz * ndz)
        ndx = ndx / ln
        ndy = ndy / ln
        ndz = ndz / ln

        if n_inst:
            # --- instance-surface scatter (formula order mirrors
            # shade.do_bounce's instance branch + intersect.reflect /
            # aligned_cosine_sample so interpret mode stays bit-identical
            # to the staged path) ---
            r = inst_select(ij_)
            v0x, v0y, v0z = r[0], r[1], r[2]
            e1x, e1y, e1z = r[3] - r[0], r[4] - r[1], r[5] - r[2]
            e2x, e2y, e2z = r[6] - r[0], r[7] - r[1], r[8] - r[2]
            texslot = r[9].astype(i32)
            # bary-interpolated uv -> texel -> per-texel alpha byte from
            # the compile-time tables (mirrors shade._fetch_atlas + the
            # asset loader's byte/255 f32 exactly); metallicity is a
            # per-texture constant
            b0u = 1.0 - iu_ - iv_
            u_i = (b0u * r[10] + iu_ * r[12]) + iv_ * r[14]
            v_i = (b0u * r[11] + iu_ * r[13]) + iv_ * r[15]
            tx16 = jnp.clip((u_i * 16.0).astype(i32), 0, 15)
            ty16 = jnp.clip((v_i * 16.0).astype(i32), 0, 15)
            texel = ty16 * 16 + tx16
            aword = jnp.zeros_like(texel)
            metal = jnp.zeros_like(u_i)
            for si in range(len(inst_metal)):
                msk = texslot == si
                wsi = _const_word_tree(inst_alpha_words[si], texel >> 2)
                aword = jnp.where(msk, wsi, aword)
                metal = jnp.where(msk, f32(inst_metal[si]), metal)
            abyte = (aword >> (8 * (texel & 3))) & 0xFF
            ialpha = abyte.astype(f32) / f32(255.0)
            nux = e1y * e2z - e1z * e2y
            nuy = e1z * e2x - e1x * e2z
            nuz = e1x * e2y - e1y * e2x
            nl = jnp.maximum(
                jnp.sqrt((nux * nux + nuy * nuy) + nuz * nuz), f32(1e-30)
            )
            inx, iny, inz = nux / nl, nuy / nl, nuz / nl
            tl = jnp.maximum(
                jnp.sqrt((e1x * e1x + e1y * e1y) + e1z * e1z), f32(1e-30)
            )
            itx, ity, itz = e1x / tl, e1y / tl, e1z / tl
            bux = nuy * e1z - nuz * e1y
            buy = nuz * e1x - nux * e1z
            buz = nux * e1y - nuy * e1x
            bl = jnp.maximum(
                jnp.sqrt((bux * bux + buy * buy) + buz * buz), f32(1e-30)
            )
            ibx, iby, ibz = bux / bl, buy / bl, buz / bl
            # bary-interpolated hit point (do_bounce new_origin, :742)
            b0 = 1.0 - iu_ - iv_
            ipx = (b0 * v0x + iu_ * r[3]) + iv_ * r[6]
            ipy = (b0 * v0y + iu_ * r[4]) + iv_ * r[7]
            ipz = (b0 * v0z + iu_ * r[5]) + iv_ * r[8]
            # scatter branch on per-triangle constants (one draw, :758)
            r0 = _draw(seed_b, 0)
            is_mirror = r0 < metal
            is_trans = (~is_mirror) & (r0 < metal + (1.0 - ialpha))
            ndotd = (inx * dx + iny * dy) + inz * dz
            rfx = dx - 2.0 * ndotd * inx
            rfy = dy - 2.0 * ndotd * iny
            rfz = dz - 2.0 * ndotd * inz
            ldx = h0 * itx + h1 * inx + h2 * ibx
            ldy = h0 * ity + h1 * iny + h2 * iby
            ldz = h0 * itz + h1 * inz + h2 * ibz
            ill = jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz)
            ldx, ldy, ldz = ldx / ill, ldy / ill, ldz / ill
            idx_ = jnp.where(is_mirror, rfx, jnp.where(is_trans, dx, ldx))
            idy_ = jnp.where(is_mirror, rfy, jnp.where(is_trans, dy, ldy))
            idz_ = jnp.where(is_mirror, rfz, jnp.where(is_trans, dz, ldz))
            ndx = jnp.where(inst_wins, idx_, ndx)
            ndy = jnp.where(inst_wins, idy_, ndy)
            ndz = jnp.where(inst_wins, idz_, ndz)
            hpx = jnp.where(inst_wins, ipx, hpx)
            hpy = jnp.where(inst_wins, ipy, hpy)
            hpz = jnp.where(inst_wins, ipz, hpz)

        EM = tuple(ps.edit_mats) if E else ()
        if EM or GE:
            # --- edited-cell constant-material scatter: the hit cell's
            # edit block selects per-face constant metallicity (EM =
            # mirror class, alpha == 1) or per-face constant metallicity
            # + per-texel byte-exact alpha (GE = glass class); draw slot
            # 0 branches mirror/transmit/cosine exactly like
            # shade_resolved does with the fetched texel — so placing
            # the DEFAULT mirror block (quirk Q7) or glass keeps the
            # fused path ---
            keyh0 = (hx << 20) | (hy << 10) | hz
            metal_v = jnp.zeros_like(ox)
            one_f = jnp.ones_like(ox)
            alpha_v = one_f
            if GE:
                # glass alpha: texel from the per-face uv affine (same
                # math the rad block uses), byte words per (block, face)
                gtx = jnp.clip((_affine_uv("cu") * 16.0).astype(i32),
                               0, 15)
                gty = jnp.clip((_affine_uv("cv") * 16.0).astype(i32),
                               0, 15)
                gtexel = gty * 16 + gtx
            for e in range(E):
                mi_e = keyh0 == edits[0][e]
                for blk_id, mets in EM:
                    mb = mi_e & (edits[3][e] == blk_id)
                    metal_v = jnp.where(
                        mb, _sel_face(face, list(mets)), metal_v
                    )
                for blk_id, mets, words6 in GE:
                    mb = mi_e & (edits[3][e] == blk_id)
                    metal_v = jnp.where(
                        mb, _sel_face(face, list(mets)), metal_v
                    )
                    aw = jnp.zeros_like(keyh0)
                    for f_i in range(6):
                        aw = jnp.where(
                            face == f_i,
                            _const_word_tree(words6[f_i], gtexel >> 2),
                            aw,
                        )
                    ab = (aw >> (8 * (gtexel & 3))) & 0xFF
                    alpha_v = jnp.where(
                        mb, ab.astype(f32) / f32(255.0), alpha_v
                    )
            r0v = _draw(seed_b, 0)
            vmirror = vox_hit & (r0v < metal_v)
            # intersect.reflect order: d - 2*dot(n, d)*n (face normal)
            vdot = (nx_ * dx + ny_ * dy) + nz_ * dz
            ndx = jnp.where(vmirror, dx - 2.0 * vdot * nx_, ndx)
            ndy = jnp.where(vmirror, dy - 2.0 * vdot * ny_, ndy)
            ndz = jnp.where(vmirror, dz - 2.0 * vdot * nz_, ndz)
            if GE:
                # transmissive straight-through (reflectivity := 1 on the
                # XLA side; quirk Q12) — shade_resolved's branch rule
                vtrans = (
                    vox_hit & ~vmirror
                    & (r0v < metal_v + (1.0 - alpha_v))
                )
                ndx = jnp.where(vtrans, dx, ndx)
                ndy = jnp.where(vtrans, dy, ndy)
                ndz = jnp.where(vtrans, dz, ndz)
            else:
                vtrans = None
        else:
            vmirror = None
            vtrans = None

        if n_lights:
            # shading normal at the resolved hit (instance override when
            # the instance won) — the light sampler's hemisphere
            vox_lam = vox_hit if vmirror is None else (vox_hit & ~vmirror)
            if vtrans is not None:
                vox_lam = vox_lam & ~vtrans
            if n_inst:
                nsx = jnp.where(inst_wins, inx, nx_)
                nsy = jnp.where(inst_wins, iny, ny_)
                nsz = jnp.where(inst_wins, inz, nz_)
                lam = advance & (
                    vox_lam | (inst_wins & ~is_mirror & ~is_trans)
                )
            else:
                nsx, nsy, nsz = nx_, ny_, nz_
                lam = advance & (vox_lam | ~vox_hit) \
                    if vmirror is not None else advance

            # --- flat light sampling: EXACTLY ops/nee.sample_light_flat's
            # importance math and draw slots 7/8/9 (formula order mirrored
            # so interpret mode matches the XLA sampler's values) ---
            EPSB = f32(0.001)                  # intersect.EPSILON_BLOCK
            r7 = _draw(seed_b, 7)
            r8 = _draw(seed_b, 8)
            r9 = _draw(seed_b, 9)

            def light_imp(j):
                r = light_rows[j]
                vis_j = None
                for vx, vy, vz in (
                    (r[0], r[1], r[2]), (r[3], r[4], r[5]), (r[6], r[7], r[8])
                ):
                    dp = (
                        (vx - hpx) * nsx + (vy - hpy) * nsy
                    ) + (vz - hpz) * nsz
                    vis_j = (dp >= EPSB) if vis_j is None else (
                        vis_j | (dp >= EPSB)
                    )
                cxj, cyj, czj = light_ctr[j]
                dcx, dcy, dcz = cxj - hpx, cyj - hpy, czj - hpz
                d2c = (dcx * dcx + dcy * dcy) + dcz * dcz
                return jnp.where(
                    vis_j,
                    light_rows[j][9] / jnp.maximum(d2c, f32(1e-30)),
                    f32(0.0),
                )

            # evaluate each light's importance ONCE; the W-sum and the
            # selection scan reuse the same traced values (bit-identical,
            # and halves the per-retire selection cost vs re-evaluating)
            imps = [light_imp(j) for j in range(n_lights)]
            W = jnp.zeros_like(hpx)
            for j in range(n_lights):
                W = W + imps[j]
            rW = r7 * W
            cum = jnp.zeros_like(hpx)
            found = jnp.zeros(hpx.shape, bool)
            lidx = jnp.full_like(pbounce, -1)
            impc = jnp.zeros_like(hpx)
            n_cs = 18 if rad is not None else 9
            cs = [jnp.zeros_like(hpx) for _ in range(n_cs)]
            for j in range(n_lights):
                imp_j = imps[j]
                cum = cum + imp_j
                pick = (~found) & (cum > rW)
                lidx = jnp.where(pick, i32(j), lidx)
                impc = jnp.where(pick, imp_j, impc)
                for c in range(n_cs):
                    cs[c] = jnp.where(pick, light_rows[j][c], cs[c])
                found = found | pick

            # uniform point on the chosen triangle (sqrt warp, slots 8/9)
            su = jnp.sqrt(r8)
            b0_ = 1.0 - su
            b1_ = su * (1.0 - r9)
            b2_ = su * r9
            yx = (b0_ * cs[0] + b1_ * cs[3]) + b2_ * cs[6]
            yy = (b0_ * cs[1] + b1_ * cs[4]) + b2_ * cs[7]
            yz = (b0_ * cs[2] + b1_ * cs[5]) + b2_ * cs[8]
            tox, toy, toz = yx - hpx, yy - hpy, yz - hpz
            sdist = jnp.sqrt((tox * tox + toy * toy) + toz * toz)
            sden = jnp.maximum(sdist, f32(1e-30))
            sdx_, sdy_, sdz_ = tox / sden, toy / sden, toz / sden
            cosx_ = (sdx_ * nsx + sdy_ * nsy) + sdz_ * nsz
            # shadow t ceiling: dist - eps, megakernel's vis-rule epsilon
            stc_new = sdist - (f32(1e-3) + f32(1e-3) * sdist)
            has_s = (
                found & (impc > 0.0) & (sdist > f32(1e-6)) & (cosx_ > 0.0)
            )
            launch = lam & has_s
            if rad is not None:
                # --- in-kernel-radiance NEE records: everything the XLA
                # direct term needs EXCEPT the hit reflectivity texel,
                # with formula order mirroring ops/nee.sample_light_flat
                # + ops/shade.shade_resolved exactly ---
                r_scale, r_clamp, r_gain = rad[0], rad[1], rad[2]
                light_em = rad[3]
                carea = cs[10]
                ltex = cs[11]
                # chosen-triangle normal + cos_light (sample_light_flat)
                le1x, le1y, le1z = cs[3] - cs[0], cs[4] - cs[1], cs[5] - cs[2]
                le2x, le2y, le2z = cs[6] - cs[0], cs[7] - cs[1], cs[8] - cs[2]
                lnx = le1y * le2z - le1z * le2y
                lny = le1z * le2x - le1x * le2z
                lnz = le1x * le2y - le1y * le2x
                lnn = jnp.maximum(
                    jnp.sqrt((lnx * lnx + lny * lny) + lnz * lnz), f32(1e-30)
                )
                lnx, lny, lnz = lnx / lnn, lny / lnn, lnz / lnn
                cos_l = -((sdx_ * lnx + sdy_ * lny) + sdz_ * lnz)
                w_ls = jnp.clip(impc / f32(r_scale), 0.0, f32(r_clamp))
                lvalid = (
                    (impc > 0.0) & (w_ls > 0.0) & (cos_l > 0.0)
                    & (sdist > f32(1e-6)) & (carea > 0.0)
                )
                # bitwise select: Mosaic rejects select_n on i1 vectors
                lsw = jnp.where(lvalid, w_ls, f32(0.0))
                w_rec = jnp.where(lam, lsw, f32(0.0))
                ok_ = lvalid & lam & (cosx_ > 0.0)
                inv_pdf = (carea * W) / jnp.maximum(impc, f32(1e-30))
                geo = (cos_l * inv_pdf) / jnp.maximum(
                    sdist * sdist, f32(1e-12)
                )
                geo_rec = jnp.where(ok_, geo, f32(0.0))
                cxp_rec = cosx_ / f32(np.pi)
                # light emission texel from the sampled uv via the static
                # per-texture emissive palette (Scene.light_em): e_y =
                # (gain * te) * cos_l — the one fetch shade_resolved did
                # for the direct term, now a constant select tree
                uvy_u = (b0_ * cs[12] + b1_ * cs[14]) + b2_ * cs[16]
                uvy_v = (b0_ * cs[13] + b1_ * cs[15]) + b2_ * cs[17]
                ltx = jnp.clip((uvy_u * 16.0).astype(i32), 0, 15)
                lty = jnp.clip((uvy_v * 16.0).astype(i32), 0, 15)
                ltexel = lty * 16 + ltx
                ter = jnp.zeros_like(hpx)
                teg = jnp.zeros_like(hpx)
                teb = jnp.zeros_like(hpx)
                for members, widx, pal in light_em:
                    mg = None
                    for mid in members:
                        mm = ltex == f32(mid)
                        mg = mm if mg is None else (mg | mm)
                    pword = _const_word_tree(widx, ltexel >> 2)
                    pidx = (pword >> (8 * (ltexel & 3))) & 0xFF
                    ter = jnp.where(
                        mg, _const_f32_tree([p[0] for p in pal], pidx), ter)
                    teg = jnp.where(
                        mg, _const_f32_tree([p[1] for p in pal], pidx), teg)
                    teb = jnp.where(
                        mg, _const_f32_tree([p[2] for p in pal], pidx), teb)
                ey0 = (f32(r_gain) * ter) * cos_l
                ey1 = (f32(r_gain) * teg) * cos_l
                ey2 = (f32(r_gain) * teb) * cos_l
                for b in range(B - 1):
                    seli = advance & (pbounce == b)
                    nw, ncx, ngeo, ne0, ne1, ne2 = o_n[b]
                    o_n[b] = (
                        jnp.where(seli, w_rec, nw),
                        jnp.where(seli, cxp_rec, ncx),
                        jnp.where(seli, geo_rec, ngeo),
                        jnp.where(seli, ey0, ne0),
                        jnp.where(seli, ey1, ne1),
                        jnp.where(seli, ey2, ne2),
                    )
            else:
                # record the chosen index whenever a light was selected
                # (the XLA side recomputes w from it, matching the
                # pure-XLA split estimator's weight even where the direct
                # term is zero and no shadow ray marches, e.g.
                # cos_x <= 0); vis defaults to 1 for unmarched lanes —
                # their direct term is zero by the XLA validity mask, so
                # the bit never matters
                recorded = found & (impc > 0.0)
                for b in range(B - 1):
                    seli = advance & (pbounce == b)
                    sb = o_s[b]
                    rec_b = (
                        jnp.where(seli, jnp.where(recorded, lidx, -1), sb[0]),
                        jnp.where(seli & ~launch, 1, sb[1]),
                    )
                    if nee_pdf:
                        # pdf record: the chosen light's importance and the
                        # selection total — exactly sample_light_flat's
                        # imp_c and W (same summation order), so consuming
                        # them in XLA is bit-identical to the recompute
                        # (unselected rows record imp_c = 0 -> w = 0,
                        # valid = False, the same terminal values the
                        # all-false one-hot yields)
                        rec_b = rec_b + (
                            jnp.where(seli,
                                      jnp.where(recorded, impc, f32(0.0)),
                                      sb[2]),
                            jnp.where(seli, W, sb[3]),
                        )
                    o_s[b] = rec_b

        if rad is not None:
            # --- per-bounce radiance records (code, cos_in, spdf/rpdf) ---
            r_inst_ids = rad[4]
            u_v = _affine_uv("cu")
            v_v = _affine_uv("cv")
            vtx = jnp.clip((u_v * 16.0).astype(i32), 0, 15)
            vty = jnp.clip((v_v * 16.0).astype(i32), 0, 15)
            texel_v = vty * 16 + vtx
            # hit block id: worldgen grass/stone via the above-cell
            # density (dda_proc._hit_blocks: pure worldgen, DIVISION form,
            # no edit override on the above cell) + edit override at the
            # hit cell itself
            s_ = f32(ps.noise_scale)
            wxh = hx.astype(f32) + gox
            wyh = hy.astype(f32) + goy
            wzh = hz.astype(f32) + goz
            dens_above = _simplex3_seeded(
                wxh / s_, (wyh + 1.0) / s_, wzh / s_, seed_mix, opt=opt
            ) - (wyh + 1.0) / f32(ps.y_falloff)
            above = dens_above > thr
            blk = jnp.where(above, i32(ps.stone), i32(ps.grass))
            if E:
                keyh = (hx << 20) | (hy << 10) | hz
                ed_m = jnp.zeros(hx.shape, bool)
                ed_b = jnp.zeros_like(blk)
                for e in range(E):
                    mi = keyh == edits[0][e]
                    ed_m = ed_m | mi
                    ed_b = jnp.where(mi, edits[3][e], ed_b)
                blk = jnp.where(ed_m, ed_b, blk)
            tmat = blk * 6 + face
            texel_r = texel_v
            br_code = jnp.zeros_like(face)
            if vmirror is not None:
                br_code = jnp.where(vmirror, 1, br_code)
            if vtrans is not None:
                br_code = jnp.where(vtrans, 2, br_code)
            if n_inst:
                tid_i = jnp.zeros_like(face)
                for si, t_id in enumerate(r_inst_ids):
                    tid_i = jnp.where(texslot == si, i32(int(t_id)), tid_i)
                tmat = jnp.where(inst_wins, tid_i, tmat)
                texel_r = jnp.where(inst_wins, texel, texel_r)
                br_code = jnp.where(
                    inst_wins & is_mirror, 1,
                    jnp.where(inst_wins & is_trans, 2, br_code),
                )
            hitb = vox_hit | inst_wins
            code = jnp.where(
                hitb,
                hitb.astype(i32) | (br_code << 1)
                | ((tmat * 256 + texel_r) << 3),
                0,
            )
            # cos_in = -dot(direction, shading normal) (shade_resolved's
            # emissivity cosine; instance normal when the instance won)
            if n_inst:
                nrx = jnp.where(inst_wins, inx, nx_)
                nry = jnp.where(inst_wins, iny, ny_)
                nrz = jnp.where(inst_wins, inz, nz_)
            else:
                nrx, nry, nrz = nx_, ny_, nz_
            cosin = -((dx * nrx + dy * nry) + dz * nrz)
            # spdf/rpdf ratio: cos_theta of the cosine-sampled NEW dir
            # over itself (shade_resolved's literal reference arithmetic —
            # NaN at cos 0, exactly like the XLA path)
            ct = (ndx * nx_ + ndy * ny_) + ndz * nz_
            if n_inst:
                ct = jnp.where(
                    inst_wins, (ldx * inx + ldy * iny) + ldz * inz, ct
                )
            ctp = ct / f32(np.pi)
            sr_rec = ctp / ctp
            for b in range(B):
                selr = path_res & (pbounce == b)
                rc, rci, rsr = o_r[b]
                o_r[b] = (
                    jnp.where(selr, code, rc),
                    jnp.where(selr, cosin, rci),
                    jnp.where(selr, sr_rec, rsr),
                )
        else:
            for b in range(1, B):
                sel = advance & (pbounce == b - 1)
                odx, ody, odz = o_d[b - 1]
                o_d[b - 1] = (
                    jnp.where(sel, ndx, odx),
                    jnp.where(sel, ndy, ody),
                    jnp.where(sel, ndz, odz),
                )

        # --- transition ---
        # without lights: advance lanes re-init at the hit point with the
        # sampled continuation; with lights, a sampled lane FIRST marches
        # its shadow ray (launch), and a shadow-resolved lane resumes the
        # saved continuation (sh_done) — both are fresh marches
        if n_lights:
            sh_done = sh_res
            adv_direct = advance & ~launch
            relaunch = advance | sh_done
            n_dx = jnp.where(
                launch, sdx_,
                jnp.where(advance, ndx, jnp.where(sh_done, sh_st[1], dx)),
            )
            n_dy = jnp.where(
                launch, sdy_,
                jnp.where(advance, ndy, jnp.where(sh_done, sh_st[2], dy)),
            )
            n_dz = jnp.where(
                launch, sdz_,
                jnp.where(advance, ndz, jnp.where(sh_done, sh_st[3], dz)),
            )
            n_pbounce = jnp.where(
                launch, pbounce,
                jnp.where(
                    adv_direct | sh_done, pbounce + 1,
                    jnp.where(path_res, i32(B), pbounce),
                ),
            )
            n_sh_st = (
                (launch | (in_sh & ~sh_done)).astype(i32),
                jnp.where(launch, ndx, sh_st[1]),
                jnp.where(launch, ndy, sh_st[2]),
                jnp.where(launch, ndz, sh_st[3]),
                jnp.where(
                    launch, stc_new,
                    jnp.where(sh_done, f32(t_max), sh_st[4]),
                ),
            )
        else:
            relaunch = advance
            n_dx = jnp.where(advance, ndx, dx)
            n_dy = jnp.where(advance, ndy, dy)
            n_dz = jnp.where(advance, ndz, dz)
            n_pbounce = jnp.where(
                resolved, jnp.where(advance, pbounce + 1, i32(B)), pbounce
            )
            n_sh_st = ()
        n_ox = jnp.where(advance, hpx, ox)
        n_oy = jnp.where(advance, hpy, oy)
        n_oz = jnp.where(advance, hpz, oz)

        (icx, icy, icz, icur, imhit, imdead, it, iface, ihx, ihy, ihz,
         ient, iix, iiy, iiz, isc) = init_march(n_ox, n_oy, n_oz,
                                                n_dx, n_dy, n_dz, relaunch)

        def merge_f(new, old):
            return jnp.where(relaunch, new, old)

        def merge_b(new, old):
            # bitwise select: Mosaic rejects select_n on i1 vectors
            return (relaunch & new) | (~relaunch & old)

        if n_inst:
            nihit, nit, nij, niu, niv = inst_intersect(
                n_ox, n_oy, n_oz, n_dx, n_dy, n_dz
            )
            n_inst_st = (
                merge_b(nihit, inst_st[0] != 0).astype(i32),
                merge_f(nit, inst_st[1]),
                merge_f(nij, inst_st[2]),
                merge_f(niu, inst_st[3]),
                merge_f(niv, inst_st[4]),
            )
        else:
            n_inst_st = ()

        return (
            n_pbounce, n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
            merge_f(iix, ix), merge_f(iiy, iy), merge_f(iiz, iz),
            merge_f(icx, scx), merge_f(icy, scy), merge_f(icz, scz),
            merge_f(icur, cur_solid_i),
            merge_b(imhit, mhit & ~resolved).astype(i32),
            merge_b(imdead, mdead & ~resolved).astype(i32),
            merge_f(it, jnp.where(resolved, f32(0.0), t)),
            merge_f(iface, jnp.where(resolved, 0, face)),
            merge_f(ihx, jnp.where(resolved, 0, hx)),
            merge_f(ihy, jnp.where(resolved, 0, hy)),
            merge_f(ihz, jnp.where(resolved, 0, hz)),
            merge_b(ient, entering & ~resolved).astype(i32),
            n_inst_st, n_sh_st,
            tuple(merge_f(a, b) for a, b in zip(isc, sc_st)),
            (tuple(o_r), tuple(o_n)) if rad is not None else
            (tuple(o_t), tuple(o_p), tuple(o_d), tuple(o_i), tuple(o_s)),
            chunks,
        )

    def _chunk(s, use_edits):
        for _ in range(max(1, unroll)):
            s = march_step(s, use_edits)
        return s

    if gate:
        # per-chunk edit gate (E > EDIT_GATE_MIN, see trace_proc
        # _make_near): the march pays the O(E) per-step compare only in
        # chunks whose lanes can reach an edit-cluster box; retire
        # (1 eval per chunk) keeps edits unconditionally — its re-init
        # cell and the hit-material compares must stay exact everywhere
        assert coarse is None, "edit gate assumes no baked coarse skips"
        from vrv_tpu.ops.pallas.trace_proc import _make_near

        near_fn = _make_near(ebox_ref, max(1, unroll))

        def _gated_chunk(s):
            # marching lanes only: pbounce < B and unresolved (drifting
            # resolved-lane cells otherwise pollute the near test)
            act = (s[0] < B) & (s[14] == 0) & (s[15] == 0)
            return jax.lax.cond(
                near_fn(s[10], s[11], s[12], act),
                lambda ss: _chunk(ss, True),
                lambda ss: _chunk(ss, False),
                s,
            )
    else:
        def _gated_chunk(s):
            return _chunk(s, True)

    def body(s):
        s = _gated_chunk(s)
        # retire is the identity when nothing resolved this chunk, and in
        # the tail (a few long rays marching) most chunks resolve nothing
        # — gate the whole retire (sampling + re-init incl. a noise eval)
        # behind a block-level branch
        if retire_cond:
            pbounce, mhit_i, mdead_i = s[0], s[14], s[15]
            any_res = (
                jnp.max(
                    jnp.where(
                        (pbounce < B) & ((mhit_i | mdead_i) != 0), 1, 0
                    )
                )
                > 0
            )
            s = jax.lax.cond(any_res, retire, lambda ss: ss, s)
        else:
            s = retire(s)
        return s[:-1] + (s[-1] + 1,)

    s = jax.lax.while_loop(cond, body, state)
    recs = s[-2]
    k = 0
    if rad is not None:
        o_r, o_n = recs
        for b in range(B):
            for v in o_r[b]:
                out_refs[k][:] = v
                k += 1
        for b in range(B - 1) if n_lights else []:
            for v in o_n[b]:
                out_refs[k][:] = v
                k += 1
    else:
        o_t, o_p, o_d, o_i, o_s = recs
        for b in range(B):
            out_refs[k][:] = o_p[b]
            out_refs[k + 1][:] = o_t[b]
            k += 2
        for b in range(B - 1):
            odx, ody, odz = o_d[b]
            out_refs[k][:] = odx
            out_refs[k + 1][:] = ody
            out_refs[k + 2][:] = odz
            k += 3
        for b in range(B) if n_inst else []:
            rp, ru, rv = o_i[b]
            out_refs[k][:] = rp
            out_refs[k + 1][:] = ru
            out_refs[k + 2][:] = rv
            k += 3
        for b in range(B - 1) if n_lights else []:
            for v in o_s[b]:
                out_refs[k][:] = v
                k += 1
    # final pbounce: >= B iff the lane resolved all its bounces (pass-1
    # completion mask for the tail restart)
    out_refs[k][:] = s[0]


@functools.partial(
    jax.jit,
    static_argnames=("ps", "t_min", "t_max", "n_bounces", "interpret",
                     "unroll", "coarse", "hw", "retire_cond", "n_inst",
                     "inst_mat", "step_cap", "n_lights", "nee_pdf", "opt",
                     "rad"),
)
def _path_pallas_flat(ps, o, d, seeds, edit_args, t_min, t_max, n_bounces,
                      interpret=False, unroll=1, coarse=None, hw=None,
                      retire_cond=True, inst_args=(), n_inst=0, inst_mat=None,
                      step_cap=0, done=None, light_args=(), n_lights=0,
                      nee_pdf=False, opt=False, rad=None):
    br = BLOCK_ROWS
    n = o.shape[0]
    B = n_bounces
    if hw is not None:
        R, Wd = hw
        rows_pad = (R + br - 1) // br * br
        lanes_pad = (Wd + LANES - 1) // LANES * LANES

        def prep(x):
            return jnp.pad(
                x.reshape(R, Wd), ((0, rows_pad - R), (0, lanes_pad - Wd))
            )

        grid = (rows_pad // br, lanes_pad // LANES)
        spec = pl.BlockSpec((br, LANES), lambda i, j: (i, j))
        out_shape2 = (rows_pad, lanes_pad)

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
        out_shape2 = (rows_pad, LANES)

        def post(x):
            return x.reshape(-1)[:n]

    ox, oy, oz = prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2])
    dx, dy, dz = prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2])
    sd = prep(seeds)
    done_args = () if done is None else (prep(done.astype(jnp.int32)),)

    out_shapes = []
    if rad is not None:
        # radiance records: per bounce (code i32, cos_in f32, sr f32);
        # per non-last bounce with lights (w, cos_x/pi, geo, e_y rgb) f32
        for b in range(B):
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))
        for b in range(B - 1) if n_lights else []:
            for _ in range(6):
                out_shapes.append(
                    jax.ShapeDtypeStruct(out_shape2, jnp.float32))
    else:
        for b in range(B):
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))
        for b in range(B - 1):
            for _ in range(3):
                out_shapes.append(
                    jax.ShapeDtypeStruct(out_shape2, jnp.float32))
        for b in range(B) if n_inst else []:
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))
        for b in range(B - 1) if n_lights else []:
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))
            if nee_pdf:
                out_shapes.append(
                    jax.ShapeDtypeStruct(out_shape2, jnp.float32))
                out_shapes.append(
                    jax.ShapeDtypeStruct(out_shape2, jnp.float32))
    out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))  # pbounce
    n_out = len(out_shapes)

    from jax.experimental.pallas import tpu as pltpu

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(
            _path_kernel, ps=ps, t_min=t_min, t_max=t_max, n_bounces=B,
            unroll=unroll, coarse=coarse, retire_cond=retire_cond,
            n_inst=n_inst, inst_mat=inst_mat, step_cap=step_cap,
            has_done=done is not None, n_lights=n_lights, nee_pdf=nee_pdf,
            opt=opt, rad=rad,
        ),
        grid=grid,
        in_specs=(
            [smem] * len(edit_args) + [smem] * len(inst_args)
            + [smem] * len(light_args)
            + [spec] * (7 + len(done_args))
        ),
        out_specs=[spec] * n_out,
        out_shape=out_shapes,
        interpret=interpret,
    )(*edit_args, *inst_args, *light_args,
      ox, oy, oz, dx, dy, dz, sd, *done_args)
    return [post(x) for x in outs]


def inst_smem_args(inst, tex_ids):
    """SMEM per-triangle rows for the in-kernel instance pass.

    One (cap*16,) f32 array: [v0(3) | v1(3) | v2(3) | texslot | uv(3x2)]
    per triangle; invalid (padding) rows are zeroed, which
    Moller-Trumbore rejects via det == 0. texslot indexes the static
    per-texture material tables (inst_static's tex-id tuple)."""
    tri = inst["tri"].astype(jnp.float32)                  # (cap, 3, 3)
    valid = inst["valid"]
    ids = jnp.asarray(tex_ids, jnp.int32)
    slot = jnp.argmax(
        (inst["t"].astype(jnp.int32)[:, None] == ids[None, :]).astype(jnp.int32),
        axis=1,
    ).astype(jnp.float32)
    row = jnp.concatenate(
        [
            tri.reshape(-1, 9),
            slot[:, None],
            inst["uv"].astype(jnp.float32).reshape(-1, 6),
        ],
        axis=1,
    )
    row = jnp.where(valid[:, None], row, 0.0)
    return (row.reshape(-1),)


def light_smem_args(flat):
    """SMEM rows for in-kernel NEE:
    [v0(3)|v1(3)|v2(3)|power|area|tex|uv0(2)|uv1(2)|uv2(2)] (18 floats)
    per light from the scene's flat light list (ops/nee.sample_light_flat's
    padded arrays — pad rows have power 0 and are never selected).
    area/tex/uv feed the in-kernel-radiance direct term (pdf area +
    emission texel); the plain in-kernel-NEE path reads only the first
    10."""
    tri = flat["tri"].astype(jnp.float32)                  # (L, 3, 3)
    row = jnp.concatenate(
        [
            tri.reshape(-1, 9),
            flat["power"].astype(jnp.float32)[:, None],
            flat["area"].astype(jnp.float32)[:, None],
            flat["tex"].astype(jnp.float32)[:, None],
            flat["uv"].astype(jnp.float32).reshape(-1, 6),
        ],
        axis=1,
    )
    return (row.reshape(-1),)


def trace_path_pallas(ps, origin, direction, seeds, n_bounces,
                      t_min=0.001, t_max=1000.0, pd=None, interpret=False,
                      unroll=None, hw=None, retire_cond=True, inst=None,
                      inst_static=None, step_cap=0, lights=None,
                      nee_pdf=False, march_opt=True,
                      radiance=False, light_em=None, nee_scale=10.0,
                      nee_clamp=0.5, emission_gain=1000.0):
    """Trace a FULL path (n_bounces bounces) per ray in one kernel.

    Preconditions (caller-checked): worldgen scene whose edits are all
    air-or-opaque-lambert (ps.edits_lambert), murmur3 RNG, lambert-only
    reachable voxel materials. Entity instances are supported in-kernel
    when every instance texture has CONSTANT metallicity and alpha
    (scene.set_instances checks): triangles ride in SMEM, each bounce
    segment runs one Moller-Trumbore pass against them, the march
    early-exits past the instance hit, and instance-surface scatter
    (mirror/transmit/lambert on the per-triangle constants) is sampled
    in-kernel — the reference's TLAS carries entity meshes in the same
    28-fps kernel (main.rs:86-101, scene.rs:209-386).

    lights: optional flat light dict (scene.bvh_device['flat']) —
    enables IN-KERNEL split NEE: per non-last bounce the kernel samples
    a light (sample_light_flat's importance math, draw slots 7/8/9),
    marches the shadow ray to its light distance as a sub-phase, and
    returns (chosen index, visibility bit); the XLA side recomputes the
    direct term from the index + the same draws and multiplies by the
    recorded visibility — no separate shadow kernel launch, and a
    block's cost is max over lanes of path+shadow steps instead of the
    two kernels' independent maxima.

    Returns (traces, dirs, ihits, nee): traces[b] is a dda.TraceResult
    for bounce b; dirs[b] (b in 1..n_bounces-1) is the in-kernel-sampled
    direction the kernel marched for bounce b ((n, 3) float32; zero for
    rays whose path ended earlier); ihits[b] is an
    ops.instances.InstanceHit (None when inst is None) recording where
    the instance won the bounce; nee is None without lights, else a list
    of (sel_idx (n,) i32 [-1 = no sample], vis (n,) bool) per non-last
    bounce — with nee_pdf additionally (imp_c (n,) f32, W (n,) f32): the
    chosen light's importance and the selection total, recorded so the
    XLA direct term can skip the (n, L) importance recompute entirely.
    """
    from vrv_tpu.ops.dda import TraceResult
    from vrv_tpu.ops.dda_proc import _hit_blocks, assemble

    if ps.n_edits and not ps.edits_fused:
        raise ValueError(
            "path kernel requires air, opaque-lambert, or constant-"
            "material-opaque (ps.edit_mats) edits; the caller must fall "
            "back to the staged kernels")
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    sd = seeds.reshape(-1).astype(jnp.uint32)
    B = int(n_bounces)
    import vrv_tpu.ops.pallas.trace_proc as _tp

    # zero-row tables degrade to the feature-off path: the kernel's
    # positional ref unpack skips the SMEM slot when n_inst/n_lights is 0,
    # so passing the (empty) arrays anyway would shift every later ref
    if inst is not None and int(inst["tri"].shape[0]) == 0:
        inst = None
    if lights is not None and int(lights["tri"].shape[0]) == 0:
        lights = None
    n_inst = 0
    inst_args = ()
    inst_mat = None
    if inst is not None:
        if inst_static is None:
            raise ValueError(
                "in-kernel instances need inst_static (tex ids + constant "
                "material tables from scene.set_instances)")
        n_inst = int(inst["tri"].shape[0])
        inst_args = inst_smem_args(inst, inst_static[0])
        inst_mat = (inst_static[1], inst_static[2])
    n_lights = 0
    light_args = ()
    if lights is not None and B > 1:
        n_lights = int(lights["tri"].shape[0])
        light_args = light_smem_args(lights)
    rad = None
    if radiance:
        if n_lights and not light_em:
            raise ValueError(
                "in-kernel radiance with lights needs the static light "
                "emissive palettes (Scene.light_em)")
        rad = (
            float(nee_scale), float(nee_clamp), float(emission_gain),
            tuple(light_em) if (light_em and n_lights) else (),
            tuple(int(t) for t in inst_static[0]) if n_inst else (),
        )
    common = dict(
        interpret=interpret or _tp.INTERPRET,
        unroll=UNROLL if unroll is None else unroll,
        coarse=(ps.coarse_const or None) if ps.use_coarse else None,
        hw=hw, retire_cond=retire_cond,
        inst_args=inst_args, n_inst=n_inst, inst_mat=inst_mat,
        light_args=light_args, n_lights=n_lights,
        nee_pdf=bool(nee_pdf and n_lights and not radiance),
        rad=rad,
        opt=int(march_opt),
    )
    ea = edit_smem_args(ps, pd)
    outs = _path_pallas_flat(
        ps, o, d, sd, ea, float(t_min), float(t_max), B,
        step_cap=int(step_cap), **common,
    )
    if step_cap:
        # tail restart: a block's cost is max over its 1024 lanes of total
        # path steps, so one grazing ray makes the whole block march its
        # tail. Pass 1 stops at ~step_cap steps; pass 2 re-traces ONLY the
        # unfinished lanes from scratch with the full budget (deterministic
        # per-lane state machines -> bit-identical to an uncapped single
        # pass; tests/test_path_cap.py), and blocks whose lanes all
        # finished exit before their first chunk. The XLA rows tracer's
        # compaction-by-restart, rebuilt for the fused kernel (VERDICT r2
        # item 4 / docs/PERF.md roadmap 1).
        done = outs[-1] >= B
        outs2 = _path_pallas_flat(
            ps, o, d, sd, ea, float(t_min), float(t_max), B,
            done=done, **common,
        )
        outs = [
            jnp.where(done, a, b) for a, b in zip(outs[:-1], outs2[:-1])
        ]
    else:
        outs = outs[:-1]
    if radiance:
        # radiance-record mode: (codes, cos_ins, srs, nee_recs) — the
        # caller's XLA side is one packed-atlas row fetch per bounce plus
        # the exact accumulation chain (render/megakernel.py)
        codes, cosins, srs = [], [], []
        k = 0
        for b in range(B):
            codes.append(outs[k].reshape(shape))
            cosins.append(outs[k + 1].reshape(shape))
            srs.append(outs[k + 2].reshape(shape))
            k += 3
        nrecs = None
        if n_lights:
            nrecs = []
            for b in range(B - 1):
                nrecs.append(tuple(x.reshape(shape) for x in outs[k:k + 6]))
                k += 6
        return codes, cosins, srs, nrecs
    pw = assemble(ps, pd)
    traces = []
    for b in range(B):
        packed = outs[2 * b]
        t = outs[2 * b + 1]
        hit = (packed & 1) == 1
        entering = ((packed >> 1) & 1) == 1
        face = (packed >> 2) & 7
        hx = (packed >> 5) & 511
        hy = (packed >> 14) & 511
        hz = (packed >> 23) & 511
        blocks = _hit_blocks(pw, hx, hy, hz, hit)
        cell = jnp.stack([hx, hy, hz], axis=-1)
        traces.append(TraceResult(
            hit=hit.reshape(shape),
            t=t.reshape(shape),
            block=blocks.reshape(shape),
            face=face.reshape(shape),
            cell=cell.reshape(shape + (3,)),
            entering=entering.reshape(shape),
        ))
    dirs = []
    k = 2 * B
    for b in range(B - 1):
        dirs.append(jnp.stack(outs[k:k + 3], axis=-1).reshape(shape + (3,)))
        k += 3
    ihits = None
    if n_inst:
        from vrv_tpu.ops.instances import InstanceHit

        ihits = []
        for b in range(B):
            prim = outs[k].reshape(shape)
            iu = outs[k + 1].reshape(shape)
            iv = outs[k + 2].reshape(shape)
            k += 3
            won = prim >= 0
            ihits.append(InstanceHit(
                hit=won,
                t=jnp.where(won, traces[b].t, 0.0),
                prim=jnp.maximum(prim, 0),
                bary=jnp.stack([iu, iv], axis=-1),
            ))
    nee = None
    if n_lights:
        nee = []
        for b in range(B - 1):
            rec = (outs[k].reshape(shape), (outs[k + 1] != 0).reshape(shape))
            k += 2
            if nee_pdf:
                # (chosen importance, selection total W) — lets the XLA
                # direct term skip the (n, L) importance recompute
                rec = rec + (outs[k].reshape(shape),
                             outs[k + 1].reshape(shape))
                k += 2
            nee.append(rec)
    return traces, dirs, ihits, nee
