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

Scope (checked by the caller, render/megakernel.py): edit-free worldgen
scenes with NO lights, NO entity instances, murmur3 RNG, and
lambert-only materials for the reachable blocks (grass/stone: verified
metallicity == 0 and alpha == 1 at asset load, so the scatter branch of
shade.do_bounce is statically lambertian and needs no texel access).
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
marched.
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
    edit_smem_args,
)

_2PI = float(2.0 * np.pi)


def _face_consts():
    """Per-face frame constants as python float lists (selected in-kernel
    with 6-way wheres — shade._FACE_CONST's rows, minus the uv tables the
    kernel doesn't need)."""
    from vrv_tpu.ops import dda

    return dict(
        normal=dda.FACE_NORMALS.tolist(),
        tan0=dda.FACE_TANGENTS[:, 0].tolist(),
        tan1=dda.FACE_TANGENTS[:, 1].tolist(),
        bit0=dda.FACE_BITANGENTS[:, 0].tolist(),
        bit1=dda.FACE_BITANGENTS[:, 1].tolist(),
        axes=dda.FACE_PLANE_AXES.tolist(),
    )


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
    ps, t_min, t_max, n_bounces, unroll, coarse, retire_cond=True,
):
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

    if E:
        (ek_ref, ef_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         seed_ref), out_refs = refs[:9], refs[9:]
        edits = _edit_overrides(ek_ref, ef_ref, E)
    else:
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         seed_ref), out_refs = refs[:7], refs[7:]

    seed0 = seed_ref[:]

    def solid_at(cx, cy, cz, inside):
        # eligibility (edits_lambert, checked by trace_path_pallas)
        # guarantees every edit block is air or opaque-lambert, so
        # translucent == ~solid holds and the solid override suffices
        wx = cx.astype(f32) + gox
        wy = cy.astype(f32) + goy
        wz = cz.astype(f32) + goz
        dens = (
            _simplex3_seeded(wx * inv_scale, wy * inv_scale, wz * inv_scale, seed_mix)
            - wy * inv_falloff
        )
        s = dens > thr
        if E:
            s, _, _ = _apply_edits(cx, cy, cz, s, edits)
        return s & inside

    def occ_read(level, bx, by, bz):
        (Bx, By, Bz), words = level
        idx = (bx * By + by) * Bz + bz
        word = _const_word_tree(words, idx >> 5)
        return (word & (jnp.int32(1) << (idx & 31))) != 0

    def init_march(ox, oy, oz, dx, dy, dz, want):
        """Fresh march state for rays in `want` (dda_proc._init formulas).

        Returns (cx, cy, cz (i32), cur_solid, mhit, mdead (bool),
        t (f32), face (i32), hx, hy, hz (i32), entering (bool)) — the
        per-bounce trace record accumulators start zeroed.
        """
        bigx = jnp.abs(dx) < tiny
        bigy = jnp.abs(dy) < tiny
        bigz = jnp.abs(dz) < tiny
        ix = 1.0 / jnp.where(bigx, tiny, dx)
        iy = 1.0 / jnp.where(bigy, tiny, dy)
        iz = 1.0 / jnp.where(bigz, tiny, dz)

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
        valid = (t0 <= t_exit) & (t0 <= f32(t_max)) & ~degenerate & want

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
        return (
            cx, cy, cz, cur_solid,
            hit0,                                   # mhit
            ~valid & want,                          # mdead (invalid from start)
            jnp.where(hit0, t_enter, f32(0.0)),     # t
            jnp.where(hit0, entry_face.astype(i32), zero),
            jnp.where(hit0, cx, zero),
            jnp.where(hit0, cy, zero),
            jnp.where(hit0, cz, zero),
            hit0,                                   # entering
            ix, iy, iz,
        )

    # ---- initial state ----
    ox0, oy0, oz0 = ox_ref[:], oy_ref[:], oz_ref[:]
    dx0, dy0, dz0 = dx_ref[:], dy_ref[:], dz_ref[:]
    all_rays = jnp.ones(ox0.shape, bool)
    (cx, cy, cz, cur_solid, mhit, mdead, t, face, hx, hy, hz, entering,
     ix, iy, iz) = init_march(ox0, oy0, oz0, dx0, dy0, dz0, all_rays)

    zf = jnp.zeros_like(ox0)
    zi = jnp.zeros_like(cx)
    # per-bounce output accumulators
    out_t = [zf for _ in range(B)]
    out_packed = [zi for _ in range(B)]
    out_d = [(zf, zf, zf) for _ in range(B - 1)]  # dirs for bounces 1..B-1

    state = (
        jnp.zeros_like(cx),                     # pbounce
        ox0, oy0, oz0, dx0, dy0, dz0, ix, iy, iz,
        cx, cy, cz,
        cur_solid.astype(i32), mhit.astype(i32), mdead.astype(i32),
        t, face, hx, hy, hz, entering.astype(i32),
        tuple(out_t), tuple(out_packed), tuple(out_d),
        jnp.int32(0),                           # chunk counter
    )

    max_steps_bounce = int(X + Y + Z + 3)
    max_chunks = (B * max_steps_bounce) // max(1, unroll) + 2 * B + 2

    def cond(s):
        return (jnp.min(s[0]) < B) & (s[-1] < max_chunks)

    def march_step(s):
        (pbounce, ox, oy, oz, dx, dy, dz, ix, iy, iz, scx, scy, scz,
         cur_solid_i, mhit_i, mdead_i, t, face, hx, hy, hz, entering_i,
         o_t, o_p, o_d, chunks) = s
        cur_solid = cur_solid_i != 0
        mhit = mhit_i != 0
        mdead = mdead_i != 0
        entering = entering_i != 0
        marching = (pbounce < B) & ~mhit & ~mdead

        bigx = jnp.abs(dx) < tiny
        bigy = jnp.abs(dy) < tiny
        bigz = jnp.abs(dz) < tiny
        fx, fy, fz = scx.astype(f32), scy.astype(f32), scz.astype(f32)

        if coarse is not None:
            lvl1, lvl2, env = coarse
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
                    exact = jnp.where(d1 > 0, hi, lo).astype(i32) - (d1 > 0)
                    flo = jnp.clip(
                        jnp.floor(o1 + t_skip * d1).astype(i32),
                        lo.astype(i32), hi.astype(i32) - 1,
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
            skip_inside = (
                (kx >= 0) & (kx < X) & (ky >= 0) & (ky < Y) & (kz >= 0) & (kz < Z)
            )
            skip_out = ~skip_inside | (t_skip > f32(t_max))
            can_skip = (
                marching & cert
                & ((kx != scx) | (ky != scy) | (kz != scz))
            )
        else:
            kx = ky = kz = scx
            skip_inside = skip_out = jnp.zeros_like(marching)
            can_skip = jnp.zeros_like(marching)

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

        nx = jnp.where(can_skip, kx, ex_)
        ny = jnp.where(can_skip, ky, ey_)
        nz = jnp.where(can_skip, kz, ez_)
        inside = (can_skip & skip_inside) | (~can_skip & inside_exact)
        new_solid = solid_at(nx, ny, nz, inside & marching)

        entering_hit = new_solid & ~cur_solid & ~can_skip
        exiting_hit = cur_solid & ~new_solid & ~can_skip
        in_range = (t_next >= f32(t_min)) & (t_next <= f32(t_max))
        any_hit = marching & in_range & (entering_hit | exiting_hit)
        nface = jnp.where(
            entering_hit,
            axis * 2 + jnp.where(sgn > 0, 0, 1),
            axis * 2 + jnp.where(sgn > 0, 1, 0),
        ).astype(i32)

        rec = any_hit & ~mhit
        dead_exact = ~inside_exact | (t_next > f32(t_max))
        dead_now = marching & ~any_hit & (
            (can_skip & skip_out) | (~can_skip & dead_exact)
        )
        keep = ~marching
        return (
            pbounce, ox, oy, oz, dx, dy, dz, ix, iy, iz,
            jnp.where(keep, scx, nx), jnp.where(keep, scy, ny),
            jnp.where(keep, scz, nz),
            # bitwise select: Mosaic rejects select_n on i1 vectors
            ((keep & cur_solid) | (~keep & new_solid)).astype(i32),
            (mhit | any_hit).astype(i32),
            (mdead | dead_now).astype(i32),
            jnp.where(rec, t_next, t),
            jnp.where(rec, nface, face),
            jnp.where(rec, jnp.where(entering_hit, nx, scx), hx),
            jnp.where(rec, jnp.where(entering_hit, ny, scy), hy),
            jnp.where(rec, jnp.where(entering_hit, nz, scz), hz),
            ((rec & entering_hit) | (~rec & entering)).astype(i32),
            o_t, o_p, o_d, chunks,
        )

    def retire(s):
        (pbounce, ox, oy, oz, dx, dy, dz, ix, iy, iz, scx, scy, scz,
         cur_solid_i, mhit_i, mdead_i, t, face, hx, hy, hz, entering_i,
         o_t, o_p, o_d, chunks) = s
        mhit = mhit_i != 0
        mdead = mdead_i != 0
        entering = entering_i != 0
        active = pbounce < B
        resolved = active & (mhit | mdead)

        packed = (
            mhit.astype(i32)
            | (entering.astype(i32) << 1)
            | (face << 2)
            | (hx << 5)
            | (hy << 14)
            | (hz << 23)
        )
        o_t = list(o_t)
        o_p = list(o_p)
        o_d = list(o_d)
        for b in range(B):
            sel = resolved & (pbounce == b)
            o_t[b] = jnp.where(sel, t, o_t[b])
            o_p[b] = jnp.where(sel, packed, o_p[b])

        # --- sample the next bounce for resolved HITS (lambert-only) ---
        advance = resolved & mhit & (pbounce < B - 1)
        seed_b = _combine(seed0, pbounce.astype(jnp.uint32))
        r4 = _draw(seed_b, 4)
        r5 = _draw(seed_b, 5)

        hpx = ox + t * dx
        hpy = oy + t * dy
        hpz = oz + t * dz
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

        for b in range(1, B):
            sel = advance & (pbounce == b - 1)
            odx, ody, odz = o_d[b - 1]
            o_d[b - 1] = (
                jnp.where(sel, ndx, odx),
                jnp.where(sel, ndy, ody),
                jnp.where(sel, ndz, odz),
            )

        # --- transition ---
        n_ox = jnp.where(advance, hpx, ox)
        n_oy = jnp.where(advance, hpy, oy)
        n_oz = jnp.where(advance, hpz, oz)
        n_dx = jnp.where(advance, ndx, dx)
        n_dy = jnp.where(advance, ndy, dy)
        n_dz = jnp.where(advance, ndz, dz)
        n_pbounce = jnp.where(
            resolved, jnp.where(advance, pbounce + 1, i32(B)), pbounce
        )

        (icx, icy, icz, icur, imhit, imdead, it, iface, ihx, ihy, ihz,
         ient, iix, iiy, iiz) = init_march(n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
                                           advance)

        def merge_f(new, old):
            return jnp.where(advance, new, old)

        def merge_b(new, old):
            # bitwise select: Mosaic rejects select_n on i1 vectors
            return (advance & new) | (~advance & old)

        return (
            n_pbounce, n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
            merge_f(iix, ix), merge_f(iiy, iy), merge_f(iiz, iz),
            merge_f(icx, scx), merge_f(icy, scy), merge_f(icz, scz),
            merge_b(icur, cur_solid_i != 0).astype(i32),
            merge_b(imhit, mhit & ~resolved).astype(i32),
            merge_b(imdead, mdead & ~resolved).astype(i32),
            merge_f(it, jnp.where(resolved, f32(0.0), t)),
            merge_f(iface, jnp.where(resolved, 0, face)),
            merge_f(ihx, jnp.where(resolved, 0, hx)),
            merge_f(ihy, jnp.where(resolved, 0, hy)),
            merge_f(ihz, jnp.where(resolved, 0, hz)),
            merge_b(ient, entering & ~resolved).astype(i32),
            tuple(o_t), tuple(o_p), tuple(o_d),
            chunks,
        )

    def body(s):
        for _ in range(max(1, unroll)):
            s = march_step(s)
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
    o_t, o_p, o_d = s[-4], s[-3], s[-2]
    k = 0
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


@functools.partial(
    jax.jit,
    static_argnames=("ps", "t_min", "t_max", "n_bounces", "interpret",
                     "unroll", "coarse", "hw", "retire_cond"),
)
def _path_pallas_flat(ps, o, d, seeds, edit_args, t_min, t_max, n_bounces,
                      interpret=False, unroll=1, coarse=None, hw=None,
                      retire_cond=True):
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

    n_out = 2 * B + 3 * (B - 1)
    out_shapes = []
    for b in range(B):
        out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.int32))
        out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))
    for b in range(B - 1):
        for _ in range(3):
            out_shapes.append(jax.ShapeDtypeStruct(out_shape2, jnp.float32))

    from jax.experimental.pallas import tpu as pltpu

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(
            _path_kernel, ps=ps, t_min=t_min, t_max=t_max, n_bounces=B,
            unroll=unroll, coarse=coarse, retire_cond=retire_cond,
        ),
        grid=grid,
        in_specs=[smem] * len(edit_args) + [spec] * 7,
        out_specs=[spec] * n_out,
        out_shape=out_shapes,
        interpret=interpret,
    )(*edit_args, ox, oy, oz, dx, dy, dz, sd)
    return [post(x) for x in outs]


def trace_path_pallas(ps, origin, direction, seeds, n_bounces,
                      t_min=0.001, t_max=1000.0, pd=None, interpret=False,
                      unroll=None, hw=None, retire_cond=True):
    """Trace a FULL path (n_bounces bounces) per ray in one kernel.

    Preconditions (caller-checked): worldgen scene whose edits are all
    air-or-opaque-lambert (ps.edits_lambert), no lights, no instances,
    murmur3 RNG, lambert-only reachable materials.

    Returns (traces, dirs): traces[b] is a dda.TraceResult for bounce b;
    dirs[b] (b in 1..n_bounces-1) is the in-kernel-sampled direction the
    kernel marched for bounce b ((n, 3) float32; zero for rays whose
    path ended earlier).
    """
    from vrv_tpu.ops.dda import TraceResult
    from vrv_tpu.ops.dda_proc import _hit_blocks, assemble

    if ps.n_edits and not ps.edits_lambert:
        raise ValueError(
            "path kernel requires air-or-opaque-lambert edits (the "
            "in-kernel scatter is statically cosine-hemisphere); the "
            "caller must fall back to the staged kernels")
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    sd = seeds.reshape(-1).astype(jnp.uint32)
    B = int(n_bounces)
    import vrv_tpu.ops.pallas.trace_proc as _tp

    outs = _path_pallas_flat(
        ps, o, d, sd, edit_smem_args(ps, pd), float(t_min), float(t_max), B,
        interpret=interpret or _tp.INTERPRET,
        unroll=UNROLL if unroll is None else unroll,
        coarse=(ps.coarse_const or None) if ps.use_coarse else None,
        hw=hw, retire_cond=retire_cond,
    )
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
    return traces, dirs
