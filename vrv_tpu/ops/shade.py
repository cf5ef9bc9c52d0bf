"""Bounce shading: BSDF branches, texture fetch, NEE + MIS combination.

Transcribes `doBounce` (reference src/render_system/pathtrace_shader.rs:697-884)
over a flat ray batch:

  - miss -> sky emissivity vec3(50), dead ray (:700-712)
  - material fetch: 3 texture lookups at t = block*6 + face with nearest
    sampling of the 16x16 atlas (:746-748; sampler defaults in
    interactive_rendering.rs:358)
  - emissivity = 1000 * emissive_tex * -dot(dir, normal) (:754)
  - one RNG draw picks mirror / transmissive / lambertian (:757-773)
  - lambertian: reflectivity/pi, stochastic light-BVH NEE with MIS weight
    clamp(importance/10, 0, 0.5) (:775-872)

The hit tangent frame is constant per (face, triangle) for voxel faces —
see ops/dda.py table derivation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vrv_tpu.ops import dda, nee, rng
from vrv_tpu.ops.intersect import (
    aligned_cosine_sample,
    ray_triangle_intersect,
    reflect,
    split_into_visible_triangles,
    visible_triangle_area,
    visible_triangle_sample,
    _dot,
)

_PI = float(np.pi)


class BounceResult(NamedTuple):
    emissivity: jax.Array     # (n, 3)
    reflectivity: jax.Array   # (n, 3) — already includes scatter_pdf/ray_pdf
    miss: jax.Array           # (n,) bool
    new_origin: jax.Array     # (n, 3)
    new_direction: jax.Array  # (n, 3)
    # split-NEE fields (nee_mode='split' only; None otherwise). The caller
    # traces the shadow ray and adds  throughput * direct * visible  to the
    # image; `w` is the light-strategy weight the NEXT bounce's surface
    # emission must be complemented by (1 - w).
    direct: jax.Array = None         # (n, 3) pre-visibility direct term
    shadow_dir: jax.Array = None     # (n, 3) unit dir (0 when no sample)
    shadow_dist: jax.Array = None    # (n,) distance to the light point
    w: jax.Array = None              # (n,) f32


def _fetch_atlas(atlas: jax.Array, t: jax.Array, u: jax.Array, v: jax.Array):
    """Nearest-neighbour fetch from (T, 16, 16, C): texel (floor(v*16), floor(u*16))."""
    size = atlas.shape[1]
    tx = jnp.clip((u * size).astype(jnp.int32), 0, size - 1)
    ty = jnp.clip((v * size).astype(jnp.int32), 0, size - 1)
    flat = atlas.reshape(-1, atlas.shape[-1])
    idx = (t * size + ty) * size + tx
    return jnp.take(flat, idx, axis=0)


def _tex_groups(tex_set: tuple):
    """Normalize a tex_set whose entries are texture ids OR tuples of ids
    with byte-identical atlas content (content-dedup groups — Scene groups
    by the packed 8-channel texels, so fetching any member reads the same
    values). Returns (groups, reps): tuple of id-tuples + each group's
    representative id. Flat int tuples keep their old meaning
    (singleton groups)."""
    groups = tuple(
        (e,) if isinstance(e, int) else tuple(e) for e in tex_set
    )
    return groups, tuple(g[0] for g in groups)


def _group_mask(t: jax.Array, group: tuple):
    m = t == group[0]
    for tid in group[1:]:
        m = m | (t == tid)
    return m


def _fetch_atlas_onehot(atlas: jax.Array, t: jax.Array, u: jax.Array,
                        v: jax.Array, tex_set: tuple, mode: str = "split"):
    """_fetch_atlas as an exact one-hot MXU matmul over a small texture set.

    Valid when every texture a ray can hit is in `tex_set` (a static
    tuple of texture ids, or of content-dedup groups — see _tex_groups) —
    rows whose t is outside the set return 0, which downstream
    hit-masking already discards. A HIGHEST-precision one-hot matmul
    reproduces the f32 texel values exactly (one 1.0 per row; the rest
    contribute exact zeros), so results are bit-identical to the gather.

    mode='split' (the round-2 formulation): one (n,256)@(256,K*C) dot +
    a K-way where() chain. An on-chip xprof of the entry frame showed
    XLA's algebraic simplifier rewrites this dot(one-hot, table) back
    into an index-loop fusion that MATERIALIZES the (n,K,C) intermediate
    (f32[1.6M,30,8] = 1.5 GB written + re-read by the 30-select chain:
    27.2 + 16.4 ms of a 335 ms frame).

    mode='dot': an optimization_barrier on the one-hot hides the pattern
    so the dot stays a real MXU matmul ((n,256)@(256,K*C) is ~2 MXU tile
    columns — cheap), and the K-way texture select becomes an exact
    einsum against a (n,K) one-hot over t: per row the contraction adds
    K-1 exact zeros to the single selected texel, so the result is
    bit-identical to the where() chain (gate:
    tests/test_tex_fetch.py::test_dot_mode_bit_identical).
    """
    groups, reps = _tex_groups(tex_set)
    size = atlas.shape[1]
    C = atlas.shape[-1]
    K = len(groups)
    tx = jnp.clip((u * size).astype(jnp.int32), 0, size - 1)
    ty = jnp.clip((v * size).astype(jnp.int32), 0, size - 1)
    texel = ty * size + tx                                   # (n,) in [0,256)
    onehot = (
        texel[:, None] == jnp.arange(size * size, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    # (256, K*C): texel-major table of the selected textures
    table = (
        atlas[jnp.asarray(reps)]                             # (K, 16, 16, C)
        .reshape(K, size * size, C)
        .transpose(1, 0, 2)
        .reshape(size * size, K * C)
    )
    if mode == "dot":
        onehot = jax.lax.optimization_barrier(onehot)
    rows = jnp.dot(
        onehot, table,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, K, C)                                      # (n, K, C)
    if mode == "dot":
        t_oh = jnp.stack(
            [_group_mask(t, g) for g in groups], axis=1
        ).astype(jnp.float32)                                # (n, K)
        return jnp.einsum("nkc,nk->nc", rows, t_oh)
    out = jnp.zeros((t.shape[0], C), jnp.float32)
    for k, g in enumerate(groups):
        out = jnp.where(_group_mask(t, g)[:, None], rows[:, k], out)
    return out


def _fetch_atlas_mxu(atlas: jax.Array, t: jax.Array, u: jax.Array,
                     v: jax.Array, tex_set: tuple):
    """Factorized exact one-hot MXU fetch: texel = ty*16 + tx splits the
    (n, 256) one-hot the 'dot' mode choked on into a (n, K*16) one-hot
    over the combined (group, ty) index and a (n, 16) one-hot over tx.

    Stage 1 is a REAL MXU matmul (optimization_barrier hides the one-hot
    from the algebraic simplifier, and at 16K columns the materialized
    one-hot is 16x smaller than the 'dot' mode's): (n, K*16) @ (K*16,
    16*C) selects the hit texture's row ty — one exact 1.0 per row, all
    other products exact zeros. Stage 2 contracts the (n, 16, C) row
    against the tx one-hot on the VPU: one exact texel plus 15 exact
    zeros, so the result is bit-identical to the gather/'split' modes
    (gates: tests/test_tex_fetch.py). Rows whose t is outside the set
    return 0 (the other modes' semantics).

    Why: the 'split' fetch is rewritten into an index-loop gather fusion
    that costs ~8.5 ns/row regardless of K or row width (xprof
    2026-08-19: 13.9 + 13.8 + 5.8 ms of a ~289 ms device frame); this
    formulation replaces the per-row gather with streaming one-hot
    writes + an MXU pass, all at HBM-bandwidth rates.
    """
    groups, reps = _tex_groups(tex_set)
    size = atlas.shape[1]
    C = atlas.shape[-1]
    K = len(groups)
    tx = jnp.clip((u * size).astype(jnp.int32), 0, size - 1)
    ty = jnp.clip((v * size).astype(jnp.int32), 0, size - 1)
    k = jnp.zeros_like(t)
    found = jnp.zeros(t.shape, bool)
    for i, g in enumerate(groups):
        m = _group_mask(t, g)
        k = jnp.where(m, i, k)
        found = found | m
    j = k * size + ty                                        # (n,) in [0, K*16)
    oh_j = (
        j[:, None] == jnp.arange(K * size, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    oh_j = jax.lax.optimization_barrier(oh_j)
    # (K*16, 16*C): (group, ty)-major rows, (tx, c) columns — matches the
    # atlas's [t, ty, tx, C] layout (see _fetch_atlas's flat index)
    table = atlas[jnp.asarray(reps)].reshape(K * size, size * C)
    rows = jnp.dot(
        oh_j, table,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, size, C)                                   # (n, 16, C)
    oh_tx = (
        tx[:, None] == jnp.arange(size, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    out = jnp.einsum(
        "nsc,ns->nc", rows, oh_tx,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.where(found[:, None], out, 0.0)


def _fetch_set(atlas: jax.Array, t: jax.Array, u: jax.Array,
               v: jax.Array, tex_set: tuple, mode: str):
    """Dispatch the small-texture-set fetch to the cfg.tex_fetch
    formulation — all bit-identical (tests/test_tex_fetch.py)."""
    if mode == "take":
        return _fetch_atlas_take(atlas, t, u, v, tex_set)
    if mode == "mxu":
        return _fetch_atlas_mxu(atlas, t, u, v, tex_set)
    return _fetch_atlas_onehot(atlas, t, u, v, tex_set, mode=mode)


def _fetch_set_texel(atlas: jax.Array, t: jax.Array, texel: jax.Array,
                     tex_set: tuple):
    """The measured-optimal 'split' small-set fetch taking the TEXEL
    index directly (the in-kernel-radiance records carry ty*16+tx, not
    uv): one one-hot dot per texel — XLA rewrites it into the streaming
    index-loop fusion that beat 'take'/'dot'/'mxu' on-chip (docs/PERF.md
    round-3 tex_fetch table; the round-5 ikr xprof re-measured take's
    penalty at ~20 ms of layout copies + slower gathers per frame) —
    then the K-way content-group select chain. Rows whose t is outside
    the set return 0 (identical to _fetch_atlas_onehot)."""
    groups, reps = _tex_groups(tex_set)
    size2 = atlas.shape[1] * atlas.shape[2]
    C = atlas.shape[-1]
    K = len(groups)
    onehot = (
        texel[:, None] == jnp.arange(size2, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    table = (
        atlas[jnp.asarray(reps)]
        .reshape(K, size2, C)
        .transpose(1, 0, 2)
        .reshape(size2, K * C)
    )
    rows = jnp.dot(
        onehot, table,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, K, C)
    out = jnp.zeros((t.shape[0], C), jnp.float32)
    for k, g in enumerate(groups):
        out = jnp.where(_group_mask(t, g)[:, None], rows[:, k], out)
    return out


def _fetch_atlas_take(atlas: jax.Array, t: jax.Array, u: jax.Array,
                      v: jax.Array, tex_set: tuple):
    """tex_set fetch as ONE combined-index row gather: k = position of t's
    group in tex_set (one compare per member id), row = k*size^2 + texel
    into the (K*256, C) subset table; rows outside the set read row 0 and
    are masked to 0 (the one-hot modes' exact semantics)."""
    groups, reps = _tex_groups(tex_set)
    size = atlas.shape[1]
    C = atlas.shape[-1]
    K = len(groups)
    tx = jnp.clip((u * size).astype(jnp.int32), 0, size - 1)
    ty = jnp.clip((v * size).astype(jnp.int32), 0, size - 1)
    texel = ty * size + tx
    k = jnp.zeros_like(t)
    found = jnp.zeros(t.shape, bool)
    for i, g in enumerate(groups):
        m = _group_mask(t, g)
        k = jnp.where(m, i, k)
        found = found | m
    table = atlas[jnp.asarray(reps)].reshape(K * size * size, C)
    rows = jnp.take(table, k * (size * size) + texel, axis=0)
    return jnp.where(found[:, None], rows, 0.0)


# Per-face constants packed into one (6, 29) matrix so the whole face-state
# fetch is a single one-hot matmul on the MXU instead of seven scalar-looped
# table gathers (TPU random access runs ~8 ns/element; see probe notes):
# columns = [cu(4) | cv(4) | normal(3) | tan0(3) | tan1(3) | bit0(3) |
#            bit1(3) | a_axis_onehot(3) | b_axis_onehot(3)]
def _face_const_matrix() -> np.ndarray:
    a_oh = np.zeros((6, 3), np.float32)
    b_oh = np.zeros((6, 3), np.float32)
    for f in range(6):
        a_oh[f, dda.FACE_PLANE_AXES[f, 0]] = 1.0
        b_oh[f, dda.FACE_PLANE_AXES[f, 1]] = 1.0
    return np.concatenate(
        [
            dda.FACE_U_AFFINE,
            dda.FACE_V_AFFINE,
            dda.FACE_NORMALS,
            dda.FACE_TANGENTS[:, 0],
            dda.FACE_TANGENTS[:, 1],
            dda.FACE_BITANGENTS[:, 0],
            dda.FACE_BITANGENTS[:, 1],
            a_oh,
            b_oh,
        ],
        axis=1,
    ).astype(np.float32)


_FACE_CONST = _face_const_matrix()


class ResolvedHit(NamedTuple):
    """Geometry-side bounce state (resolve_hit): everything shading needs
    that depends on the hit-point CHAIN — hit merge, tangent frame, uv,
    material id, next origin. Per-bounce sequential by nature (bounce b's
    origin is bounce b-1's new_origin); the expensive texture/NEE/BSDF
    work in shade_resolved is chain-free and can run batched over all
    bounces at once (render/megakernel.py batched shading)."""
    hit: jax.Array          # (n,) bool — voxel or instance
    use_inst: jax.Array     # (n,) bool
    new_origin: jax.Array   # (n, 3) — 0 for misses (the chain convention)
    normal: jax.Array       # (n, 3)
    tangent: jax.Array      # (n, 3)
    bitangent: jax.Array    # (n, 3)
    u: jax.Array            # (n,)
    v: jax.Array            # (n,)
    t_mat: jax.Array        # (n,) int32 texture id


def resolve_hit(
    origin: jax.Array,
    direction: jax.Array,
    tr: dda.TraceResult,
    inst: Optional[dict] = None,
    inst_hit=None,
) -> ResolvedHit:
    """Merge voxel + instance hits and derive the shading frame.

    The voxel branch reads per-face constant tables (one one-hot matmul);
    the instance branch interpolates the hit triangle (reference
    pathtrace_shader.rs:716-742). new_origin is zeroed for misses, the
    convention do_bounce always had."""
    n = origin.shape[0]
    f32 = jnp.float32

    # --- merge voxel + instance hits (nearest wins) ---
    if inst_hit is not None:
        use_inst = inst_hit.hit & (~tr.hit | (inst_hit.t < tr.t))
        hit = tr.hit | inst_hit.hit
        t_hit = jnp.where(use_inst, inst_hit.t, tr.t)
    else:
        use_inst = jnp.zeros((n,), bool)
        hit = tr.hit
        t_hit = tr.t
    hit_p = origin + t_hit[:, None] * direction

    face = tr.face
    frac = hit_p - tr.cell.astype(f32)

    # single one-hot matmul fetches all per-face constants (see _FACE_CONST)
    face_oh = (face[:, None] == jnp.arange(6)[None, :]).astype(f32)
    # HIGHEST precision: default TPU matmuls round inputs to bf16, which
    # would perturb the tangent-frame constants (1/sqrt2 etc.)
    fc = jnp.dot(
        face_oh, jnp.asarray(_FACE_CONST),
        preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST,
    )
    cu, cv = fc[:, 0:4], fc[:, 4:8]
    normal = fc[:, 8:11]
    tan0, tan1 = fc[:, 11:14], fc[:, 14:17]
    bit0, bit1 = fc[:, 17:20], fc[:, 20:23]
    a_oh, b_oh = fc[:, 23:26], fc[:, 26:29]

    # uv from per-face affine tables (chunk.rs:211-275 vertex uv tables)
    u = cu[:, 0] + (cu[:, 1:] * frac).sum(-1)
    v = cv[:, 0] + (cv[:, 1:] * frac).sum(-1)

    # tangent frame: triangle picked by the quad diagonal in in-plane coords
    fa = (frac * a_oh).sum(-1)
    fb = (frac * b_oh).sum(-1)
    tri1_sel = (fa + fb > 1.0)[:, None]
    tangent = jnp.where(tri1_sel, tan1, tan0)
    bitangent = jnp.where(tri1_sel, bit1, bit0)

    t_mat = tr.block.astype(jnp.int32) * 6 + face
    new_origin = hit_p

    if inst_hit is not None:
        # instance shading source: triangle-derived frame + interpolated uv
        # (pathtrace_shader.rs:716-742)
        tri_i = nee._gather(inst["tri"], inst_hit.prim)            # (n, 3, 3)
        uv_i = nee._gather(inst["uv"], inst_hit.prim)              # (n, 3, 2)
        tmat_i = nee._gather(inst["t"], inst_hit.prim).astype(jnp.int32)
        bu, bv = inst_hit.bary[:, 0], inst_hit.bary[:, 1]
        bary3 = jnp.stack([1.0 - bu - bv, bu, bv], axis=-1)        # (n, 3)
        uv_interp = (bary3[..., None] * uv_i).sum(1)               # (n, 2)
        e01 = tri_i[:, 1] - tri_i[:, 0]
        e02 = tri_i[:, 2] - tri_i[:, 0]
        n_unnorm = jnp.cross(e01, e02)
        n_i = n_unnorm / jnp.maximum(
            jnp.sqrt(_dot(n_unnorm, n_unnorm)), 1e-30
        )[:, None]
        t_i = e01 / jnp.maximum(jnp.sqrt(_dot(e01, e01)), 1e-30)[:, None]
        b_unnorm = jnp.cross(n_unnorm, e01)
        b_i = b_unnorm / jnp.maximum(
            jnp.sqrt(_dot(b_unnorm, b_unnorm)), 1e-30
        )[:, None]
        # bary-interpolated hit point (the reference's new_origin, :742)
        p_i = (bary3[..., None] * tri_i).sum(1)

        m = use_inst[:, None]
        normal = jnp.where(m, n_i, normal)
        tangent = jnp.where(m, t_i, tangent)
        bitangent = jnp.where(m, b_i, bitangent)
        u = jnp.where(use_inst, uv_interp[:, 0], u)
        v = jnp.where(use_inst, uv_interp[:, 1], v)
        t_mat = jnp.where(use_inst, tmat_i, t_mat)
        new_origin = jnp.where(m, p_i, new_origin)

    return ResolvedHit(
        hit=hit,
        use_inst=use_inst,
        new_origin=jnp.where(hit[:, None], new_origin, 0.0),
        normal=normal,
        tangent=tangent,
        bitangent=bitangent,
        u=u,
        v=v,
        t_mat=t_mat,
    )


def shade_resolved(
    rh: ResolvedHit,
    direction: jax.Array,
    seed: jax.Array,
    materials: dict,
    bvh: Optional[dict],
    *,
    sky_emission: float = 50.0,
    emission_gain: float = 1000.0,
    nee_importance_scale: float = 10.0,
    nee_mis_clamp: float = 0.5,
    bvh_max_depth: int = 0,
    tex_set: Optional[tuple] = None,
    nee_mode: str = "mixture",
    w_prev: Optional[jax.Array] = None,
    light_tex_set: Optional[tuple] = None,
    flat_sel_idx: Optional[jax.Array] = None,
    flat_sel_imp: Optional[jax.Array] = None,
    flat_sel_W: Optional[jax.Array] = None,
    tex_fetch: str = "split",
) -> BounceResult:
    """Texture fetch + BSDF branch + NEE over pre-resolved hits.

    flat_sel_idx: pre-chosen light indices from the fused kernel's
    in-kernel NEE (split mode + flat list only; -1 = no sample) — the
    direct term is then computed for exactly the light the kernel
    marched a shadow ray to, and the caller multiplies by the kernel's
    recorded visibility instead of tracing shadow rays.
    flat_sel_imp/flat_sel_W: the kernel's recorded chosen-importance and
    selection-total (path_proc nee_pdf) — sample_light_flat then skips
    its (n, L) importance field entirely.

    Row-independent (every output row depends only on that row's inputs:
    elementwise math, per-row one-hot matmuls, (seed, slot)-keyed draws),
    so calling it once over B bounces' concatenated rows is bit-identical
    to B per-bounce calls — megakernel batched shading relies on this
    (gated in tests/test_batched_shade.py)."""
    n = direction.shape[0]
    f32 = jnp.float32
    hit = rh.hit
    normal, tangent, bitangent = rh.normal, rh.tangent, rh.bitangent
    u, v, t_mat, new_origin = rh.u, rh.v, rh.t_mat, rh.new_origin

    if tex_set is not None and "packed" in materials:
        # small reachable texture set (e.g. the fused path kernel's
        # lambert-only worldgen scenes): exact one-hot MXU fetch
        tex = _fetch_set(materials["packed"], t_mat, u, v, tex_set, tex_fetch)
        tex0, tex1, tex2 = tex[:, :4], tex[:, 4:7], tex[:, 7:8]
    elif "packed" in materials:
        # one 8-wide row gather instead of three (rows cost the same as
        # single elements on TPU; tools/probe_tpu.py)
        tex = _fetch_atlas(materials["packed"], t_mat, u, v)
        tex0, tex1, tex2 = tex[:, :4], tex[:, 4:7], tex[:, 7:8]
    else:
        tex0 = _fetch_atlas(materials["reflectivity"], t_mat, u, v)
        tex1 = _fetch_atlas(materials["emissivity"], t_mat, u, v)
        tex2 = _fetch_atlas(materials["metallicity"], t_mat, u, v)

    reflectivity = tex0[:, :3]
    alpha = tex0[:, 3]
    emissivity = emission_gain * tex1 * (-_dot(direction, normal))[:, None]
    metallicity = tex2[:, 0]
    if w_prev is not None:
        # split NEE: the previous bounce already claimed `w_prev` of this
        # surface-emission pickup through its shadow ray — the chain keeps
        # the complement (sky misses are untouched: the light sampler
        # cannot sample the sky, so the chain is its only estimator)
        emissivity = emissivity * (1.0 - w_prev)[:, None]

    # --- scatter-kind branch (one draw, :758) ---
    scatter_rand = rng.draw(seed, 0)
    is_mirror = scatter_rand < metallicity
    is_transmissive = (~is_mirror) & (scatter_rand < metallicity + (1.0 - alpha))
    is_lambert = ~(is_mirror | is_transmissive)

    dir_mirror = reflect(direction, normal)
    dir_transmit = direction

    # --- lambertian with NEE + MIS (:775-872) ---
    refl_lambert = reflectivity / _PI

    dir_hemi = aligned_cosine_sample(
        rng.draw(seed, 4), rng.draw(seed, 5), normal, tangent, bitangent
    )

    direct = sdir = sdist = w_out = None
    if bvh is not None and nee_mode == "split":
        # shadow-ray NEE (see docstring): continuation stays cosine; the
        # direct term estimates w * C where C is the single-scatter
        # integral the pure cosine chain estimates (the no-NEE reference
        # semantics): C = int (rho/pi) * E_y * (cos_x/pi) * (cos_l/d^2) dA
        # with E_y = gain * tex * cos_l (the chain's own emission pickup
        # convention, pathtrace_shader.rs:754). Hence
        #   direct = w * (rho/pi) * (cos_x/pi) * E_y * cos_l / (pdf_A d^2)
        # — note BOTH 1/pi factors: BRDF and the cosine-pdf's, exactly as
        # the chain carries them. (An earlier formulation dropped the
        # pdf's 1/pi, rendering lamps ~(1 + w(pi-1))x too bright — caught
        # by the absolute quadrature anchor in tests/test_analytic.py;
        # the split-vs-mixture gate alone missed it because sky radiance
        # dominates that scene.) The complementary (1 - w) scaling of the
        # next bounce's surface-emission pickup makes the split total
        # equal C in expectation. The caller multiplies by shadow-ray
        # visibility and path throughput. Small light sets sample via the
        # flat list (nee.sample_light_flat, the production path); the
        # descent remains the >cap fallback.
        if bvh.get("flat") is not None:
            ls = nee.sample_light_flat(
                new_origin, normal, seed, bvh["flat"],
                importance_scale=nee_importance_scale,
                mis_clamp=nee_mis_clamp,
                sel_idx=flat_sel_idx,
                sel_imp=flat_sel_imp, sel_W=flat_sel_W,
            )
        else:
            ls = nee.sample_light(
                new_origin, normal, seed, bvh, bvh_max_depth,
                importance_scale=nee_importance_scale,
                mis_clamp=nee_mis_clamp,
            )
        new_dir_l = dir_hemi
        cos_theta = _dot(new_dir_l, normal)
        # literal reference arithmetic: (cos/pi) / (cos/pi)
        spdf_over_rpdf = (cos_theta / _PI) / (cos_theta / _PI)
        if light_tex_set is not None and "packed" in materials:
            te = _fetch_set(
                materials["packed"], ls.tex, ls.uv[:, 0], ls.uv[:, 1],
                light_tex_set, tex_fetch,
            )[:, 4:7]
        else:
            te = _fetch_atlas(
                materials["emissivity"], ls.tex, ls.uv[:, 0], ls.uv[:, 1]
            )
        e_y = emission_gain * te * ls.cos_light[:, None]
        cos_x = _dot(ls.dir, normal)
        ok = ls.valid & is_lambert & hit & (cos_x > 0.0)
        geo = ls.cos_light * ls.inv_pdf_area / jnp.maximum(
            ls.dist * ls.dist, 1e-12
        )
        direct = jnp.where(
            ok[:, None],
            ls.w[:, None] * refl_lambert * (cos_x / _PI)[:, None]
            * e_y * geo[:, None],
            0.0,
        )
        # degenerate dir for unsampled rays: the tracer retires them at init
        sdir = jnp.where(ok[:, None], ls.dir, 0.0)
        sdist = ls.dist
        w_out = jnp.where(is_lambert & hit, ls.w, 0.0)
    elif bvh is not None:
        res = nee.traverse(
            new_origin, normal, rng.murmur3_combine(seed, 2), bvh, bvh_max_depth
        )
        w = jnp.where(
            res.success & (res.importance > 0.0),
            jnp.clip(res.importance / nee_importance_scale, 0.0, nee_mis_clamp),
            0.0,
        )
        tri_light = res.tri
        vt = split_into_visible_triangles(new_origin, normal, tri_light)

        mis_rand = rng.draw(seed, 3)
        pick_light = mis_rand < w

        light_point = visible_triangle_sample(
            rng.draw(seed, 4), rng.draw(seed, 5), rng.draw(seed, 6), vt
        )
        to_light = light_point - new_origin
        safe_len = jnp.maximum(jnp.sqrt(_dot(to_light, to_light)), 1e-30)
        dir_light = to_light / safe_len[:, None]

        new_dir_l = jnp.where(pick_light[:, None], dir_light, dir_hemi)
        cos_theta = _dot(new_dir_l, normal)
        scatter_pdf = cos_theta / _PI

        hit_l, t_l = ray_triangle_intersect(
            new_origin, new_dir_l,
            tri_light[:, 0], tri_light[:, 1], tri_light[:, 2],
        )
        light_area = visible_triangle_area(vt)
        light_distance = t_l  # unit direction: |t * d| = t
        ray_pdf_light = jnp.where(
            (w > 0.0) & hit_l,
            light_distance * light_distance / (cos_theta * light_area),
            0.0,
        )
        ray_pdf_hemisphere = cos_theta / _PI
        ray_pdf = w * ray_pdf_light + (1.0 - w) * ray_pdf_hemisphere
        spdf_over_rpdf = scatter_pdf / ray_pdf
    else:
        new_dir_l = dir_hemi
        cos_theta = _dot(new_dir_l, normal)
        # literal reference arithmetic: (cos/pi) / (cos/pi)
        spdf_over_rpdf = (cos_theta / _PI) / (cos_theta / _PI)

    # --- combine branches ---
    new_direction = jnp.where(
        is_mirror[:, None],
        dir_mirror,
        jnp.where(is_transmissive[:, None], dir_transmit, new_dir_l),
    )
    refl_out = jnp.where(
        is_mirror[:, None],
        reflectivity,
        jnp.where(
            is_transmissive[:, None],
            jnp.ones_like(reflectivity),
            refl_lambert * spdf_over_rpdf[:, None],
        ),
    )

    # --- miss: sky (:700-712) ---
    sky = jnp.full((n, 3), f32(sky_emission))
    emissivity = jnp.where(hit[:, None], emissivity, sky)
    refl_out = jnp.where(hit[:, None], refl_out, 0.0)
    # new_origin already zeroed for misses by resolve_hit
    new_direction = jnp.where(hit[:, None], new_direction, 0.0)

    return BounceResult(
        emissivity=emissivity,
        reflectivity=refl_out,
        miss=~hit,
        new_origin=new_origin,
        new_direction=new_direction,
        direct=direct,
        shadow_dir=sdir,
        shadow_dist=sdist,
        w=w_out,
    )


def do_bounce(
    origin: jax.Array,
    direction: jax.Array,
    tr: dda.TraceResult,
    seed: jax.Array,
    materials: dict,
    bvh: Optional[dict],
    *,
    sky_emission: float = 50.0,
    emission_gain: float = 1000.0,
    nee_importance_scale: float = 10.0,
    nee_mis_clamp: float = 0.5,
    bvh_max_depth: int = 0,
    inst: Optional[dict] = None,
    inst_hit=None,
    tex_set: Optional[tuple] = None,
    nee_mode: str = "mixture",
    w_prev: Optional[jax.Array] = None,
    light_tex_set: Optional[tuple] = None,
    tex_fetch: str = "split",
) -> BounceResult:
    """One path-tracing bounce for a flat ray batch.

    resolve_hit + shade_resolved in one call — the reference's doBounce
    (pathtrace_shader.rs:697-884) shape.

    materials: dict with 'reflectivity' (T,16,16,4), 'emissivity' (T,16,16,3),
    'metallicity' (T,16,16,1) float32 linear atlases.
    bvh: device LightBvh dict or None for no lights (traversal draws still
    never happen in the reference when the tree is a dummy node, :513-522,
    and every draw below is keyed by (seed, slot) so draw alignment is
    unaffected).
    inst/inst_hit: optional dynamic-entity triangle set
    {'tri','t','uv','valid'} + ops.instances.InstanceHit; the nearer of the
    voxel and instance hits wins per ray.

    nee_mode: 'mixture' = the reference's one-sample MIS (the continuation
    ray is redirected at the light with probability w — pathtrace_shader.rs
    :775-872); 'split' = shadow-ray NEE: the continuation stays
    cosine-sampled (so a pre-recorded path chain, e.g. the fused Pallas
    kernel's, stays valid) and the direct term rides a separate shadow ray
    returned in BounceResult. Both weight the light strategy by the same
    w = clamp(importance/10, 0, 0.5); surface emission picked up by the
    chain is complemented by (1 - w_prev) in split mode, which makes the
    two estimators agree in expectation (convex split of the same
    integral; gated statistically in tests/test_nee_split.py).
    w_prev: (n,) prior-bounce light weights (split mode).
    light_tex_set: static tuple of texture ids reachable via light samples
    (scene's emissive faces) — routes the direct term's emission fetch
    through the exact one-hot MXU matmul instead of a row gather.
    """
    rh = resolve_hit(origin, direction, tr, inst=inst, inst_hit=inst_hit)
    return shade_resolved(
        rh, direction, seed, materials, bvh,
        sky_emission=sky_emission,
        emission_gain=emission_gain,
        nee_importance_scale=nee_importance_scale,
        nee_mis_clamp=nee_mis_clamp,
        bvh_max_depth=bvh_max_depth,
        tex_set=tex_set,
        nee_mode=nee_mode,
        w_prev=w_prev,
        light_tex_set=light_tex_set,
        tex_fetch=tex_fetch,
    )
