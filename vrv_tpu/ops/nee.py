"""Next-event estimation: stochastic light-BVH descent + importance math.

Device-side transcription of the reference's light sampling
(reference src/render_system/pathtrace_shader.rs):

  - node_importance (:371-499): internal nodes score by 6-directional
    luminance x clamped axis projection x face visibility / max-distance^2;
    leaves by visible (hemisphere-clipped) area x luminance x view-factor
    cosines / distance^2 clamped by triangle radius^2.
  - traverse (:509-580): top-down descent picking children proportionally
    to importance with one murmur3 draw per level, accumulating the path
    probability and the chosen node's importance.

The tree is the SoA LightBvh (render/lightbvh.py): a single
identity-transform tree over world-space emissive triangles, so the
reference's top-level/bottom-level instance hop (:530-539) reduces to
plain child descent; the per-node math is identical.

Vectorized over a flat ray batch; the descent runs a fixed `max_depth`
loop with done-masks (data-dependent depth is bounded by the host-known
tree depth, passed statically).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vrv_tpu.ops import rng
from vrv_tpu.ops.intersect import (
    EPSILON_BLOCK,
    rect_is_visible,
    split_into_visible_triangles,
    triangle_center,
    triangle_radius_squared,
    visible_triangle_area,
    visible_triangle_sample,
    _dot,
    _cross,
)


_DENSE_GATHER_MAX = 256


def _gather(arr, idx):
    """Row lookup tuned for TPU: random access lowers to scalar loops
    (~8 ns/element, tools/probe_tpu.py), so for small node tables a
    one-hot matmul on the MXU is orders of magnitude faster. Falls back
    to jnp.take for large trees."""
    c = arr.shape[0]
    if c > _DENSE_GATHER_MAX or idx.ndim != 1:
        return jnp.take(arr, idx, axis=0)
    # one-hot matmul at HIGHEST precision: a default-precision TPU matmul
    # rounds inputs to bf16 (corrupting constants like the 1e-4 AABB
    # padding), while a masked broadcast-sum materializes an (n, c, k)
    # temporary; HIGHEST keeps f32 accuracy at MXU speed with an (n, c)
    # footprint
    onehot = (
        idx[:, None] == jnp.arange(c, dtype=idx.dtype)[None, :]
    ).astype(jnp.float32)
    flat = arr.reshape(c, -1).astype(jnp.float32)
    out = jnp.dot(
        onehot, flat,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out.reshape((idx.shape[0],) + arr.shape[1:])
    if arr.dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return jnp.round(out).astype(arr.dtype)
    return out.astype(arr.dtype)


# is_leaf | left | right | min(3) | max(3) | lum6(6) | tri(9) | lpa | uv(6) | tex
PACKED_COLS = 32


def pack_nodes(bvh: dict) -> jax.Array:
    """Concatenate all per-node constants into one (C, 32) f32 matrix so a
    node fetch is a single one-hot matmul (see _gather). Columns 25:31 are
    the leaf's per-vertex uvs and column 31 its texture id (exact small
    ints in f32) — the split-NEE direct term's emission lookup."""
    c = bvh["is_leaf"].shape[0]
    uv = bvh.get("uv")
    tex = bvh.get("tex")
    return jnp.concatenate(
        [
            bvh["is_leaf"].astype(jnp.float32)[:, None],
            bvh["left"].astype(jnp.float32)[:, None],
            bvh["right"].astype(jnp.float32)[:, None],
            bvh["aabb_min"].astype(jnp.float32),
            bvh["aabb_max"].astype(jnp.float32),
            bvh["lum6"].astype(jnp.float32),
            bvh["tri"].reshape(c, 9).astype(jnp.float32),
            bvh["lpa"].astype(jnp.float32)[:, None],
            (jnp.zeros((c, 6), jnp.float32) if uv is None
             else uv.reshape(c, 6).astype(jnp.float32)),
            (jnp.zeros((c, 1), jnp.float32) if tex is None
             else tex.astype(jnp.float32)[:, None]),
        ],
        axis=1,
    )


def _row_tri(row):
    return row[:, 15:24].reshape(-1, 3, 3)


def node_importance_row(point, normal, row) -> jax.Array:
    """Importance from a pre-fetched packed node row (N, 25)."""
    is_leaf = row[:, 0] > 0.5
    v000 = row[:, 3:6]
    v111 = row[:, 6:9]
    lum6 = row[:, 9:15]
    tri = _row_tri(row)
    lpa = row[:, 24]

    x0, y0, z0 = v000[..., 0], v000[..., 1], v000[..., 2]
    x1, y1, z1 = v111[..., 0], v111[..., 1], v111[..., 2]

    def corner(x, y, z):
        return jnp.stack([x, y, z], axis=-1)

    v001 = corner(x0, y0, z1)
    v010 = corner(x0, y1, z0)
    v011 = corner(x0, y1, z1)
    v100 = corner(x1, y0, z0)
    v101 = corner(x1, y0, z1)
    v110 = corner(x1, y1, z0)

    diag = v111 - v000
    center = 0.5 * (v000 + v111)
    distance_sq = jnp.maximum(_dot(diag, diag), _dot(center - point, center - point))

    def rect(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-2)

    def face_term(lum, base, axis_vec, r):
        proj = jnp.clip(
            _dot(point - base, axis_vec) / jnp.maximum(_dot(axis_vec, axis_vec), 1e-30),
            0.0,
            1.0,
        )
        return lum * proj * rect_is_visible(point, normal, r).astype(jnp.float32)

    lum = (
        face_term(lum6[..., 0], v100, v000 - v100, rect(v100, v101, v111, v110))
        + face_term(lum6[..., 1], v000, v100 - v000, rect(v000, v001, v011, v010))
        + face_term(lum6[..., 2], v010, v000 - v010, rect(v010, v011, v111, v110))
        + face_term(lum6[..., 3], v000, v010 - v000, rect(v000, v001, v101, v100))
        + face_term(lum6[..., 4], v001, v000 - v001, rect(v001, v011, v111, v101))
        + face_term(lum6[..., 5], v000, v001 - v000, rect(v000, v010, v110, v100))
    )
    internal_imp = lum / jnp.maximum(distance_sq, 1e-30)

    # ---- leaf path (pathtrace_shader.rs:457-498) ----
    vt = split_into_visible_triangles(point, normal, tri)
    c0 = triangle_center(vt.tri0)
    c1 = triangle_center(vt.tri1)
    tri_centroid = jnp.where(
        (vt.num_visible == 1)[..., None], c0, 0.5 * (c0 + c1)
    )
    e1 = tri[..., 1, :] - tri[..., 0, :]
    e2 = tri[..., 2, :] - tri[..., 0, :]
    tn = _cross(e1, e2)
    tn = tn / jnp.maximum(jnp.sqrt(_dot(tn, tn)), 1e-30)[..., None]

    emitted = visible_triangle_area(vt) * lpa
    to_point = point - tri_centroid
    dist = jnp.sqrt(_dot(to_point, to_point))
    safe_dist = jnp.maximum(dist, 1e-30)
    cos_tri = _dot(tn, to_point) / safe_dist
    cos_surf = _dot(normal, -to_point) / safe_dist
    min_d2 = triangle_radius_squared(tri_centroid, tri)
    d2 = jnp.maximum(dist * dist, min_d2)
    leaf_imp = emitted * cos_tri * cos_surf / jnp.maximum(d2, 1e-30)
    leaf_imp = jnp.where(
        (vt.num_visible == 0) | (cos_surf < 0) | (cos_tri < 0), 0.0, leaf_imp
    )

    return jnp.where(is_leaf, leaf_imp, internal_imp)


def node_importance(point, normal, idx, bvh) -> jax.Array:
    """Importance of node `idx` (per ray); fetch + row math."""
    packed = bvh.get("packed")
    if packed is None:
        packed = pack_nodes(bvh)
    row = _gather(packed, idx)
    return node_importance_row(point, normal, row)


class TraverseResult(NamedTuple):
    success: jax.Array      # bool
    leaf_idx: jax.Array     # int32 node index of the chosen leaf
    probability: jax.Array  # f32 descent probability
    importance: jax.Array   # f32 importance of the chosen node
    tri: jax.Array          # (n, 3, 3) chosen leaf triangle (valid iff success)
    depth: jax.Array = None  # int32 descent levels (debugBvh-style view)


def traverse(point, normal, seed, bvh, max_depth: int) -> TraverseResult:
    """Stochastic descent (pathtrace_shader.rs:509-580), batch-vectorized.

    Per level: two packed-row fetches (the children) — everything else is
    dense math on the carried rows.
    """
    n = point.shape[0]
    packed = bvh.get("packed")
    if packed is None:
        packed = pack_nodes(bvh)

    # carry only per-lane SCALARS across levels (index, leaf flag, child
    # indices); the earlier formulation carried the full (n, 32) node row
    # through two wheres per level — ~70 ms/frame of pure row shuffling
    # at the headline shape. The chosen leaf's row is re-fetched once at
    # the end (one one-hot matmul).
    cur = jnp.zeros(n, jnp.int32)
    prob = jnp.ones(n, jnp.float32)

    root_leaf = jnp.broadcast_to(packed[0, 0] > 0.5, (n,))
    cur_li = jnp.broadcast_to(packed[0, 1].astype(jnp.int32), (n,))
    cur_ri = jnp.broadcast_to(packed[0, 2].astype(jnp.int32), (n,))
    # single-light tree: importance evaluated on the root leaf itself,
    # mirroring the reference's "if importance == 0: importance =
    # nodeImportance(root)" on the instance hop (:537-539)
    imp = jnp.where(
        root_leaf,
        node_importance_row(
            point, normal, jnp.broadcast_to(packed[0], (n, packed.shape[1]))
        ),
        0.0,
    )
    done = root_leaf
    success = done
    failed = jnp.zeros(n, bool)
    depth = jnp.zeros(n, jnp.int32)
    seed = jnp.broadcast_to(rng.u32(seed), (n,))

    for _ in range(max_depth):
        active = ~done & ~failed
        li, ri = cur_li, cur_ri
        row_l = _gather(packed, li)
        row_r = _gather(packed, ri)
        imp_l = node_importance_row(point, normal, row_l)
        imp_r = node_importance_row(point, normal, row_r)
        total = imp_l + imp_r
        zero_total = total == 0.0
        ln = imp_l / jnp.where(zero_total, 1.0, total)
        r = rng.murmur3_finalizef(seed)
        seed = jnp.where(active, rng.murmur3_combine(seed, 0), seed)
        go_left = r < ln

        new_cur = jnp.where(go_left, li, ri)
        new_leaf = jnp.where(go_left, row_l[:, 0], row_r[:, 0]) > 0.5
        new_li = jnp.where(go_left, row_l[:, 1], row_r[:, 1]).astype(jnp.int32)
        new_ri = jnp.where(go_left, row_l[:, 2], row_r[:, 2]).astype(jnp.int32)
        new_prob = prob * jnp.where(go_left, ln, 1.0 - ln)
        new_imp = jnp.where(go_left, imp_l, imp_r)

        newly_failed = active & zero_total
        step = active & ~zero_total
        depth = depth + step.astype(jnp.int32)
        cur = jnp.where(step, new_cur, cur)
        cur_li = jnp.where(step, new_li, cur_li)
        cur_ri = jnp.where(step, new_ri, cur_ri)
        prob = jnp.where(step, new_prob, prob)
        imp = jnp.where(step, new_imp, imp)
        failed = failed | newly_failed

        newly_done = step & new_leaf
        success = success | newly_done
        done = done | newly_done

    return TraverseResult(
        success=success & ~failed,
        leaf_idx=cur,
        probability=prob,
        importance=jnp.where(failed, 0.0, imp),
        tri=_row_tri(_gather(packed, cur)),
        depth=depth,
    )


class LightSample(NamedTuple):
    """A sampled light point for the split-NEE direct term (see
    ops/shade.do_bounce nee_mode='split')."""

    w: jax.Array          # (n,) f32 reference mixture weight clamp(imp/10,0,.5)
    point: jax.Array      # (n, 3) sampled point on the leaf's visible area
    dir: jax.Array        # (n, 3) unit shadow-ray direction (surface -> light)
    dist: jax.Array       # (n,) f32 |light - surface|
    cos_light: jax.Array  # (n,) f32 -dot(dir, leaf geometric normal)
    uv: jax.Array         # (n, 2) barycentric-interpolated uv at the point
    tex: jax.Array        # (n,) i32 leaf texture id
    inv_pdf_area: jax.Array  # (n,) f32 A_visible / P(leaf): 1 / area-pdf
    valid: jax.Array      # (n,) bool — sample usable (w>0, facing, nonzero area)


def sample_light_flat(point, normal, seed, flat,
                      importance_scale: float = 10.0, mis_clamp: float = 0.5,
                      sel_idx=None, sel_imp=None, sel_W=None) -> LightSample:
    """Flat-list light sampling for small light sets (<= ~64 triangles).

    TPU-first redesign of the stochastic BVH descent for the scale the
    game actually plays at (a handful of placed lamps + emissive entity
    faces): brute-force the importance of EVERY light triangle — no
    per-level node fetches, no hemisphere clipping — and pick one with
    exact importance-proportional probability. The same brute-force-over-
    tree trade as ops/instances vs the reference's TLAS. The direct-term
    pdf is importance_j/W x 1/area_j (full-triangle uniform point).

    Estimator notes: importance_j = power_j * eps_visible_j / dist_c^2 is
    strictly positive for every light whose contribution can be nonzero
    (the epsilon-visibility zero mirrors the BVH leaf rule: a triangle
    entirely below the hemisphere plane + EPSILON_BLOCK contributes 0),
    so the estimator stays unbiased; sampling the full triangle instead
    of the clipped visible part only adds variance for horizon-straddling
    lights (statistically gated vs the BVH path in tests/test_nee_flat.py).
    Draw slots 7/8/9 (selection, point u, point v) mirror sample_light's.

    The >cap fallback (and the mixture mode) remain on the BVH descent —
    the scale boundary is documented in docs/PERF.md.
    """
    tri = flat["tri"]            # (L, 3, 3) padded; pad rows power == 0
    power = flat["power"]        # (L,) luminance-per-area x full area
    area = flat["area"]          # (L,)
    uv3 = flat["uv"]             # (L, 3, 2)
    tex = flat["tex"]            # (L,) int32
    L = tri.shape[0]
    n = point.shape[0]
    f32 = jnp.float32

    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    if sel_imp is not None:
        # the fused kernel's in-kernel NEE recorded the chosen light's
        # importance + the selection total W alongside the index
        # (path_proc nee_pdf) — the whole (n, L) visibility/importance
        # field is then redundant: imp_c/W are the kernel's own values
        # (identical summation order, bit-equal in interpret mode) and
        # only the chosen light's FEATURES are needed (one-hot matmul
        # below). Unselected rows record imp_c = 0 -> w = 0 and
        # valid = False, the same terminals the all-false one-hot yields.
        assert sel_idx is not None and sel_W is not None
        sel = sel_idx[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]
        imp_c_pre, W = sel_imp, sel_W
    else:
        ctr = (v0 + v1 + v2) / 3.0
        # epsilon-visibility: any vertex above the hemisphere plane
        pn = normal[:, None, :]
        vis = (
            (_dot(v0[None] - point[:, None], pn) >= EPSILON_BLOCK)
            | (_dot(v1[None] - point[:, None], pn) >= EPSILON_BLOCK)
            | (_dot(v2[None] - point[:, None], pn) >= EPSILON_BLOCK)
        )                                                   # (n, L)
        dc = ctr[None] - point[:, None]                     # (n, L, 3)
        d2c = _dot(dc, dc)
        imp = jnp.where(vis, power[None] / jnp.maximum(d2c, 1e-30), 0.0)

        cum = jnp.cumsum(imp, axis=1)
        W = cum[:, -1]                                      # == selection total
        imp_c_pre = None
        if sel_idx is not None:
            # pre-chosen light (the fused kernel's in-kernel NEE records the
            # selection it marched a shadow ray for; -1 = no sample) — the
            # pdf bookkeeping below is unchanged, the draw-7 selection is
            # simply replaced by the recorded index
            sel = sel_idx[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]
        else:
            r = rng.draw(seed, 7) * W
            prev = jnp.concatenate(
                [jnp.zeros((n, 1), f32), cum[:, :-1]], axis=1
            )
            sel = (cum > r[:, None]) & (prev <= r[:, None])  # exclusive one-hot
    # chosen-light features via one one-hot MXU matmul (no row gathers)
    feats = jnp.concatenate(
        [
            tri.reshape(L, 9),
            uv3.reshape(L, 6),
            tex.astype(f32)[:, None],
            area[:, None],
        ],
        axis=1,
    )                                                   # (L, 17)
    chosen = jnp.dot(
        sel.astype(f32), feats,
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cv0 = chosen[:, 0:3]
    cv1 = chosen[:, 3:6]
    cv2 = chosen[:, 6:9]
    # uv corners as three (n, 2) column slices — a (n, 3, 2) reshape here
    # forces a T(8,128)->T(2,128) relayout over every row (xprof: ~4 ms
    # of the 98 ms glue); the slices fuse into the consumers instead.
    # Elementwise-identical formulas -> bit-identical uv_y.
    cuv0 = chosen[:, 9:11]
    cuv1 = chosen[:, 11:13]
    cuv2 = chosen[:, 13:15]
    ctex = jnp.round(chosen[:, 15]).astype(jnp.int32)
    carea = chosen[:, 16]
    imp_c = (imp_c_pre if imp_c_pre is not None
             else jnp.where(sel, imp, 0.0).sum(axis=1))

    # uniform point on the full triangle (sqrt warp)
    su = jnp.sqrt(rng.draw(seed, 8))
    rb = rng.draw(seed, 9)
    b0 = (1.0 - su)[:, None]
    b1 = (su * (1.0 - rb))[:, None]
    b2 = (su * rb)[:, None]
    y = b0 * cv0 + b1 * cv1 + b2 * cv2
    uv_y = b0 * cuv0 + b1 * cuv1 + b2 * cuv2

    to = y - point
    dist = jnp.sqrt(_dot(to, to))
    sdir = to / jnp.maximum(dist, 1e-30)[:, None]
    e1 = cv1 - cv0
    e2 = cv2 - cv0
    nrm = _cross(e1, e2)
    nrm = nrm / jnp.maximum(jnp.sqrt(_dot(nrm, nrm)), 1e-30)[:, None]
    cos_l = -_dot(sdir, nrm)

    w = jnp.clip(imp_c / importance_scale, 0.0, mis_clamp)
    # 1/pdf of the point = area / P(choose this light)
    inv_pdf = carea * W / jnp.maximum(imp_c, 1e-30)
    valid = (imp_c > 0.0) & (w > 0.0) & (cos_l > 0.0) & (dist > 1e-6) & (
        carea > 0.0
    )
    return LightSample(
        w=jnp.where(valid, w, 0.0),
        point=y,
        dir=sdir,
        dist=dist,
        cos_light=cos_l,
        uv=uv_y,
        tex=ctex,
        inv_pdf_area=inv_pdf,
        valid=valid,
    )


def sample_light(point, normal, seed, bvh, max_depth: int,
                 importance_scale: float = 10.0, mis_clamp: float = 0.5
                 ) -> LightSample:
    """Sample one light point per ray for shadow-ray (split) NEE.

    Uses the SAME stochastic descent as the reference's mixture NEE
    (traverse, seed slot 2) and the same importance weight
    w = clamp(importance/10, 0, 0.5) (pathtrace_shader.rs:788) — but
    instead of redirecting the continuation ray, the caller casts an
    independent shadow ray to `point` and adds the direct term
    w * BRDF * E * cos_light * inv_pdf_area / dist^2; the continuation
    stays cosine-sampled and its surface-emission pickup is weighted by
    (1 - w). Unlike the mixture pdf (which conditions on the chosen leaf,
    shade.py ray_pdf_light), the split term's area pdf MUST include the
    descent probability — only the chosen leaf is sampled, so 1/pdf =
    A_visible / P(leaf).

    Fresh draw slots 7/8/9 pick the point (mixture reuses 4/5/6, which
    split mode must leave to the cosine continuation sampling).
    """
    res = traverse(point, normal, rng.murmur3_combine(seed, 2), bvh, max_depth)
    w = jnp.where(
        res.success & (res.importance > 0.0),
        jnp.clip(res.importance / importance_scale, 0.0, mis_clamp),
        0.0,
    )
    packed = bvh.get("packed")
    if packed is None:
        packed = pack_nodes(bvh)
    row = _gather(packed, res.leaf_idx)
    tri = _row_tri(row)
    uv3 = row[:, 25:31].reshape(-1, 3, 2)
    tex = jnp.round(row[:, 31]).astype(jnp.int32)

    vt = split_into_visible_triangles(point, normal, tri)
    a_vis = visible_triangle_area(vt)
    y = visible_triangle_sample(
        rng.draw(seed, 7), rng.draw(seed, 8), rng.draw(seed, 9), vt
    )
    to = y - point
    dist = jnp.sqrt(_dot(to, to))
    sdir = to / jnp.maximum(dist, 1e-30)[:, None]

    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = _cross(e1, e2)
    nrm = nrm / jnp.maximum(jnp.sqrt(_dot(nrm, nrm)), 1e-30)[:, None]
    cos_l = -_dot(sdir, nrm)

    # barycentrics of y in the ORIGINAL leaf triangle -> uv at y
    p = y - tri[:, 0]
    d11 = _dot(e1, e1)
    d12 = _dot(e1, e2)
    d22 = _dot(e2, e2)
    dp1 = _dot(p, e1)
    dp2 = _dot(p, e2)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-30)
    bu = (d22 * dp1 - d12 * dp2) / det
    bv = (d11 * dp2 - d12 * dp1) / det
    uv_y = (
        uv3[:, 0]
        + bu[:, None] * (uv3[:, 1] - uv3[:, 0])
        + bv[:, None] * (uv3[:, 2] - uv3[:, 0])
    )

    inv_pdf = a_vis / jnp.maximum(res.probability, 1e-30)
    valid = (
        res.success & (w > 0.0) & (a_vis > 0.0) & (cos_l > 0.0) & (dist > 1e-6)
    )
    return LightSample(
        w=jnp.where(valid, w, 0.0),
        point=y,
        dir=sdir,
        dist=dist,
        cos_light=cos_l,
        uv=uv_y,
        tex=tex,
        inv_pdf_area=inv_pdf,
        valid=valid,
    )
