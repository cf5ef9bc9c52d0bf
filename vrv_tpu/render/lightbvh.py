"""Emissive-light BVH: host-side binned-SAH builder over emissive faces.

Plays the role of the reference's software light BVH
(reference src/render_system/bvh/build.rs + scene.rs:433-445): next-event
estimation picks one emissive triangle by stochastic top-down descent
weighted by directional luminance importance. We keep the reference's
exact build semantics — binned SAH with 32 bins and area*count cost
(build.rs:50, 292-294), split-to-1-prim leaves (build.rs:137-221),
median-split fallback on empty partitions (build.rs:150-155), 1e-4 AABB
padding (build.rs:305), per-triangle 6-directional luminance from the
*unnormalized* normal (build.rs:260-276), bottom-up luminance rollup in
reverse topological order (build.rs:352-383) — but flatten the result to
SoA arrays sized to power-of-two buckets so device traversal shapes are
stable under world edits.

Differences from the reference (documented): the reference builds one BL
BVH per chunk instance plus a TL BVH over instances (scene.rs:260-308);
our world is one grid, so we build a single tree over all emissive
triangles in grid coordinates. Traversal math is identical; tree shape
(and hence the RNG descent path) differs from the two-level original, so
NEE parity is statistical rather than bit-exact — see SURVEY.md section 7.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from vrv_tpu.assets import BlockTable
from vrv_tpu.game.chunk import FACE_NEIGHBOR, FACE_POSITIONS

BINS = 32          # build.rs:50
PADDING = 1e-4     # build.rs:305


@dataclasses.dataclass
class LightBvh:
    """SoA light BVH. Arrays padded to `capacity` nodes; root is node 0."""

    n_nodes: int
    n_lights: int
    max_depth: int
    is_leaf: np.ndarray      # (cap,) bool
    left: np.ndarray         # (cap,) int32 (internal)
    right: np.ndarray       # (cap,) int32 (internal)
    aabb_min: np.ndarray     # (cap, 3) f32 (internal, padded)
    aabb_max: np.ndarray     # (cap, 3) f32
    lum6: np.ndarray         # (cap, 6) f32 (internal: rolled-up directional power)
    tri: np.ndarray          # (cap, 3, 3) f32 (leaf: triangle vertices)
    lpa: np.ndarray          # (cap,) f32 (leaf: luminance per area)
    # leaf emission lookup (split-NEE direct term, ops/nee.sample_light):
    uv: np.ndarray = None    # (cap, 3, 2) f32 per-vertex uv
    tex: np.ndarray = None   # (cap,) i32 texture id (block*6+face / instance t)

    @property
    def has_lights(self) -> bool:
        return self.n_lights > 0


def emissive_triangles(
    grid: np.ndarray, table: BlockTable
) -> Tuple[np.ndarray, np.ndarray]:
    """(tris, lpa) of emissive grid faces — see emissive_lights."""
    tris, lpa, _, _ = emissive_lights(grid, table)
    return tris, lpa


def emissive_lights(
    grid: np.ndarray, table: BlockTable
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Extract emissive face triangles from the grid.

    The reference tags a triangle as a light iff the mean emissive power of
    its texture is > 0 (scene.rs:433-445); faces exist only toward
    translucent neighbors (chunk.rs:212). Returns (tris (n,3,3) f32 in grid
    coords, lpa (n,) f32, uv (n,3,2) f32 per-vertex uvs from the face
    tables (chunk.rs:211-275), tex (n,) i32 = block*6+face) — uv/tex feed
    the split-NEE direct term's emission fetch at the sampled light point.
    """
    from vrv_tpu import native

    lum = table.texture_luminances  # (n_blocks*6,)
    translucent = table.translucent
    air = table.air

    if native.lib is not None:
        recs = native.emissive_faces(grid, translucent, lum)  # (n, 4) x,y,z,face
    else:
        emissive_block = (lum.reshape(table.n_blocks, 6) > 0).any(1)
        cells = np.argwhere(np.isin(grid, np.nonzero(emissive_block)[0]))
        out: List[List[int]] = []
        size = np.array(grid.shape)
        for cell in cells:
            b = int(grid[tuple(cell)])
            for face in range(6):
                if lum[b * 6 + face] <= 0:
                    continue
                nb = cell + FACE_NEIGHBOR[face]
                if ((nb >= 0) & (nb < size)).all():
                    nb_block = int(grid[tuple(nb)])
                else:
                    nb_block = air
                if not translucent[nb_block]:
                    continue
                out.append([cell[0], cell[1], cell[2], face])
        recs = np.asarray(out, np.int32).reshape(-1, 4)

    if len(recs) == 0:
        return (
            np.zeros((0, 3, 3), np.float32), np.zeros((0,), np.float32),
            np.zeros((0, 3, 2), np.float32), np.zeros((0,), np.int32),
        )
    from vrv_tpu.game.chunk import FACE_UVS

    cells_f = recs[:, :3].astype(np.float32)
    faces = recs[:, 3]
    blocks = grid[recs[:, 0], recs[:, 1], recs[:, 2]].astype(np.int64)
    verts = cells_f[:, None, :] + FACE_POSITIONS[faces]         # (n, 6, 3)
    tris = verts.reshape(-1, 2, 3, 3).reshape(-1, 3, 3)          # 2 tris per face
    lpas = np.repeat(lum[blocks * 6 + faces], 2).astype(np.float32)
    uvs = FACE_UVS[faces].reshape(-1, 2, 3, 2).reshape(-1, 3, 2)
    texs = np.repeat(blocks * 6 + faces, 2).astype(np.int32)
    return (
        np.ascontiguousarray(tris, np.float32), lpas,
        np.ascontiguousarray(uvs, np.float32), texs,
    )


def _sah_split(
    idxs: np.ndarray, centroids: np.ndarray, aabb_min: np.ndarray, aabb_max: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Binned-SAH best plane + partition (build.rs:43-155). Returns (l, r) idx."""
    best_cost = np.inf
    best = None
    for dim in range(3):
        c = centroids[idxs, dim]
        lo, hi = c.min(), c.max()
        if hi <= lo:
            continue
        scale = BINS / (hi - lo)
        bins = np.minimum((np.maximum(c - lo, 0) * scale).astype(np.int64), BINS - 1)
        # per-bin bounds + counts
        bmin = np.full((BINS, 3), np.inf)
        bmax = np.full((BINS, 3), -np.inf)
        cnt = np.zeros(BINS, np.int64)
        for b in range(BINS):
            sel = idxs[bins == b]
            cnt[b] = len(sel)
            if len(sel):
                bmin[b] = aabb_min[sel].min(0)
                bmax[b] = aabb_max[sel].max(0)

        def area(mn, mx):
            if not np.isfinite(mn).all():
                return 0.0
            e = mx - mn
            return 2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0])

        lmin, lmax = np.full(3, np.inf), np.full(3, -np.inf)
        lcnt = 0
        left_cost = np.zeros(BINS - 1)
        for p in range(BINS - 1):
            if cnt[p]:
                lmin = np.minimum(lmin, bmin[p])
                lmax = np.maximum(lmax, bmax[p])
            lcnt += cnt[p]
            left_cost[p] = area(lmin, lmax) * lcnt
        rmin, rmax = np.full(3, np.inf), np.full(3, -np.inf)
        rcnt = 0
        right_cost = np.zeros(BINS - 1)
        for p in range(BINS - 1, 0, -1):
            if cnt[p]:
                rmin = np.minimum(rmin, bmin[p])
                rmax = np.maximum(rmax, bmax[p])
            rcnt += cnt[p]
            right_cost[p - 1] = area(rmin, rmax) * rcnt
        costs = left_cost + right_cost
        p = int(np.argmin(costs))
        if costs[p] < best_cost:
            best_cost = costs[p]
            split_pos = lo + (p + 1) * (hi - lo) / BINS
            best = (dim, split_pos)

    if best is None:
        # all centroids identical in every dim: median split
        h = len(idxs) // 2
        return idxs[:h], idxs[h:]
    dim, pos = best
    mask = centroids[idxs, dim] < pos
    l, r = idxs[mask], idxs[~mask]
    if len(l) == 0 or len(r) == 0:
        # empty partition: median-split fallback (build.rs:150-155)
        h = len(idxs) // 2
        return idxs[:h], idxs[h:]
    return l, r


def build_light_bvh(
    tris: np.ndarray, lpa: np.ndarray, capacity: Optional[int] = None,
    uv: Optional[np.ndarray] = None, tex: Optional[np.ndarray] = None,
) -> LightBvh:
    """Build the SoA light BVH (see module docstring)."""
    n = len(tris)
    if uv is None:
        uv = np.zeros((n, 3, 2), np.float32)
    if tex is None:
        tex = np.zeros((n,), np.int32)
    aabb_min = tris.min(axis=1)
    aabb_max = tris.max(axis=1)
    centroids = tris.mean(axis=1)

    # per-triangle 6-dir luminance from the unnormalized normal (build.rs:260-276)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    nrm = np.cross(e1, e2)
    area = np.linalg.norm(nrm, axis=1) / 2.0
    lum = lpa * area
    tri_lum6 = np.stack(
        [
            lum * np.maximum(-nrm[:, 0], 0), lum * np.maximum(nrm[:, 0], 0),
            lum * np.maximum(-nrm[:, 1], 0), lum * np.maximum(nrm[:, 1], 0),
            lum * np.maximum(-nrm[:, 2], 0), lum * np.maximum(nrm[:, 2], 0),
        ],
        axis=1,
    )

    nodes: List[dict] = []

    def new_leafish(idxs) -> int:
        i = len(nodes)
        nodes.append(dict(idxs=idxs, left=-1, right=-1))
        return i

    def subdivide(node_idx: int):
        idxs = nodes[node_idx]["idxs"]
        if len(idxs) == 1:
            return
        if len(idxs) == 2:
            l, r = idxs[:1], idxs[1:]
        else:
            l, r = _sah_split(idxs, centroids, aabb_min, aabb_max)
        li = new_leafish(l)
        ri = new_leafish(r)
        subdivide(li)
        subdivide(ri)
        nodes[node_idx]["left"] = li
        nodes[node_idx]["right"] = ri

    max_depth = 0
    if n > 0:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 4 * n + 100))
        try:
            root = new_leafish(np.arange(n))
            subdivide(root)
        finally:
            sys.setrecursionlimit(old)

    n_nodes = len(nodes)
    if capacity is None:
        capacity = max(8, 1 << (n_nodes - 1).bit_length()) if n_nodes else 8
    assert capacity >= n_nodes

    is_leaf = np.zeros(capacity, bool)
    left = np.zeros(capacity, np.int32)
    right = np.zeros(capacity, np.int32)
    amin = np.zeros((capacity, 3), np.float32)
    amax = np.zeros((capacity, 3), np.float32)
    lum6 = np.zeros((capacity, 6), np.float32)
    tri_out = np.zeros((capacity, 3, 3), np.float32)
    lpa_out = np.zeros(capacity, np.float32)
    uv_out = np.zeros((capacity, 3, 2), np.float32)
    tex_out = np.zeros(capacity, np.int32)

    for i, nd in enumerate(nodes):
        idxs = nd["idxs"]
        if nd["left"] < 0:
            p = int(idxs[0])
            is_leaf[i] = True
            tri_out[i] = tris[p]
            lpa_out[i] = lpa[p]
            uv_out[i] = uv[p]
            tex_out[i] = tex[p]
            # leaves also expose their own 6-dir luminance for rollup
            lum6[i] = tri_lum6[p]
            amin[i] = aabb_min[p]
            amax[i] = aabb_max[p]
        else:
            left[i] = nd["left"]
            right[i] = nd["right"]
            amin[i] = aabb_min[idxs].min(0) - PADDING
            amax[i] = aabb_max[idxs].max(0) + PADDING

    # bottom-up luminance rollup (build.rs:352-383); node list is
    # topologically sorted (children after parents) so reverse order works
    for i in range(n_nodes - 1, -1, -1):
        if not is_leaf[i]:
            lum6[i] = lum6[left[i]] + lum6[right[i]]

    # depth
    def depth_of(root: int) -> int:
        # iterative: a chain-shaped tree (SAH peeling one primitive per
        # split) is as deep as the light count, past the default Python
        # recursion limit for large light sets
        best = 0
        stack = [(root, 1)]
        while stack:
            i, d = stack.pop()
            if is_leaf[i]:
                best = max(best, d)
            else:
                stack.append((left[i], d + 1))
                stack.append((right[i], d + 1))
        return best

    max_depth = depth_of(0) if n_nodes else 0

    return LightBvh(
        n_nodes=n_nodes,
        n_lights=n,
        max_depth=max_depth,
        is_leaf=is_leaf,
        left=left,
        right=right,
        aabb_min=amin,
        aabb_max=amax,
        lum6=lum6,
        tri=tri_out,
        lpa=lpa_out,
        uv=uv_out,
        tex=tex_out,
    )


def build_from_grid(grid: np.ndarray, table: BlockTable, capacity=None) -> LightBvh:
    tris, lpa, uv, tex = emissive_lights(grid, table)
    return build_light_bvh(tris, lpa, capacity=capacity, uv=uv, tex=tex)
