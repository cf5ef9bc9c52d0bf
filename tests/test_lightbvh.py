"""Light-BVH build + NEE traversal tests.

Build invariants mirror reference build.rs (SAH, rollup); the capstone is
an unbiasedness check: NEE+MIS must converge to the same radiance as pure
hemisphere sampling (the estimator is reweighted, not changed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops import nee, rng
from vrv_tpu.render import lightbvh as lb
from vrv_tpu.render.scene import Scene, device_bvh


def _single_lamp_grid(block_table, size=(8, 8, 8), pos=(4, 4, 4)):
    g = np.full(size, block_table.air, np.uint8)
    g[pos] = block_table.block_idx("lamp")
    return g


def test_emissive_extraction(block_table):
    g = _single_lamp_grid(block_table)
    tris, lpa = lb.emissive_triangles(g, block_table)
    assert tris.shape == (12, 3, 3)  # 6 faces x 2 tris
    assert (lpa > 0).all()
    # cover a face: that face's triangles disappear
    g2 = g.copy()
    g2[5, 4, 4] = block_table.block_idx("stone")
    tris2, _ = lb.emissive_triangles(g2, block_table)
    assert tris2.shape == (10, 3, 3)
    # glass neighbour keeps the face (translucent)
    g3 = g.copy()
    g3[5, 4, 4] = block_table.block_idx("glass")
    tris3, _ = lb.emissive_triangles(g3, block_table)
    assert tris3.shape == (12, 3, 3)


def test_bvh_build_structure(block_table):
    g = _single_lamp_grid(block_table)
    g[1, 1, 1] = block_table.block_idx("lamp")  # second lamp far away
    bvh = lb.build_from_grid(g, block_table)
    assert bvh.n_lights == 24
    assert bvh.n_nodes == 2 * 24 - 1  # 1-prim leaves: full binary tree
    assert not bvh.is_leaf[0]
    assert bvh.max_depth >= 5
    # root luminance = sum of all leaf directional luminances
    leaf_lum = bvh.lum6[bvh.is_leaf][: bvh.n_lights]
    np.testing.assert_allclose(bvh.lum6[0], leaf_lum.sum(0), rtol=1e-4)
    # root AABB covers both lamps with padding
    assert (bvh.aabb_min[0] <= 1.0 + 1e-6).all()
    assert (bvh.aabb_max[0] >= 5.0 - 1e-6).all()


def test_bvh_single_triangle_root_leaf():
    tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 0, 1]]], np.float32)
    bvh = lb.build_light_bvh(tris, np.array([100.0], np.float32))
    assert bvh.n_nodes == 1 and bvh.is_leaf[0]
    assert bvh.max_depth == 1


def test_traverse_picks_nearer_lamp_more_often(block_table):
    g = np.full((16, 8, 8), block_table.air, np.uint8)
    lamp = block_table.block_idx("lamp")
    g[2, 4, 4] = lamp
    g[13, 4, 4] = lamp
    bvh = lb.build_from_grid(g, block_table)
    dev = device_bvh(bvh)

    n = 2048
    point = jnp.tile(jnp.asarray([[4.0, 4.5, 4.5]], jnp.float32), (n, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    seeds = rng.murmur3_combine(jnp.arange(n, dtype=jnp.uint32), 2)
    res = nee.traverse(point, normal, seeds, dev, bvh.max_depth)
    ok = np.asarray(res.success)
    # descents may legitimately dead-end on zero-importance sibling pairs —
    # the reference returns failure there too (pathtrace_shader.rs:561-568);
    # a healthy fraction must still succeed
    assert ok.mean() > 0.2
    # among successes: chosen leaf triangle centroids favour the nearer lamp
    tri = np.asarray(dev["tri"])[np.asarray(res.leaf_idx)[ok]]
    cx = tri.mean(1)[:, 0]
    assert (cx < 8).mean() > 0.8
    # successful picks carry positive importance + sane probabilities
    assert (np.asarray(res.importance)[ok] > 0).all()
    p = np.asarray(res.probability)[ok]
    assert (p > 0).all() and (p <= 1.0 + 1e-6).all()


def test_node_importance_monotonic_in_distance(block_table):
    """SURVEY section 4.1: importance falls with distance from the light."""
    g = _single_lamp_grid(block_table)
    bvh = lb.build_from_grid(g, block_table)
    dev = device_bvh(bvh)
    normal = jnp.asarray([[0.0, 1.0, 0.0]] * 4, jnp.float32)
    # points successively farther below-left of the lamp at (4..5)^3
    pts = jnp.asarray(
        [[4.5, 2.5, 4.5], [4.5, 1.5, 4.5], [4.5, 0.5, 4.5], [4.5, -2.5, 4.5]],
        jnp.float32,
    )
    imp = np.asarray(nee.node_importance(pts, normal, jnp.zeros(4, jnp.int32), dev))
    assert imp[0] > imp[1] > imp[2] > imp[3] >= 0


def test_nee_is_unbiased_vs_hemisphere_only(block_table):
    """MIS reweighting must not change the converged image."""
    size = (12, 8, 12)
    g = np.full(size, block_table.air, np.uint8)
    g[:, :2, :] = block_table.block_idx("stone")
    g[6, 2, 6] = block_table.block_idx("lamp")
    wc = WorldConfig(size=size, origin=(0, 0, 0), seed=0)
    sc = Scene(wc, table=block_table, grid=g)

    eye = np.array([4.0, 5.0, 6.0], np.float32)
    front = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)

    spp = 256
    base = RenderConfig(width=6, height=4, samples_per_pixel=spp, max_bounces=3)
    img_nee = np.asarray(
        sc.render_samples(eye, front, right, up, 0, base)
    ).mean(0)
    img_hemi = np.asarray(
        sc.render_samples(eye, front, right, up, 1, base.replace(enable_nee=False))
    ).mean(0)
    # pixel radiances are large (sky=50, lamp emissive ~1000); compare
    # relative means — generous tolerance for 256-spp Monte Carlo noise
    m1, m2 = img_nee.mean(), img_hemi.mean()
    assert m1 > 0 and m2 > 0
    assert abs(m1 - m2) / max(m1, m2) < 0.25, (m1, m2)
    # and NEE should reduce variance for direct lighting: compare per-pixel
    # relative deviation of two independent NEE renders vs two hemisphere ones
    img_nee2 = np.asarray(
        sc.render_samples(eye, front, right, up, 2, base)
    ).mean(0)
    img_hemi2 = np.asarray(
        sc.render_samples(eye, front, right, up, 3, base.replace(enable_nee=False))
    ).mean(0)
    dev_nee = np.abs(img_nee - img_nee2).mean()
    dev_hemi = np.abs(img_hemi - img_hemi2).mean()
    assert dev_nee <= dev_hemi * 1.5
