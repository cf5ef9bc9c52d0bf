"""Triangle clipping / sampling / intersection unit tests vs NumPy oracles.

Covers the SURVEY section 4.1 list: splitIntoVisibleTriangles cases
(0/1/2 visible), visible areas, ray-triangle vs oracle, cosine-hemisphere
statistics, triangle sampling containment.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import intersect as isect


def _vt(point, normal, tri):
    return isect.split_into_visible_triangles(
        jnp.asarray(point, jnp.float32),
        jnp.asarray(normal, jnp.float32),
        jnp.asarray(tri, jnp.float32),
    )


def test_split_all_visible():
    tri = [[0, 1, 0], [1, 1, 0], [0, 1, 1]]
    vt = _vt([0, 0, 0], [0, 1, 0], tri)
    assert int(vt.num_visible) == 1
    np.testing.assert_allclose(np.asarray(vt.tri0), tri)  # original returned
    np.testing.assert_allclose(float(isect.visible_triangle_area(vt)), 0.5)


def test_split_none_visible():
    tri = [[0, -1, 0], [1, -1, 0], [0, -1, 1]]
    vt = _vt([0, 0, 0], [0, 1, 0], tri)
    assert int(vt.num_visible) == 0
    assert float(isect.visible_triangle_area(vt)) == 0.0


def test_split_one_vertex_visible():
    # only apex above the plane: clipped to a smaller triangle
    tri = [[0, 1, 0], [1, -1, 0], [-1, -1, 0]]
    vt = _vt([0, 0, 0], [0, 1, 0], tri)
    assert int(vt.num_visible) == 1
    t0 = np.asarray(vt.tri0)
    # all vertices on or above the plane
    assert (t0[:, 1] >= -1e-6).all()
    # clipped area = apex triangle: height 1 of 2, base scales by 1/2 -> area/4
    full = 0.5 * np.linalg.norm(np.cross(np.subtract(tri[1], tri[0]), np.subtract(tri[2], tri[0])))
    np.testing.assert_allclose(float(isect.visible_triangle_area(vt)), full / 4, rtol=1e-5)


def test_split_two_vertices_visible():
    tri = [[0, 1, 0], [1, 1, 0], [0, -1, 1]]
    vt = _vt([0, 0, 0], [0, 1, 0], tri)
    assert int(vt.num_visible) == 2
    t0 = np.asarray(vt.tri0)
    t1 = np.asarray(vt.tri1)
    assert (t0[:, 1] >= -1e-6).all() and (t1[:, 1] >= -1e-6).all()
    # quad area = full - below-plane apex triangle
    full = 0.5 * np.linalg.norm(
        np.cross(np.subtract(tri[1], tri[0]), np.subtract(tri[2], tri[0]))
    )
    area = float(isect.visible_triangle_area(vt))
    assert 0 < area < full


def test_ray_triangle_intersect_vs_oracle():
    rng = np.random.default_rng(0)
    n = 64
    tri = rng.normal(size=(n, 3, 3)).astype(np.float32)
    orig = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    hit, t = isect.ray_triangle_intersect(
        jnp.asarray(orig), jnp.asarray(d),
        jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2]),
    )
    hit = np.asarray(hit)
    t = np.asarray(t)

    # oracle: Moller-Trumbore with loose epsilon; compare where unambiguous
    for i in range(n):
        v0, v1, v2 = tri[i]
        e1, e2 = v1 - v0, v2 - v0
        p = np.cross(d[i], e2)
        det = np.dot(e1, p)
        if abs(det) < 1e-5:
            continue
        tv = orig[i] - v0
        u = np.dot(tv, p) / det
        q = np.cross(tv, e1)
        v = np.dot(d[i], q) / det
        tt = np.dot(e2, q) / det
        inside = (u > 1e-3) and (v > 1e-3) and (u + v < 1 - 1e-3) and tt > 1e-3
        outside = (u < -1e-3) or (v < -1e-3) or (u + v > 1 + 1e-3) or tt < -1e-3
        if inside:
            assert hit[i], i
            np.testing.assert_allclose(t[i], tt, rtol=1e-3)
        elif outside:
            assert not hit[i], i


def test_cosine_hemisphere_statistics():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(size=20000), jnp.float32)
    v = jnp.asarray(rng.uniform(size=20000), jnp.float32)
    s = np.asarray(isect.cosine_weighted_sample_hemisphere(u, v))
    # unit-ish vectors, y >= 0
    np.testing.assert_allclose(np.linalg.norm(s, axis=1), 1.0, atol=1e-5)
    assert (s[:, 1] >= 0).all()
    # cosine-weighted: E[y] = 2/3, E[y^2] = 1/2
    assert abs(s[:, 1].mean() - 2 / 3) < 0.01
    assert abs((s[:, 1] ** 2).mean() - 0.5) < 0.01


def test_aligned_sample_is_in_hemisphere_of_normal():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.uniform(size=1000), jnp.float32)
    v = jnp.asarray(rng.uniform(size=1000), jnp.float32)
    n = jnp.asarray(np.tile([0.0, 0.0, -1.0], (1000, 1)), jnp.float32)
    t = jnp.asarray(np.tile([1.0, 0.0, 0.0], (1000, 1)), jnp.float32)
    b = jnp.asarray(np.tile([0.0, -1.0, 0.0], (1000, 1)), jnp.float32)
    d = np.asarray(isect.aligned_cosine_sample(u, v, n, t, b))
    assert (d[:, 2] <= 1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_triangle_sample_containment():
    tri = jnp.asarray([[0, 0, 0], [2, 0, 0], [0, 2, 0]], jnp.float32)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(size=500), jnp.float32)
    v = jnp.asarray(rng.uniform(size=500), jnp.float32)
    pts = np.asarray(isect.triangle_sample(u, v, tri))
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
    assert (pts[:, 0] + pts[:, 1] <= 2 + 1e-5).all()


def test_rect_is_visible():
    rect = jnp.asarray([[[0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1]]], jnp.float32)
    p = jnp.asarray([[0.5, 0.0, 0.5]], jnp.float32)
    up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    down = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    assert bool(isect.rect_is_visible(p, up, rect)[0])
    assert not bool(isect.rect_is_visible(p, down, rect)[0])


def test_reflect():
    d = jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32) / np.sqrt(2)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    r = np.asarray(isect.reflect(d, n))
    np.testing.assert_allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0.0]], atol=1e-6)
