"""Triangle/hemisphere geometry for NEE + MIS.

Vectorized transcriptions of the reference kernel's geometry helpers
(reference src/render_system/pathtrace_shader.rs):

  - line_plane_intersection            (:132-135)
  - split_into_visible_triangles       (:138-243) hemisphere-plane clipping
  - visible_triangle_area              (:246-254)
  - ray_triangle_intersect             (:257-315) geometric method
  - triangle_center / radius_squared   (:325-337)
  - rect_is_visible                    (:360-368)
  - cosine_weighted_sample_hemisphere  (:604-610)
  - triangle_sample / visible_triangle_sample (:614-636)
  - aligned_cosine_weighted_sample     (:640-643)

All functions broadcast over leading batch dimensions; triangles are
(..., 3, 3) with vertex rows. Formulas (including epsilons and branch
structure) follow the reference exactly so radiance parity holds.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

EPSILON_BLOCK = 0.001  # pathtrace_shader.rs:14


def _dot(a, b):
    # 3-component dots as explicit slice/multiply/add chains: the
    # `(a*b).sum(-1)` form lowers each dot to its own tiny reduce op
    # (an xprof frame profile counted 4112 of them at 227 ms of device
    # time); the sliced form fuses into neighboring elementwise work.
    # Same left-associative summation order as XLA's sequential reduce.
    if a.shape[-1] == 3 or b.shape[-1] == 3:
        return (
            a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2]
        )
    return (a * b).sum(-1)


def _cross(a, b):
    return jnp.cross(a, b)


def _norm(v):
    return jnp.sqrt(_dot(v, v))


def line_plane_intersection(line_point, line_direction, plane_point, plane_normal):
    t = _dot(plane_normal, line_point - plane_point) / _dot(-line_direction, plane_normal)
    return line_point + t[..., None] * line_direction


class VisibleTriangles(NamedTuple):
    num_visible: jax.Array  # (...,) int32 in {0, 1, 2}
    tri0: jax.Array         # (..., 3, 3)
    tri1: jax.Array         # (..., 3, 3)


def split_into_visible_triangles(point, normal, tri) -> VisibleTriangles:
    """Clip `tri` against the hemisphere plane at `point` (normal side).

    Reproduces the sort-by-cosine + 4-case construction of
    pathtrace_shader.rs:138-243, vectorized with selects.
    """
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    c0 = _dot(v0 - point, normal)
    c1 = _dot(v1 - point, normal)
    c2 = _dot(v2 - point, normal)

    # three conditional swaps (exact reference order)
    s = c0 > c2
    v0, v2 = jnp.where(s[..., None], v2, v0), jnp.where(s[..., None], v0, v2)
    c0, c2 = jnp.where(s, c2, c0), jnp.where(s, c0, c2)
    s = c0 > c1
    v0, v1 = jnp.where(s[..., None], v1, v0), jnp.where(s[..., None], v0, v1)
    c0, c1 = jnp.where(s, c1, c0), jnp.where(s, c0, c1)
    s = c1 > c2
    v1, v2 = jnp.where(s[..., None], v2, v1), jnp.where(s[..., None], v1, v2)
    c1, c2 = jnp.where(s, c2, c1), jnp.where(s, c1, c2)

    # reference re-evaluates the dots post-sort (:175,178,203)
    d2 = _dot(v2 - point, normal)
    d1 = _dot(v1 - point, normal)
    d0 = _dot(v0 - point, normal)

    ip_20 = line_plane_intersection(v2, v0 - v2, point, normal)
    ip_21 = line_plane_intersection(v2, v1 - v2, point, normal)
    ip_10 = line_plane_intersection(v1, v0 - v1, point, normal)

    def tri_of(a, b, c):
        return jnp.stack([a, b, c], axis=-2)

    zero = jnp.zeros_like(tri)

    # case masks (mutually exclusive, evaluated in reference order)
    none_vis = d2 <= 0
    one_vis = (~none_vis) & (d1 <= 0)
    two_vis = (~none_vis) & (~one_vis) & (d0 <= 0)
    all_vis = (~none_vis) & (~one_vis) & (~two_vis)

    tri0 = jnp.where(
        none_vis[..., None, None],
        zero,
        jnp.where(
            one_vis[..., None, None],
            tri_of(ip_21, ip_20, v2),
            jnp.where(
                two_vis[..., None, None],
                tri_of(v2, v1, ip_20),
                tri,  # all visible: the ORIGINAL triangle (:241)
            ),
        ),
    )
    tri1 = jnp.where(
        two_vis[..., None, None], tri_of(v2, ip_20, ip_10), zero
    )
    num = jnp.where(none_vis, 0, jnp.where(two_vis, 2, 1)).astype(jnp.int32)
    return VisibleTriangles(num, tri0, tri1)


def _tri_area(tri):
    e1 = tri[..., 1, :] - tri[..., 0, :]
    e2 = tri[..., 2, :] - tri[..., 0, :]
    return 0.5 * _norm(_cross(e1, e2))


def visible_triangle_area(vt: VisibleTriangles) -> jax.Array:
    """pathtrace_shader.rs:246-254."""
    a0 = _tri_area(vt.tri0)
    a1 = _tri_area(vt.tri1)
    return jnp.where(
        vt.num_visible == 1, a0, jnp.where(vt.num_visible == 2, a0 + a1, 0.0)
    )


def ray_triangle_intersect(orig, direction, v0, v1, v2) -> Tuple[jax.Array, jax.Array]:
    """Geometric ray-triangle test (pathtrace_shader.rs:257-315).

    Returns (hit mask, t)."""
    EPS = 1e-7
    EPS2 = 1e-4
    v0v1 = v1 - v0
    v0v2 = v2 - v0
    N = _cross(v0v1, v0v2)
    NdotRay = _dot(N, direction)
    parallel = jnp.abs(NdotRay) < EPS
    d = -_dot(N, v0)
    safe = jnp.where(parallel, 1.0, NdotRay)
    t = -(_dot(N, orig) + d) / safe
    behind = t < 0

    P = orig + t[..., None] * direction
    c0 = _dot(N, _cross(v1 - v0, P - v0)) < -EPS2
    c1 = _dot(N, _cross(v2 - v1, P - v1)) < -EPS2
    c2 = _dot(N, _cross(v0 - v2, P - v2)) < -EPS2
    hit = ~(parallel | behind | c0 | c1 | c2)
    return hit, t


def triangle_center(tri):
    return tri.sum(-2) / 3.0


def triangle_radius_squared(center, tri):
    d = tri - center[..., None, :]
    return (d * d).sum(-1).max(-1)


def rect_is_visible(point, normal, rect) -> jax.Array:
    """Any corner above the hemisphere plane by EPSILON_BLOCK (rs:360-368)."""
    to_v = rect - point[..., None, :]
    return (_dot(to_v, normal[..., None, :]) >= EPSILON_BLOCK).any(-1)


def cosine_weighted_sample_hemisphere(u, v):
    """(r cos phi, sqrt(z), r sin phi) with z = u (pathtrace_shader.rs:604-610)."""
    z = u
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z))
    phi = 2.0 * jnp.pi * v
    return jnp.stack([r * jnp.cos(phi), jnp.sqrt(z), r * jnp.sin(phi)], axis=-1)


def aligned_cosine_sample(u, v, normal, tangent, bitangent):
    """pathtrace_shader.rs:640-643."""
    h = cosine_weighted_sample_hemisphere(u, v)
    d = (
        h[..., 0:1] * tangent + h[..., 1:2] * normal + h[..., 2:3] * bitangent
    )
    return d / _norm(d)[..., None]


def triangle_sample(u, v, tri):
    """Equal-area triangle sampling (pathtrace_shader.rs:614-620)."""
    flip = (u + v) > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    w = 1.0 - u - v
    return (
        w[..., None] * tri[..., 0, :]
        + u[..., None] * tri[..., 1, :]
        + v[..., None] * tri[..., 2, :]
    )


def visible_triangle_sample(t, u, v, vt: VisibleTriangles):
    """pathtrace_shader.rs:623-636. Requires num_visible >= 1."""
    one = triangle_sample(t, u, vt.tri0)  # uses tuv.xy when num==1
    a0 = _tri_area(vt.tri0)
    a1 = _tri_area(vt.tri1)
    frac = a0 / jnp.where(a0 + a1 == 0, 1.0, a0 + a1)
    pick0 = t < frac
    tri = jnp.where(pick0[..., None, None], vt.tri0, vt.tri1)
    two = triangle_sample(u, v, tri)  # uses tuv.yz when num==2
    return jnp.where((vt.num_visible == 1)[..., None], one, two)


def reflect(direction, normal):
    """GLSL reflect(I, N) = I - 2 dot(N, I) N."""
    return direction - 2.0 * _dot(normal, direction)[..., None] * normal
