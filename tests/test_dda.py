"""DDA trace kernel tests.

- axis rays against hand-built grids (entering/exiting face truth table)
- random rays vs the tiny-step brute-force oracle
- shading-frame tables vs frames derived numerically from the mesh
  winding (the reference computes them from triangle edges,
  pathtrace_shader.rs:345-357)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import dda
from vrv_tpu.game.chunk import FACE_POSITIONS, FACE_UVS


AIR = 7
TRANSLUCENT = np.array([True, False, False, False, False, False, False, True])
# ids: 0=glass(translucent), 1..6 opaque-ish, 7=air — mirrors the asset table


def _trace1(grid, o, d, **kw):
    r = dda.trace(
        jnp.asarray(grid),
        jnp.asarray(TRANSLUCENT),
        jnp.asarray([o], jnp.float32),
        jnp.asarray([d], jnp.float32),
        **kw,
    )
    return {k: np.asarray(v)[0] for k, v in r._asdict().items()}


def _grid(shape=(8, 8, 8)):
    return np.full(shape, AIR, dtype=np.uint8)


def test_axis_ray_hits_entering_face():
    g = _grid()
    g[5, 3, 3] = 5  # stone-ish
    r = _trace1(g, [0.5, 3.5, 3.5], [1, 0, 0])
    assert r["hit"] and r["entering"]
    assert r["block"] == 5 and r["face"] == 0  # left face
    np.testing.assert_allclose(r["t"], 4.5)
    np.testing.assert_array_equal(r["cell"], [5, 3, 3])


def test_axis_ray_negative_dir():
    g = _grid()
    g[2, 3, 3] = 4
    r = _trace1(g, [6.5, 3.5, 3.5], [-1, 0, 0])
    assert r["hit"] and r["face"] == 1  # right face
    np.testing.assert_allclose(r["t"], 3.5)


def test_ray_from_inside_solid_hits_exit_face_from_behind():
    g = _grid()
    g[3, 3, 3] = 5
    r = _trace1(g, [3.5, 3.5, 3.5], [1, 0, 0])
    assert r["hit"] and not r["entering"]
    assert r["block"] == 5 and r["face"] == 1  # own right face, seen from inside
    np.testing.assert_allclose(r["t"], 0.5)


def test_ray_through_contiguous_solid_no_internal_faces():
    g = _grid()
    g[2:6, 3, 3] = 5
    r = _trace1(g, [2.5, 3.5, 3.5], [1, 0, 0])
    # no faces between adjacent opaque blocks; exits at x=6 (own face of cell 5)
    assert r["hit"] and not r["entering"]
    np.testing.assert_array_equal(r["cell"], [5, 3, 3])
    np.testing.assert_allclose(r["t"], 3.5)


def test_glass_adjacent_glass_has_internal_face():
    g = _grid()
    g[3, 3, 3] = 0  # glass (translucent)
    g[4, 3, 3] = 0
    r = _trace1(g, [0.5, 3.5, 3.5], [1, 0, 0])
    assert r["hit"] and r["entering"] and r["t"] == pytest.approx(2.5)
    # from inside first glass block, the boundary to second glass is a face
    r2 = _trace1(g, [3.5, 3.5, 3.5], [1, 0, 0])
    assert r2["hit"] and r2["t"] == pytest.approx(0.5)
    assert r2["entering"] and np.array_equal(r2["cell"], [4, 3, 3])


def test_ray_entering_grid_boundary_face():
    g = _grid()
    g[0, :, :] = 5  # slab at the -x boundary
    r = _trace1(g, [-3.0, 4.5, 4.5], [1, 0, 0])
    assert r["hit"] and r["entering"] and r["face"] == 0
    np.testing.assert_allclose(r["t"], 3.0)


def test_miss_and_t_range():
    g = _grid()
    g[5, 3, 3] = 5
    r = _trace1(g, [0.5, 0.5, 0.5], [0, 1, 0])
    assert not r["hit"]
    # hit beyond t_max ignored
    r2 = _trace1(g, [0.5, 3.5, 3.5], [1, 0, 0], t_max=2.0)
    assert not r2["hit"]
    # hit below t_min ignored: origin on the face plane, moving away
    r3 = _trace1(g, [5.0, 3.5, 3.5], [-1, 0, 0])
    assert not r3["hit"]


def test_t_min_skips_current_face_but_hits_next():
    g = _grid()
    g[5, 3, 3] = 5
    g[2, 3, 3] = 4
    # origin exactly on the left face of the stone block, looking back
    r = _trace1(g, [5.0, 3.5, 3.5], [-1, 0, 0])
    assert r["hit"] and r["block"] == 4 and r["face"] == 1
    np.testing.assert_allclose(r["t"], 2.0)


def test_diagonal_ray():
    g = _grid()
    g[4, 4, 3] = 5
    d = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    r = _trace1(g, [3.25, 3.75, 3.5], d)
    assert r["hit"]
    # crosses y=4 first (0.25/d), entering (4,4)? cell (3,4,3) is air;
    # then x=4 -> enters (4,4,3): left face
    assert r["face"] == 0 and np.array_equal(r["cell"], [4, 4, 3])
    np.testing.assert_allclose(r["t"], 0.75 * np.sqrt(2), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_rays_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    g = _grid((6, 6, 6))
    # scatter solids and glass
    cells = rng.integers(0, 6, size=(12, 3))
    for i, c in enumerate(cells):
        g[tuple(c)] = [5, 0, 4][i % 3]

    n = 16
    origins = rng.uniform(-2, 8, size=(n, 3))
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    res = dda.trace(
        jnp.asarray(g), jnp.asarray(TRANSLUCENT),
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32),
    )
    for i in range(n):
        want = dda.trace_brute_force(g, TRANSLUCENT, origins[i], dirs[i], step=2e-4)
        if want is None:
            continue  # oracle step crossed two boundaries at once; skip ray
        assert bool(res.hit[i]) == want["hit"], (i, origins[i], dirs[i])
        if want["hit"]:
            assert int(res.block[i]) == want["block"]
            assert int(res.face[i]) == want["face"]
            np.testing.assert_array_equal(np.asarray(res.cell[i]), want["cell"])


def _frame_from_triangle(tri):
    """localCoordinateSystem (pathtrace_shader.rs:345-357)."""
    e01 = tri[1] - tri[0]
    e02 = tri[2] - tri[0]
    nrm = np.cross(e01, e02)
    tan = e01
    bit = np.cross(nrm, tan)
    return (
        nrm / np.linalg.norm(nrm),
        tan / np.linalg.norm(tan),
        bit / np.linalg.norm(bit),
    )


def test_face_frames_match_mesh_winding():
    for face in range(6):
        verts = FACE_POSITIONS[face]  # (6,3): tri0 then tri1
        for tri_id in range(2):
            tri = verts[tri_id * 3: tri_id * 3 + 3].astype(np.float64)
            nrm, tan, bit = _frame_from_triangle(tri)
            np.testing.assert_allclose(dda.FACE_NORMALS[face], nrm, atol=1e-6)
            np.testing.assert_allclose(
                dda.FACE_TANGENTS[face, tri_id], tan, atol=1e-6,
                err_msg=f"tangent face={face} tri={tri_id}",
            )
            np.testing.assert_allclose(
                dda.FACE_BITANGENTS[face, tri_id], bit, atol=1e-6,
                err_msg=f"bitangent face={face} tri={tri_id}",
            )


def test_face_uv_affine_matches_vertex_uv_tables():
    for face in range(6):
        verts = FACE_POSITIONS[face].astype(np.float64)
        uvs = FACE_UVS[face].astype(np.float64)
        cu = dda.FACE_U_AFFINE[face]
        cv = dda.FACE_V_AFFINE[face]
        for v, uv in zip(verts, uvs):
            u = cu[0] + cu[1] * v[0] + cu[2] * v[1] + cu[3] * v[2]
            w = cv[0] + cv[1] * v[0] + cv[2] * v[1] + cv[3] * v[2]
            np.testing.assert_allclose([u, w], uv, atol=1e-6, err_msg=f"face={face}")


def test_triangle_diagonal_split():
    # tri1 iff a+b>1 in in-plane fractional coords
    for face in range(6):
        verts = FACE_POSITIONS[face]
        a_ax, b_ax = dda.FACE_PLANE_AXES[face]
        tri0 = verts[:3]
        tri1 = verts[3:]
        c0 = tri0.mean(axis=0)
        c1 = tri1.mean(axis=0)
        assert c0[a_ax] + c0[b_ax] < 1.0
        assert c1[a_ax] + c1[b_ax] > 1.0


def test_incremental_distance_field(block_table):
    """update_distance_field == full rebuild after random add/remove edit
    sequences, including cells at grid corners/edges (clamped boxes)."""
    import jax.numpy as jnp

    from vrv_tpu.config import WorldConfig
    from vrv_tpu.game.chunk import generate_dense_grid
    from vrv_tpu.ops.dda import build_distance_field, update_distance_field

    g = 80  # > 4*cap+1 = 61 so the incremental path (not the tiny-grid
    #         fallback) is what's exercised
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    grid_np = np.array(generate_dense_grid(wc, block_table))
    air = int(block_table.air)
    stone = int(block_table.block_idx("stone"))
    grid = jnp.asarray(grid_np)
    dist = build_distance_field(grid, air)

    rng = np.random.default_rng(0)
    cells = [rng.integers(0, g, 3) for _ in range(6)]
    # force edge/corner coverage
    cells += [np.array([0, 0, 0]), np.array([g - 1, g - 1, g - 1]),
              np.array([1, g - 2, 5]), np.array([g // 2, 0, g - 1])]
    for c in cells:
        old = int(grid_np[tuple(c)])
        new = air if old != air else stone
        grid_np[tuple(c)] = new
        grid = jnp.asarray(grid_np)
        dist = update_distance_field(
            dist, grid, c, became_solid=(new != air), air_id=air
        )
        want = np.asarray(build_distance_field(grid, air))
        got = np.asarray(dist)
        assert (got == want).all(), (
            f"cell {c} {old}->{new}: {(got != want).sum()} cells differ"
        )
