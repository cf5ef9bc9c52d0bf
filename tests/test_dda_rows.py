"""Row-fetch tracer vs the exact tracer: full-field equality.

Covers the row tracer's tricky paths: in-row z-hits both directions,
non-hit z-crossings before x/y steps, block-id changes inside solid runs,
glass-glass internal faces, window-edge crossings, skip jumps, rays from
inside solids, and degenerate-axis rays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import dda
from vrv_tpu.ops.dda_rows import pack_rows, trace_rows

AIR = 7
TRANSLUCENT = np.array([True, False, False, False, False, False, False, True])


def _tables(g):
    gj = jnp.asarray(g)
    tl = jnp.asarray(TRANSLUCENT)
    dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(gj, AIR)
    rows = pack_rows(gj, dist, tl)
    return gj, tl, dist, rows


def _compare(g, origins, dirs):
    gj, tl, dist, rows = _tables(g)
    want = dda.trace(gj, tl, jnp.asarray(origins), jnp.asarray(dirs))
    got = trace_rows(
        g.shape, rows, len(TRANSLUCENT), jnp.asarray(origins), jnp.asarray(dirs)
    )
    np.testing.assert_array_equal(np.asarray(want.hit), np.asarray(got.hit))
    hits = np.asarray(want.hit)
    for field in ("block", "face", "entering"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, field))[hits],
            np.asarray(getattr(got, field))[hits],
            err_msg=field,
        )
    np.testing.assert_array_equal(
        np.asarray(want.cell)[hits], np.asarray(got.cell)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(want.t)[hits], np.asarray(got.t)[hits], rtol=2e-6, atol=2e-6
    )


def _world(seed=0, shape=(16, 16, 32)):
    rng = np.random.default_rng(seed)
    g = np.full(shape, AIR, np.uint8)
    g[:, :3, :] = 5
    for c in rng.integers(0, np.array(shape), size=(24, 3)):
        g[tuple(c)] = [5, 0, 4][int(c.sum()) % 3]
    # solid run with block change (exercise comb_step block selection)
    g[4, 8, 4:12] = 5
    g[4, 8, 12:20] = 4
    # glass run (internal faces)
    g[10, 8, 8:14] = 0
    return g


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rows_match_exact_random(seed):
    rng = np.random.default_rng(100 + seed)
    g = _world(seed)
    n = 512
    origins = rng.uniform(-4, 36, size=(n, 3)).astype(np.float32)
    origins[:, 0] = rng.uniform(-4, 20, n)
    origins[:, 1] = rng.uniform(-4, 20, n)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    _compare(g, origins, dirs)


def test_rows_axis_rays():
    g = _world(3)
    cases = []
    for z0 in (0.5, 10.5, 31.5):
        for dz in (1.0, -1.0):
            cases.append(([4.5, 8.5, z0], [0.0, 0.0, dz]))         # pure z
    cases += [
        ([0.5, 8.5, 13.5], [1.0, 0.0, 0.0]),                      # pure x
        ([4.5, 15.5, 13.5], [0.0, -1.0, 0.0]),                    # pure y
        ([4.5, 8.5, 2.0], [0.0, 0.0, 1.0]),                       # into solid run
        ([4.5, 8.5, 15.0], [0.0, 0.0, 1.0]),                      # inside solid, block change
        ([10.5, 8.5, 9.5], [0.0, 0.0, 1.0]),                      # inside glass run
        ([10.5, 8.5, 6.0], [0.0, 0.0, 1.0]),                      # into glass run
        ([4.5, 8.5, 11.9], [0.6, 0.0, 0.8]),                      # diagonal xz
        ([4.2, 7.8, 11.9], [0.5, 0.5, 0.70710678]),               # diagonal xyz
    ]
    origins = np.array([c[0] for c in cases], np.float32)
    dirs = np.array([c[1] for c in cases], np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    _compare(_world(3), origins, dirs)


def test_rows_window_edges():
    # hits exactly at 32-cell window boundaries
    g = np.full((8, 8, 64), AIR, np.uint8)
    g[4, 4, 32] = 5   # first cell of window 1
    g[4, 4, 31] = 0   # last cell of window 0 (glass)
    origins = np.array(
        [[4.5, 4.5, 0.5], [4.5, 4.5, 63.5], [4.5, 4.5, 31.2], [4.5, 4.5, 32.8]],
        np.float32,
    )
    dirs = np.array(
        [[0, 0, 1], [0, 0, -1], [0, 0, 1], [0, 0, -1]], np.float32
    )
    _compare(g, origins, dirs)


def test_rows_renders_match_skip_tracer_image(block_table):
    """End-to-end frame equality between tracer='rows' and tracer='skip'."""
    from vrv_tpu.config import RenderConfig, WorldConfig
    from vrv_tpu.render.scene import Scene

    wc = WorldConfig(size=(16, 16, 32), origin=(0, 0, 0), seed=0)
    g = np.full(wc.size, block_table.air, np.uint8)
    g[:, :3, :] = block_table.block_idx("stone")
    g[8, 3, 16] = block_table.block_idx("lamp")
    g[4, 3, 8] = block_table.block_idx("mirror")
    sc = Scene(wc, table=block_table, grid=g)
    assert sc.rows is not None

    eye = np.array([8.0, 10.0, 6.0], np.float32)
    front = np.array([0.0, -0.707, 0.707], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.707, -0.707], np.float32)
    base = RenderConfig(width=24, height=16, samples_per_pixel=2, max_bounces=3)
    img_rows = np.asarray(sc.render(eye, front, right, up, 0, base.replace(tracer="rows")))
    img_skip = np.asarray(sc.render(eye, front, right, up, 0, base.replace(tracer="skip")))
    np.testing.assert_array_equal(img_rows, img_skip)


def test_rows_major_axis_matches_exact_oracle():
    """Per-ray major-axis packing (pack_rows_3axis + trace_rows_major) is
    hit-for-hit identical to the exact DDA, including axis-aligned and
    tie-breaking diagonal directions."""
    import numpy as np

    from vrv_tpu.ops.dda import build_distance_field, trace
    from vrv_tpu.ops.dda_rows import pack_rows_3axis, trace_rows_major

    rng = np.random.default_rng(0)
    S = 32
    air = 4
    grid = np.full((S, S, S), air, np.uint8)
    m = rng.random((S, S, S)) < 0.03
    grid[m] = rng.integers(0, 4, m.sum()).astype(np.uint8)
    translucent = np.array([0, 0, 1, 0, 1], bool)

    dist = build_distance_field(jnp.asarray(grid), air)
    rows3 = pack_rows_3axis(jnp.asarray(grid), dist, jnp.asarray(translucent), 4)

    n = 2048
    o = rng.uniform(-5, S + 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:32] = np.array([1, 0, 0])
    d[32:64] = np.array([0, -1, 0])
    d[64:96] = np.array([1, 1, 1]) / np.sqrt(3)

    r_ex = trace(jnp.asarray(grid), jnp.asarray(translucent), o, d)
    r_m = trace_rows_major((S, S, S), rows3, 5, o, d)

    np.testing.assert_array_equal(np.asarray(r_ex.hit), np.asarray(r_m.hit))
    mask = np.asarray(r_ex.hit)
    np.testing.assert_allclose(
        np.asarray(r_ex.t)[mask], np.asarray(r_m.t)[mask], atol=1e-4
    )
    for f in ("block", "face", "entering"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r_ex, f))[mask], np.asarray(getattr(r_m, f))[mask]
        )
    np.testing.assert_array_equal(
        np.asarray(r_ex.cell)[mask], np.asarray(r_m.cell)[mask]
    )


def test_rows_vs_oracle_integer_aligned_origins():
    """Rays starting exactly on integer cell planes with near-axis
    directions are measure-zero boundary cases where tie resolution may
    legitimately differ between tracers (the app's default spawn camera
    sits exactly there, faithful to the reference's main.rs spawn).
    This gate bounds the divergence: hits must agree for all rays except
    a small graze set, and agreeing hits must agree exactly."""
    import numpy as np

    from vrv_tpu.ops.dda import build_distance_field, trace
    from vrv_tpu.ops.dda_rows import pack_rows_3axis, trace_rows_major

    rng = np.random.default_rng(7)
    S, air = 32, 4
    grid = np.full((S, S, S), air, np.uint8)
    m = rng.random((S, S, S)) < 0.05
    grid[m] = rng.integers(0, 4, m.sum()).astype(np.uint8)
    translucent = np.array([0, 0, 1, 0, 1], bool)
    dist = build_distance_field(jnp.asarray(grid), air)
    rows3 = pack_rows_3axis(jnp.asarray(grid), dist, jnp.asarray(translucent), 4)

    n = 2048
    # integer-aligned origins, near-axis directions with tiny off-axis
    # components (the adversarial class the random tests never sample)
    o = rng.integers(2, S - 2, (n, 3)).astype(np.float32)
    axis = rng.integers(0, 3, n)
    d = rng.normal(size=(n, 3)).astype(np.float32) * 1e-5
    d[np.arange(n), axis] = np.where(rng.random(n) < 0.5, 1.0, -1.0)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    r_ex = trace(jnp.asarray(grid), jnp.asarray(translucent), o, d)
    r_m = trace_rows_major((S, S, S), rows3, 5, o, d)

    hx, hm = np.asarray(r_ex.hit), np.asarray(r_m.hit)
    disagree = hx != hm
    assert disagree.mean() < 0.02, disagree.mean()
    both = hx & hm
    same_cell = (np.asarray(r_ex.cell)[both] == np.asarray(r_m.cell)[both]).all(-1)
    # of rays where both tracers hit, allow the same small graze fraction
    # to land in an adjacent boundary cell
    assert same_cell.mean() > 0.98, same_cell.mean()


def test_rows_vs_skip_corner_tie_class_on_worldgen():
    """rows vs skip on worldgen terrain: bit-equal except rare corner ties.

    The two tracers compute boundary crossings with different arithmetic
    (windowed row march vs distance-field jump + DDA restart), so a ray
    passing exactly through a cell corner can resolve its hit FLAG either
    way (both outcomes are valid DDA results; the same FMA-order class as
    the beam pre-pass, docs/PERF.md:144). This is why app-level frames
    with entity instances can differ by +-1 u8 on isolated pixels: an
    instance bounce can spawn a corner-tie secondary ray. The contract:
    ties are rare even under adversarial rays, and every ray where BOTH
    tracers report a hit is field-for-field bit-equal.
    """
    from vrv_tpu.config import WorldConfig
    from vrv_tpu.render.scene import Scene
    from vrv_tpu.ops.dda_rows import trace_rows_auto

    wc = WorldConfig(size=(32, 32, 32), origin=(-16, -16, -16), seed=0)
    sc = Scene(wc)
    rng = np.random.default_rng(0)
    n = 20000
    # exact integer-corner origins + half axis-grazing directions: the
    # adversarial tie population (random rays essentially never tie)
    o = rng.integers(2, 30, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[: n // 2, rng.integers(0, 3)] *= 1e-4
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    r_rows = trace_rows_auto(
        sc.grid.shape, sc.rows, sc.translucent.shape[0],
        jnp.asarray(o), jnp.asarray(d), t_min=1e-3, t_max=1e4,
    )
    r_skip = dda.trace_skip(
        sc.grid, sc.dist, sc.translucent,
        jnp.asarray(o), jnp.asarray(d), t_min=1e-3, t_max=1e4,
    )
    h1, h2 = np.asarray(r_rows.hit), np.asarray(r_skip.hit)
    flips = int((h1 != h2).sum())
    assert flips <= 20, flips  # measured: 1/20000 under this population
    both = h1 & h2
    for field in ("t", "block", "face", "cell", "entering"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r_rows, field))[both],
            np.asarray(getattr(r_skip, field))[both],
        )
