"""Procedural tracer (ops/dda_proc.py) oracle tests.

The contract: trace_proc must be BIT-IDENTICAL to the grid tracers on any
worldgen(+edits) scene — same hit set, t, block, face, cell, entering —
because it re-evaluates the exact same occupancy function the grid was
generated from (game/chunk.py:58-86) with the exact same DDA step
formulas (ops/dda._trace_body).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops import dda
from vrv_tpu.ops.dda_proc import ProcStatic, build_coarse_dist, trace_proc


def _proc_static(wc, bt, shape, n_edits=0):
    return ProcStatic(
        seed=wc.seed, noise_scale=wc.noise_scale, y_falloff=wc.y_falloff,
        threshold=wc.threshold, origin=tuple(wc.origin), shape=shape,
        grass=int(bt.block_idx("grass")), stone=int(bt.block_idx("stone")),
        air=int(bt.air), n_edits=n_edits,
    )


@pytest.fixture(scope="module")
def worldgen_scene(block_table):
    """Grid built from the TRACER's own worldgen prediction (self-consistent
    by construction; the scene-level absorption path is what reconciles it
    with game/chunk worldgen — see test_worldgen_drift_is_near_threshold)."""
    from vrv_tpu.ops.dda_proc import worldgen_blocks

    g = 64
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    ps = _proc_static(wc, block_table, (g, g, g))
    xs, ys, zs = np.meshgrid(*[np.arange(g, dtype=np.int32)] * 3, indexing="ij")
    grid_np = np.asarray(
        worldgen_blocks(ps, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
                        jnp.asarray(zs.ravel()))
    ).reshape(g, g, g)
    return wc, grid_np


def test_worldgen_drift_is_near_threshold(block_table, worldgen_scene):
    """The worldgen program (game/chunk) and the tracer's prediction may
    disagree only on cells whose density sits within a whisker of the
    threshold (XLA fusion drift); such cells are absorbed as edits by
    Scene._sync_proc. Assert the drift class stays tiny and near-tie."""
    from vrv_tpu.game.chunk import _density, generate_dense_grid

    wc, grid_pred = worldgen_scene
    grid_gen = np.array(generate_dense_grid(wc, block_table))
    diff = np.argwhere(grid_gen != grid_pred)
    assert len(diff) <= 16, len(diff)
    for c in diff:
        w = c + np.asarray(wc.origin)
        dens_here = float(_density(jnp.float32(w[0]), jnp.float32(w[1]), jnp.float32(w[2]), wc))
        dens_above = float(_density(jnp.float32(w[0]), jnp.float32(w[1] + 1), jnp.float32(w[2]), wc))
        assert min(abs(dens_here - wc.threshold), abs(dens_above - wc.threshold)) < 1e-3


def _assert_traces_equal(ref, got):
    for f in ("hit", "t", "block", "face", "entering"):
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        assert (a == b).all(), f"{f}: {(a != b).sum()} mismatches"
    assert (np.asarray(ref.cell) == np.asarray(got.cell)).all()


def test_occupancy_matches_grid_everywhere(block_table, worldgen_scene):
    """Procedural occupancy == grid solidity at every cell (bit-exact)."""
    from vrv_tpu.ops.dda_proc import _make_occupancy, assemble

    wc, grid_np = worldgen_scene
    g = grid_np.shape[0]
    pw = assemble(_proc_static(wc, block_table, grid_np.shape), {})
    xs, ys, zs = np.meshgrid(*[np.arange(g)] * 3, indexing="ij")
    s = np.asarray(
        _make_occupancy(pw)(
            jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), jnp.asarray(zs.ravel()),
            jnp.ones(g ** 3, bool),
        )
    )
    assert (s == (grid_np != block_table.air).ravel()).all()


def test_trace_proc_matches_trace_skip_random_rays(block_table, worldgen_scene):
    wc, grid_np = worldgen_scene
    g = grid_np.shape[0]
    grid = jnp.asarray(grid_np)
    translucent = jnp.asarray(block_table.translucent)
    dist = dda.build_distance_field(grid, block_table.air)
    coarse = jnp.asarray(build_coarse_dist(grid_np, block_table.air))
    ps = _proc_static(wc, block_table, grid_np.shape)

    # random origins both inside and outside the grid, random directions
    o = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (20000, 3), minval=-20.0, maxval=g + 20.0)
    )
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (20000, 3)))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    ref = dda.trace_skip(grid, dist, translucent, jnp.asarray(o), jnp.asarray(d))
    got = trace_proc(ps, jnp.asarray(o), jnp.asarray(d), pd={"coarse": coarse})
    _assert_traces_equal(ref, got)
    # coarse-free mode must agree too
    got_nc = trace_proc(ps._replace(use_coarse=False), jnp.asarray(o), jnp.asarray(d))
    _assert_traces_equal(ref, got_nc)


def test_trace_proc_with_edits(block_table, worldgen_scene):
    """Break a block, add a lamp, add glass: still bit-identical."""
    wc, grid_np = worldgen_scene
    bt = block_table
    grid_np = grid_np.copy()
    solid = bt.solid[grid_np]
    sc_cells = np.argwhere(solid)
    ac_cells = np.argwhere(~solid)
    edits = [
        (tuple(sc_cells[len(sc_cells) // 2]), bt.air),
        (tuple(ac_cells[len(ac_cells) // 3]), bt.block_idx("lamp")),
        (tuple(ac_cells[2 * len(ac_cells) // 3]), bt.block_idx("glass")),
    ]
    for c, b in edits:
        grid_np[c] = b
    grid = jnp.asarray(grid_np)
    translucent = jnp.asarray(bt.translucent)
    dist = dda.build_distance_field(grid, bt.air)
    coarse = jnp.asarray(build_coarse_dist(grid_np, bt.air))

    E = 4
    cells = np.full((E, 3), -(1 << 20), np.int32)
    blocks = np.full(E, bt.air, np.uint8)
    solidv = np.zeros(E, bool)
    transl = np.ones(E, bool)
    for i, (c, b) in enumerate(edits):
        cells[i] = c
        blocks[i] = b
        solidv[i] = b != bt.air
        transl[i] = bool(bt.translucent[b])
    ps = _proc_static(wc, bt, grid_np.shape, n_edits=E)
    pd = dict(
        coarse=coarse,
        edit_cells=jnp.asarray(cells), edit_blocks=jnp.asarray(blocks),
        edit_solid=jnp.asarray(solidv), edit_translucent=jnp.asarray(transl),
    )

    g = grid_np.shape[0]
    o = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (20000, 3), minval=0.0, maxval=float(g))
    )
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (20000, 3)))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    # plus point-blank rays at each edited cell from all 6 adjacent cell
    # centres, so every edit is guaranteed to be hit through SOME air face
    aim_o, aim_d = [], []
    for c, _ in edits:
        tgt = np.asarray(c, np.float64) + 0.5
        for ax in range(3):
            for sgn in (-1.0, 1.0):
                off = np.zeros(3)
                off[ax] = sgn
                aim_o.append(tgt + off)
                aim_d.append(-off)
    o = np.concatenate([o, np.asarray(aim_o, np.float32)])
    d = np.concatenate([d, np.asarray(aim_d, np.float32)])

    ref = dda.trace_skip(grid, dist, translucent, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    got = trace_proc(ps, jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), pd=pd)
    _assert_traces_equal(ref, got)
    # the lamp and glass edits must actually be reachable/hit
    hit_blocks = np.asarray(got.block)[np.asarray(got.hit)]
    assert (hit_blocks == bt.block_idx("lamp")).any()
    assert (hit_blocks == bt.block_idx("glass")).any()


def test_scene_proc_bundle_and_frame_identity(block_table):
    """Scene wires the proc tracer end-to-end: frames are byte-identical
    to the grid tracer, across megakernel and wavefront modes."""
    from vrv_tpu.render.scene import Scene

    wc = WorldConfig(size=(48, 48, 48), origin=(-24, -24, -24), seed=0)
    sc = Scene(wc)
    assert sc.proc_static is not None and sc.proc_static.n_edits == 0
    assert sc.set_block((0, 5, 0), block_table.block_idx("lamp"))
    assert sc.proc_static.n_edits == 4  # pow2 bucket (min 4)

    eye = np.array([4.0, 18.0, -16.0])
    front = np.array([0.0, -0.5, 0.866], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.866, -0.5], np.float32)
    base = RenderConfig(width=48, height=32, samples_per_pixel=2, max_bounces=3)
    img_skip = np.asarray(sc.render(eye, front, right, up, 0, base.replace(tracer="skip")))
    img_proc = np.asarray(sc.render(eye, front, right, up, 0, base.replace(tracer="proc")))
    assert (img_skip == img_proc).all()
    wf = np.asarray(
        sc.render(eye, front, right, up, 0,
                  base.replace(tracer="proc", mode="wavefront", beam_prepass=False))
    )
    mk = np.asarray(
        sc.render(eye, front, right, up, 0, base.replace(tracer="skip", beam_prepass=False))
    )
    assert (wf == mk).all()


def test_scene_proc_disabled_for_foreign_grids(block_table):
    """A hand-built grid is not worldgen+edits: proc must be unavailable
    and tracer='proc' must silently fall back to the grid tracers."""
    from vrv_tpu.render.scene import Scene

    wc = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(wc.size, block_table.air, np.uint8)
    grid[:, :3, :] = block_table.block_idx("stone")
    sc = Scene(wc, table=block_table, grid=grid)
    assert sc.proc_static is None
    eye = np.array([8.0, 10.0, 8.0])
    front = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=1, max_bounces=1)
    a = np.asarray(sc.render(eye, front, right, up, 0, cfg.replace(tracer="proc")))
    b = np.asarray(sc.render(eye, front, right, up, 0, cfg.replace(tracer="rows")))
    assert (a == b).all()


def test_coarse_dist_certificate(block_table, worldgen_scene):
    """v >= 1 at block C certifies: every cell within chebyshev radius
    8*(v-1) of C's box is air (brute-force check)."""
    _, grid_np = worldgen_scene
    coarse = build_coarse_dist(grid_np, block_table.air)
    solid = grid_np != block_table.air
    B = 8
    Cx, Cy, Cz = coarse.shape
    occ = solid.reshape(Cx, B, Cy, B, Cz, B).any(axis=(1, 3, 5))
    assert ((coarse == 0) == occ).all()
    for v in range(1, int(coarse.max()) + 1):
        cs = np.argwhere(coarse == v)
        for c in cs[:: max(1, len(cs) // 8)]:
            r = v - 1
            lo = np.maximum(c - r, 0)
            hi = np.minimum(c + r + 1, coarse.shape)
            assert not occ[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]].any()


def test_incremental_proc_sync_matches_full(block_table):
    """scene._sync_proc_edit (per-edit diff-map update) must produce the
    same proc view as a full _sync_proc re-derivation after any edit
    sequence, including edits that restore pristine worldgen cells."""
    import numpy as np

    from vrv_tpu.config import WorldConfig
    from vrv_tpu.render.scene import Scene

    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    stone = int(block_table.block_idx("stone"))
    lamp = int(block_table.block_idx("lamp"))
    air = int(block_table.air)

    rng = np.random.default_rng(3)
    placed = []
    for i in range(12):
        c = rng.integers(2, g - 2, 3) + np.asarray(wc.origin)
        sc.set_block(c, [stone, lamp, air][i % 3])
        placed.append(c)
    for c in placed[:4]:  # restore some cells to their original value
        cell = tuple(np.asarray(c) - np.asarray(wc.origin))
        sc.set_block(c, int(sc._pristine[cell]))

    inc_static, inc_arrays = sc.proc_static, sc.proc_arrays
    sc._sync_proc()  # full re-derivation from the grid
    assert sc.proc_static == inc_static
    if inc_static is not None and inc_static.n_edits:
        for k in ("edit_cells", "edit_blocks", "edit_solid", "edit_translucent"):
            np.testing.assert_array_equal(
                np.asarray(inc_arrays[k]), np.asarray(sc.proc_arrays[k]), err_msg=k
            )
    np.testing.assert_array_equal(
        np.asarray(inc_arrays["coarse"]), np.asarray(sc.proc_arrays["coarse"])
    )
