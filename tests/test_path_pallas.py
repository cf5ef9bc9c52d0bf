"""Fused multi-bounce path kernel vs the staged megakernel (interpret).

In interpret mode both paths compile with XLA, so the fused render must
be BIT-identical to the staged per-bounce render: same traces, same
murmur3 draws, textually-matched sampling formulas.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import vrv_tpu.ops.pallas.trace_proc as tp
from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene


@pytest.fixture
def interpret_pallas():
    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def _cam():
    eye = np.array([0.0, 14.0, -10.0], np.float32)
    front = np.array([0.0, -0.5, 0.866], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.866, -0.5], np.float32)
    return eye, front, right, up


def test_fused_path_bit_identical_to_staged(block_table, interpret_pallas):
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    # preconditions for the fused kernel (guard against a vacuous pass)
    assert sc.proc_static is not None and sc.proc_static.n_edits == 0
    assert sc.proc_static.lambert_only
    assert sc.bvh_device is None  # worldgen scene: no lights

    eye, front, right, up = _cam()
    base = RenderConfig(width=24, height=16, samples_per_pixel=2, max_bounces=3,
                        tracer="proc", pallas_unroll=1)

    # sentinel: the fused kernel must actually be used
    import vrv_tpu.ops.pallas.path_proc as pp

    calls = []
    real = pp.trace_path_pallas

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    pp.trace_path_pallas = spy
    try:
        fused = np.asarray(sc.render_samples(
            eye, front, right, up, 0, base.replace(proc_backend="pallas")
        ))
    finally:
        pp.trace_path_pallas = real
    assert calls, "fused path kernel was not dispatched"

    staged = np.asarray(sc.render_samples(
        eye, front, right, up, 0, base.replace(proc_backend="xla")
    ))
    assert fused.shape == staged.shape
    mism = (fused != staged).sum()
    assert mism == 0, f"{mism} component mismatches (of {fused.size})"


def test_fused_path_records_match_staged_traces(block_table, interpret_pallas):
    """Per-bounce trace records from the path kernel equal the staged
    tracer's results along the same (kernel-sampled) direction chain."""
    import jax

    from vrv_tpu.ops import rng, shade
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.ops.dda_proc import trace_proc
    from vrv_tpu.ops.pallas.path_proc import trace_path_pallas

    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    assert sc.proc_static.n_edits == 0
    eye, front, right, up = _cam()
    W, H, S, B = 20, 12, 1, 3
    o, d, seeds = raygen(
        sc.camera_to_local(eye), jnp.asarray(front), jnp.asarray(right),
        jnp.asarray(up), W, H, S, jnp.uint32(0),
    )
    n = S * H * W
    o = o.reshape(n, 3)
    d = d.reshape(n, 3)
    seeds = seeds.reshape(n)
    traces, dirs, _, _ = trace_path_pallas(
        sc.proc_static, o, d, seeds, B, pd=sc.proc_arrays, interpret=True,
        unroll=1,
    )
    # bounce 0 must equal a plain trace
    ref0 = trace_proc(sc.proc_static, o, d, pd=sc.proc_arrays)
    for f in ("hit", "t", "block", "face", "entering"):
        assert (np.asarray(getattr(ref0, f)) == np.asarray(getattr(traces[0], f))).all(), f
    # each later bounce must equal a plain trace from the recorded chain
    cur_o, cur_d = o, d
    for b in range(1, B):
        tr_prev = traces[b - 1]
        hit_p = cur_o + tr_prev.t[:, None] * cur_d
        nxt_o = jnp.where(tr_prev.hit[:, None], hit_p, 0.0)
        nxt_d = dirs[b - 1]
        ref = trace_proc(sc.proc_static, nxt_o, nxt_d, pd=sc.proc_arrays)
        live = np.asarray(tr_prev.hit)
        for f in ("hit", "face", "entering"):
            a = np.asarray(getattr(ref, f))[live]
            bv = np.asarray(getattr(traces[b], f))[live]
            assert (a == bv).all(), f"bounce {b}: {f}"
        # t only approximately: this test recomputes hit_p in its own
        # jnp expression, which XLA may FMA-contract differently from
        # the kernel's internal origin chain (1-ulp origin shifts move
        # the recorded plane-crossing t by ulps). The production fused
        # path needs no reconstruction — see the bit-identity test above.
        np.testing.assert_allclose(
            np.asarray(ref.t)[live], np.asarray(traces[b].t)[live],
            rtol=1e-5, atol=1e-5, err_msg=f"bounce {b}: t",
        )
        cur_o, cur_d = nxt_o, nxt_d


@pytest.mark.parametrize("pose,seed", [
    # inside-terrain view, different world seed
    ((np.array([2.0, 6.0, 2.0]), 0.9, -0.2), 3),
    # horizon-grazing view (tail-ray class)
    ((np.array([0.0, 17.0, -14.0]), 0.1, -0.05), 0),
    # looking straight up into sky (fast-miss class)
    ((np.array([0.0, 20.0, 0.0]), 0.0, 1.2), 1),
])
def test_fused_path_bit_identical_poses(block_table, interpret_pallas, pose, seed):
    """The fused==staged bit-identity gate across ray-population classes
    (terrain-dense, grazing-tail, sky-heavy) and world seeds."""
    from vrv_tpu.camera import dir_vecs

    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2),
                     seed=seed)
    sc = Scene(wc, table=block_table)
    if sc.proc_static is None or sc.proc_static.n_edits:
        pytest.skip("worldgen drift produced edits; fused path not eligible")
    eye, yaw, pitch = pose
    front, right, up = dir_vecs(np.array([0.0, -1.0, 0.0]), pitch, yaw)
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=2, max_bounces=4,
                       tracer="proc", pallas_unroll=1)
    fused = np.asarray(sc.render_samples(
        eye, front, right, up, 7, cfg.replace(proc_backend="pallas")))
    staged = np.asarray(sc.render_samples(
        eye, front, right, up, 7, cfg.replace(proc_backend="xla")))
    assert (fused == staged).all()


def test_fused_path_with_edits_bit_identical(block_table, interpret_pallas):
    """Lambert-safe world edits (a placed stone, a broken block) keep the
    fused kernel eligible and bit-identical to the staged render — the
    edit-survival property of VERDICT r2 item 1 (the reference keeps full
    render speed across edits, chunk_manager.rs:331-392)."""
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    assert sc.proc_static.n_edits == 0

    # real gameplay edits through the Scene API
    grid_np = np.asarray(sc.grid)
    solid = block_table.solid[grid_np]
    col = solid[g // 2, :, g // 2]
    ys = np.nonzero(col)[0]
    y_top = int(ys.max())
    org = np.asarray(wc.origin)
    assert sc.set_block(np.array([g // 2, y_top + 1, g // 2]) + org,
                        int(block_table.block_idx("stone")))  # place
    assert sc.set_block(np.array([g // 2, y_top, g // 2]) + org,
                        int(block_table.air))                 # break
    assert sc.proc_static.n_edits > 0
    assert sc.proc_static.edits_lambert
    assert sc.bvh_device is None

    eye, front, right, up = _cam()
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2, max_bounces=3,
                       tracer="proc", pallas_unroll=1)

    import vrv_tpu.ops.pallas.path_proc as pp

    calls = []
    real = pp.trace_path_pallas

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    pp.trace_path_pallas = spy
    try:
        fused = np.asarray(sc.render_samples(
            eye, front, right, up, 0, cfg.replace(proc_backend="pallas")))
    finally:
        pp.trace_path_pallas = real
    assert calls, "fused path kernel was not dispatched on the edited world"

    staged = np.asarray(sc.render_samples(
        eye, front, right, up, 0, cfg.replace(proc_backend="xla")))
    assert (fused == staged).all()

    # the edits actually took effect (a ray aimed straight down the edited
    # column resolves the placed stone one cell higher than pristine)
    from vrv_tpu.ops.dda_proc import trace_proc

    o_probe = jnp.asarray([[g / 2 + 0.5, g - 0.5, g / 2 + 0.5]], jnp.float32)
    d_probe = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    tr_edit = trace_proc(sc.proc_static, o_probe, d_probe, pd=sc.proc_arrays)
    sc2 = Scene(wc, table=block_table)
    tr_base = trace_proc(sc2.proc_static, o_probe, d_probe, pd=sc2.proc_arrays)
    assert int(tr_edit.cell[0, 1]) == y_top + 1
    assert int(tr_base.cell[0, 1]) != y_top + 1


def test_glass_edit_stays_fused_since_round5(block_table, interpret_pallas):
    """A glass (transmissive) edit used to evict the FUSED kernel; since
    round 5 the glass class (ProcStatic.edit_glass: translucency carry +
    byte-exact alpha trees) stays in-kernel and matches the staged XLA
    tracer bit-for-bit. A genuinely unfusable block (texturetest:
    texel-varying alpha, opaque) still evicts — gated in
    tests/test_edit_mirror.py."""
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    grid_np = np.asarray(sc.grid)
    solid = block_table.solid[grid_np]
    ys = np.nonzero(solid[g // 2, :, g // 2])[0]
    org = np.asarray(wc.origin)
    assert sc.set_block(np.array([0, int(ys.max()) + 2, 0]) + org,
                        int(block_table.block_idx("glass")))
    assert not sc.proc_static.edits_lambert
    assert sc.proc_static.edits_fused and sc.proc_static.edit_glass

    eye, front, right, up = _cam()
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=1, max_bounces=3,
                       tracer="proc", pallas_unroll=1,
                       pallas_inkernel_radiance=False)

    import vrv_tpu.ops.pallas.path_proc as pp

    fused_calls = []
    real_f = pp.trace_path_pallas
    pp.trace_path_pallas = lambda *a, **k: (
        fused_calls.append(1), real_f(*a, **k))[1]
    try:
        got = np.asarray(sc.render_samples(
            eye, front, right, up, 0, cfg.replace(proc_backend="pallas")))
    finally:
        pp.trace_path_pallas = real_f
    assert fused_calls

    ref = np.asarray(sc.render_samples(
        eye, front, right, up, 0, cfg.replace(proc_backend="xla")))
    assert (got == ref).all()


def test_fused_path_edge_ray_classes(block_table, interpret_pallas):
    """Bounce-0 records for edge ray classes: origins outside the grid
    (boundary-entry hits), degenerate directions, axis-aligned rays."""
    import jax

    from vrv_tpu.ops.dda_proc import trace_proc
    from vrv_tpu.ops.pallas.path_proc import trace_path_pallas

    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    assert sc.proc_static.n_edits == 0

    rng_ = np.random.default_rng(11)
    n = 2000
    o = rng_.uniform(-12.0, g + 12.0, (n, 3)).astype(np.float32)
    d = rng_.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[0] = 0                 # degenerate
    d[1] = [0, 1, 0]         # axis-aligned into terrain
    d[2] = [0, 0, -1]
    o[3] = [-5.0, 10.0, 10.0]
    d[3] = [1, 0, 0]         # enters through the -x boundary
    seeds = rng_.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)

    traces, dirs, _, _ = trace_path_pallas(
        sc.proc_static, jnp.asarray(o), jnp.asarray(d), jnp.asarray(seeds),
        3, pd=sc.proc_arrays, interpret=True, unroll=1,
    )
    ref0 = trace_proc(sc.proc_static, jnp.asarray(o), jnp.asarray(d),
                      pd=sc.proc_arrays)
    for f in ("hit", "t", "block", "face", "entering"):
        a, b = np.asarray(getattr(ref0, f)), np.asarray(getattr(traces[0], f))
        assert (a == b).all(), f"{f}: {(a != b).sum()} mismatches"
    # sampled dirs are unit for advanced rays, zero for dead paths
    d1 = np.asarray(dirs[0])
    adv = np.asarray(traces[0].hit)
    ln = np.linalg.norm(d1, axis=-1)
    assert np.allclose(ln[adv], 1.0, atol=1e-5)
    assert (ln[~adv] == 0).all()
