"""Per-chunk edit gating (VERDICT r4 item 4a): E > EDIT_GATE_MIN edit
rows ride a block-level lax.cond — the O(E) per-step compare runs only
in chunks whose lanes can reach the edit-set AABB; everywhere else the
chunk marches the pure-worldgen body, which is bit-identical because no
reachable cell is edited. PROC_EDIT_CAP is now 1024 (was 64: the 65th
edit used to evict the proc tracer entirely — the order-of-magnitude
cliff VERDICT r4 named).
"""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def _edited_scene(block_table, n_edits=24, g=32, lamp=True):
    """Worldgen scene with a cluster of mixed lambert edits on the
    surface (places + breaks) plus optional lamp — enough rows to engage
    the gate (pad > EDIT_GATE_MIN)."""
    from vrv_tpu.ops.pallas.trace_proc import EDIT_GATE_MIN

    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2),
                     seed=0)
    sc = Scene(wc, table=block_table)
    bt = block_table
    org = np.asarray(wc.origin)
    solid = bt.solid[sc._grid_np]
    rng = np.random.default_rng(7)
    soil = int(bt.block_idx("soil"))
    stone = int(bt.block_idx("stone"))
    placed = 0
    while placed < n_edits:
        x = int(rng.integers(2, g - 2))
        z = int(rng.integers(2, g - 2))
        ys = np.nonzero(solid[x, :, z])[0]
        if not len(ys) or ys.max() + 1 >= g:
            continue
        ytop = int(ys.max())
        if placed % 3 == 2:
            cell, bid = np.array([x, ytop, z]), int(bt.air)  # break
        else:
            cell, bid = np.array([x, ytop + 1, z]), (
                soil if placed % 2 else stone)
        if sc.set_block(cell + org, bid):
            placed += 1
    if lamp:
        ys = np.nonzero(solid[g // 2, :, g // 2])[0]
        sc.set_block(
            np.array([g // 2, int(ys.max()) + 1, g // 2]) + org,
            int(bt.block_idx("lamp")),
        )
    assert sc.proc_static is not None, "edits must stay within the cap"
    assert sc.proc_static.n_edits > EDIT_GATE_MIN, "gate must engage"
    eye = np.array([0.0, 10.0, -g * 0.75])
    import jax.numpy as jnp

    front = jnp.asarray([0.0, -0.45, 0.893], jnp.float32)
    right = jnp.asarray([-1.0, 0.0, 0.0], jnp.float32)
    up = jnp.asarray([0.0, -0.893, -0.45], jnp.float32)
    return sc, (eye, front, right, up)


def test_gated_march_bit_identical(block_table):
    """Fused kernel with the per-chunk edit gate vs the staged XLA tracer
    (dense per-step edits): bit-identical frames."""
    sc, cam = _edited_scene(block_table)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_bounces=3, beam_prepass=False, pallas_unroll=2,
                       pallas_inkernel_nee=False,
                       pallas_inkernel_radiance=False)
    fused = np.asarray(sc.render_samples(
        *cam, 1, cfg.replace(proc_backend="pallas", nee_mode="auto")))
    staged = np.asarray(sc.render_samples(
        *cam, 1, cfg.replace(proc_backend="xla", nee_mode="split")))
    assert (fused == staged).all(), np.abs(fused - staged).max()
    assert fused.std() > 1.0


def test_gated_march_ikr(block_table):
    """The production (in-kernel radiance) path over the same gated edit
    set — the ikr gate tolerance."""
    from tests.test_inkernel_radiance import _ab, _check

    sc, cam = _edited_scene(block_table)
    on, off, ran = _ab(sc, cam, RenderConfig(
        width=24, height=16, samples_per_pixel=2, max_bounces=3,
        tracer="proc", pallas_unroll=2, proc_backend="pallas"))
    assert ran
    _check(on, off)


def test_cap_raised_past_64(block_table):
    """65+ edits used to disable the proc tracer (PROC_EDIT_CAP = 64);
    the gate makes larger sets viable — 80 edits must keep proc_static
    alive and render identically to the staged tracer."""
    sc, cam = _edited_scene(block_table, n_edits=80, g=32, lamp=False)
    assert sc.proc_static is not None
    assert sc.proc_static.n_edits == 128  # pow2 bucket
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=1,
                       max_bounces=2, beam_prepass=False, pallas_unroll=2,
                       pallas_inkernel_radiance=False)
    fused = np.asarray(sc.render_samples(
        *cam, 1, cfg.replace(proc_backend="pallas", nee_mode="auto")))
    staged = np.asarray(sc.render_samples(
        *cam, 1, cfg.replace(proc_backend="xla", nee_mode="split")))
    assert (fused == staged).all(), np.abs(fused - staged).max()


def test_gate_and_cmp_formulations_identical(block_table):
    """Every (edit_gate_mode, edit_cmp) combination is VALUE-identical —
    the knobs exist only to let the chip A/B price the formulations
    (docs/PERF.md round-5 gate hunt)."""
    sc, cam = _edited_scene(block_table, n_edits=12, g=32, lamp=False)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=1,
                       max_bounces=2, beam_prepass=False, pallas_unroll=2,
                       pallas_inkernel_radiance=False)
    base_ps = sc.proc_static
    ref = None
    for gate in ("boxes", "aabb", "off"):
        for cmp_ in ("i32", "bool"):
            sc.proc_static = base_ps._replace(
                edit_gate_mode=gate, edit_cmp=cmp_)
            img = np.asarray(sc.render_samples(
                *cam, 1, cfg.replace(proc_backend="pallas")))
            if ref is None:
                ref = img
            else:
                assert (img == ref).all(), (gate, cmp_)
    sc.proc_static = base_ps
    assert ref.std() > 0.5
