"""Mirror-class edits stay on the fused path (VERDICT r4 item 4b).

The DEFAULT placed block is the mirror (quirk Q7,
reference src/game_system/ego_controls_manager.rs:43 + block.rs
alphabetical ids), so the first right-click of a session used to evict
the fused kernel (edits_lambert gate). ProcStatic.edit_mats now carries
per-face constant metallicity for constant-material OPAQUE edit blocks,
and the kernel's retire branches reflect-vs-cosine on draw slot 0 —
exactly shade_resolved's branch on the fetched (constant) metallicity.
Glass edits (texel-varying alpha, translucent march) still fall back.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vrv_tpu.config import RenderConfig

from tests.test_path_inst import _ego_scene, _fused_vs_staged


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def _place(sc, block_name_or_id, dx=1, dz=1):
    g = sc.grid.shape[0]
    bt = sc.table
    org = np.asarray(sc.world_cfg.origin)
    solid = bt.solid[sc._grid_np]
    ys = np.nonzero(solid[g // 2 + dx, :, g // 2 + dz])[0]
    ytop = int(ys.max())
    bid = (block_name_or_id if isinstance(block_name_or_id, int)
           else int(bt.block_idx(block_name_or_id)))
    assert sc.set_block(
        np.array([g // 2 + dx, ytop + 1, g // 2 + dz]) + org, bid)


def test_mirror_edit_stays_fused_bit_identical(block_table):
    """Place a mirror (the default block) next to the lamp: the fused
    kernel must still engage and match the staged XLA path bit-for-bit
    (in-kernel NEE + radiance pinned off to isolate the scatter branch,
    like the instance gates)."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    _place(sc, "mirror")
    assert sc.proc_static is not None
    assert not sc.proc_static.edits_lambert
    assert sc.proc_static.edits_fused
    assert dict(sc.proc_static.edit_mats)[
        int(block_table.block_idx("mirror"))] == (1.0,) * 6
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_bounces=3, beam_prepass=False, pallas_unroll=1,
                       pallas_inkernel_nee=False,
                       pallas_inkernel_radiance=False)
    fused, staged, _ = _fused_vs_staged(sc, cam, cfg)
    assert (fused == staged).all(), np.abs(fused - staged).max()
    assert fused.std() > 1.0


def test_mirror_edit_inkernel_radiance(block_table):
    """Same scene through the production in-kernel-radiance path: the
    recorded branch code must reproduce the replay to the ikr gate's
    tolerance."""
    from tests.test_inkernel_radiance import _ab, _check

    sc, cam = _ego_scene(block_table, with_lamp=True)
    _place(sc, "mirror")
    on, off, ran = _ab(sc, cam, RenderConfig(
        width=32, height=24, samples_per_pixel=2, max_bounces=3,
        tracer="proc", pallas_unroll=1, proc_backend="pallas"))
    assert ran
    _check(on, off)


def test_unfusable_edit_still_falls_back(block_table):
    """EVERY shipped block is now in a fused edit class (lambert /
    mirror-class / glass-class — the full VERDICT r4 item-4 closure), so
    the eviction path needs a synthetic outsider: texel-VARYING
    metallicity fails every class and must clear edits_fused; the
    staged path then renders without error."""
    import dataclasses

    met = np.array(block_table.metallicity, copy=True)
    tt = int(block_table.block_idx("texturetest"))
    met[tt * 6][0, 0, 0] = 0.5  # one texel differs
    bt2 = dataclasses.replace(block_table, metallicity=met)
    sc, cam = _ego_scene(bt2, with_lamp=False)
    _place(sc, "texturetest")
    assert not sc.proc_static.edits_fused
    import vrv_tpu.ops.pallas.path_proc as pp

    calls = []
    real = pp.trace_path_pallas
    pp.trace_path_pallas = lambda *a, **k: (calls.append(1), real(*a, **k))[1]
    try:
        img = np.asarray(sc.render_samples(*cam, 1, RenderConfig(
            width=16, height=8, samples_per_pixel=1, max_bounces=2,
            tracer="proc", pallas_unroll=1, proc_backend="pallas")))
    finally:
        pp.trace_path_pallas = real
    assert not calls  # fused kernel must not engage
    assert np.isfinite(img).all()


def test_mirror_edit_actually_reflects(block_table):
    """Behavioral check: a mirror placed flat on the terrain reflects the
    sky into the camera brighter than the grass it replaced (the scatter
    branch is really taking the reflect path, not cosine)."""
    sc, cam = _ego_scene(block_table, with_lamp=False)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=4,
                       max_bounces=3, tracer="proc", pallas_unroll=1,
                       proc_backend="pallas")
    before = np.asarray(sc.render_samples(*cam, 1, cfg)).mean(0)
    _place(sc, "mirror", dx=0, dz=0)
    after = np.asarray(sc.render_samples(*cam, 1, cfg)).mean(0)
    assert not np.array_equal(before, after)
    # the mirror face region should brighten toward sky radiance (50)
    assert after.max() > before.mean()
