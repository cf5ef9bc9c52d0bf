"""cfg.pallas_inkernel_radiance: the fused kernel resolves material keys,
scatter branches and NEE direct-term factors in-core; the XLA side
collapses to one packed-atlas row fetch per bounce + the accumulation
chain (docs/PERF.md round-5; VERDICT r4 item 3).

The records mirror shade.resolve_hit / shade_resolved / the batched
accumulation formula-for-formula, so the honest gate is the in-kernel-NEE
class: ~1-ulp relative agreement across the two XLA graphs plus packed
u8 frames within one quantization step (in practice bit-identical on the
local XLA; the tolerance guards compiler-version drift — see
tests/test_tile_shape.py's rationale).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vrv_tpu.config import RenderConfig

from tests.test_path_inst import _ego_scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


BASE = dict(width=48, height=32, samples_per_pixel=2, max_bounces=3,
            tracer="proc", pallas_unroll=1, proc_backend="pallas")


def _ab(sc, cam, cfg):
    """(ikr frame, replay frame, ikr-ran flag) for one config."""
    import vrv_tpu.ops.pallas.path_proc as pp
    from vrv_tpu.render import scene as scene_mod

    # a cached traced fn never re-enters Python, so the spy below would
    # miss ikr engagement on an identical static key from a prior test
    scene_mod._jit_render_samples.cache_clear()
    ran = []
    real = pp.trace_path_pallas
    pp.trace_path_pallas = lambda *a, **k: (
        ran.append(bool(k.get("radiance"))), real(*a, **k))[1]
    try:
        on = np.asarray(sc.render_samples(
            *cam, 1, cfg.replace(pallas_inkernel_radiance=True)))
        ran_on = any(ran)
        ran.clear()
        off = np.asarray(sc.render_samples(
            *cam, 1, cfg.replace(pallas_inkernel_radiance=False)))
        assert not any(ran)
    finally:
        pp.trace_path_pallas = real
    return on, off, ran_on


def _check(on, off):
    from vrv_tpu.render.megakernel import pack_bgra

    rel = np.abs(on - off) / np.maximum(np.abs(off), 1e-6)
    assert rel.max() < 1e-5, f"max rel {rel.max()}"
    pa = np.asarray(pack_bgra(jnp.asarray(on.mean(0))))
    pb = np.asarray(pack_bgra(jnp.asarray(off.mean(0))))
    du8 = np.abs(pa.astype(np.int32) - pb.astype(np.int32))
    assert du8.max() <= 1, f"max u8 delta {du8.max()}"
    assert (du8 != 0).mean() < 1e-3


def test_ikr_graded_scene(block_table):
    """Lamp edit (lights + edit list) + ego-cube instance — the graded
    entry configuration."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    assert sc.light_em is not None  # shipped lamp palettes qualify
    on, off, ran = _ab(sc, cam, RenderConfig(**BASE))
    assert ran, "in-kernel radiance did not engage on the graded scene"
    _check(on, off)
    assert on.std() > 1.0  # non-trivial image


def test_ikr_no_lights(block_table):
    sc, cam = _ego_scene(block_table, with_lamp=False)
    on, off, ran = _ab(sc, cam, RenderConfig(**BASE))
    assert ran
    _check(on, off)


def test_ikr_mixed_edits(block_table):
    """Lambert edits of several block types (incl. an air hole) exercise
    the in-retire edit-block override for t_mat."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    g = sc.grid.shape[0]
    org = np.asarray(sc.world_cfg.origin)
    grid_np = sc._grid_np
    solid = block_table.solid[grid_np]
    ys = np.nonzero(solid[g // 2, :, g // 2])[0]
    ytop = int(ys.max())
    soil = int(block_table.block_idx("soil"))
    assert sc.set_block(np.array([g // 2 - 2, ytop + 1, g // 2]) + org, soil)
    assert sc.set_block(np.array([g // 2, ytop, g // 2 - 2]) + org,
                        int(block_table.air))  # break -> air hole
    on, off, ran = _ab(sc, cam, RenderConfig(**BASE))
    assert ran
    _check(on, off)


def test_ikr_without_light_palettes_falls_back(block_table):
    """light_em unavailable (forced) -> ikr must not engage on a lit
    scene; frames match the replay path trivially."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    sc.light_em = None
    import vrv_tpu.ops.pallas.path_proc as pp
    from vrv_tpu.render import scene as scene_mod

    scene_mod._jit_render_samples.cache_clear()
    ran = []
    real = pp.trace_path_pallas
    pp.trace_path_pallas = lambda *a, **k: (
        ran.append(bool(k.get("radiance"))), real(*a, **k))[1]
    try:
        sc.render_samples(*cam, 1, RenderConfig(**BASE))
    finally:
        pp.trace_path_pallas = real
    assert ran and not any(ran)
