"""Batched shading over the fused kernel's recorded chain.

cfg.pallas_batched_shade collapses the per-bounce shade/NEE fusions into
ONE shade_resolved call over all NEE bounces' concatenated rows (the
geometry resolve stays per-bounce — the origin chain is sequential by
nature). shade_resolved is row-independent (elementwise math, per-row
one-hot matmuls, (seed, slot)-keyed draws), so the batched render must be
BIT-identical to the per-bounce loop — on the full graded feature set
(lamp -> split NEE, edit list, in-kernel ego-cube instance).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene

from tests.test_path_inst import _ego_scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def _cam():
    eye = np.array([0.0, 14.0, -10.0], np.float32)
    front = jnp.asarray([0.0, -0.5, 0.866], jnp.float32)
    right = jnp.asarray([-1.0, 0.0, 0.0], jnp.float32)
    up = jnp.asarray([0.0, -0.866, -0.5], jnp.float32)
    return eye, front, right, up


def _render(sc, cam, cfg, batched):
    # iknee pinned OFF: in-kernel NEE requires batched shading, so with
    # the production default (on) the loop render would silently compare
    # the iknee estimator against the split one (same estimate within
    # 1 ulp, not bitwise — that contract lives in test_inkernel_nee.py).
    # This gate isolates the batched-vs-loop SHADE identity.
    return np.asarray(sc.render_samples(
        *cam, 0,
        cfg.replace(proc_backend="pallas", pallas_batched_shade=batched,
                    pallas_inkernel_nee=False),
    ))


def test_batched_shade_bit_identical_full_scene(block_table):
    """Lamp (split NEE) + edit list + in-kernel instance — the graded
    entry-scene feature set — batched vs per-bounce loop, bitwise."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    assert sc.proc_static.n_edits > 0 and sc.bvh_device is not None
    assert sc.inst_static is not None
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_bounces=3, tracer="proc", pallas_unroll=1)

    # sentinel: the batched path must actually shrink the shade-call count
    # (2 calls: NEE bounces + the truncated last bounce) vs B per-bounce
    from vrv_tpu.ops import shade as shade_mod

    calls = []
    real = shade_mod.shade_resolved

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    shade_mod.shade_resolved = spy
    try:
        batched = _render(sc, cam, cfg, True)
        n_batched = len(calls)
        calls.clear()
        loop = _render(sc, cam, cfg, False)
        n_loop = len(calls)
    finally:
        shade_mod.shade_resolved = real
    assert n_batched == 2 and n_loop == cfg.max_bounces

    assert batched.shape == loop.shape
    mism = (batched != loop).sum()
    assert mism == 0, f"{mism} component mismatches (of {batched.size})"


def test_batched_shade_bit_identical_no_lights(block_table):
    """No-light worldgen scene: one batched call covers every bounce."""
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2),
                     seed=0)
    sc = Scene(wc, table=block_table)
    assert sc.bvh_device is None
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=1,
                       max_bounces=4, tracer="proc", pallas_unroll=1)
    cam = _cam()
    batched = _render(sc, cam, cfg, True)
    loop = _render(sc, cam, cfg, False)
    assert (batched == loop).all()


def test_batched_shade_occupancy_telemetry_matches(block_table):
    """Wavefront-fused occupancy counts are identical under batched
    shading (phase-3 accumulation preserves the alive-mask sequence)."""
    from vrv_tpu.render.wavefront import render_samples_wavefront_fused

    sc, cam = _ego_scene(block_table, with_lamp=True)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=1,
                       max_bounces=3, tracer="proc", pallas_unroll=1,
                       proc_backend="pallas")
    occs = []
    for batched in (True, False):
        _, occ = render_samples_wavefront_fused(
            sc.grid, sc.translucent, sc.materials, sc.bvh_device,
            sc.bvh_max_depth, sc.dist, sc.instances_device, sc.rows,
            sc.camera_to_local(cam[0]), *cam[1:], 0,
            cfg.replace(pallas_batched_shade=batched,
                        pallas_inkernel_nee=False),
            with_occupancy=True,
            proc_static=sc.proc_static, proc=sc.proc_arrays,
            light_tex_set=sc.light_tex_set, inst_static=sc.inst_static,
        )
        occs.append(np.asarray(occ))
    assert (occs[0] == occs[1]).all()
