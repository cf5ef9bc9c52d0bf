"""One-dispatch converged accumulation (Scene.render_converged).

The fori_loop formulation must be BIT-identical to the host chunk loop
(bench.py run_chunks / tools/probe.py frame): same per-pass frame ids,
same accumulation order (acc starts at 0.0; 0.0 + x == x on the
non-negative radiance domain), same final divisor.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.megakernel import pack_bgra
from vrv_tpu.render.scene import Scene


def _host_loop(scene, cam, frame, chunks, cfg):
    acc = None
    for c in range(chunks):
        smp = scene.render_samples(*cam, frame * chunks + c, cfg).sum(axis=0)
        acc = smp if acc is None else acc + smp
    return pack_bgra(acc / (chunks * cfg.samples_per_pixel))


@pytest.fixture(scope="module")
def worldgen_scene():
    wc = WorldConfig(size=(16, 16, 16), origin=(-8, -8, -8), seed=0)
    sc = Scene(wc)
    eye = np.array([0.0, 10.0, -10.0], np.float32)
    front = np.array([0.0, -0.6, 0.8], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.8, -0.6], np.float32)
    return sc, (eye, front, right, up)


def test_converged_onejit_bit_identical(worldgen_scene):
    sc, cam = worldgen_scene
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=1, max_bounces=2)
    want = np.asarray(_host_loop(sc, cam, frame=1, chunks=3, cfg=cfg))
    got = np.asarray(sc.render_converged(*cam, 1, 3, cfg))
    np.testing.assert_array_equal(want, got)


def test_converged_onejit_with_lamp_nee(worldgen_scene):
    # a lamp exercises the light BVH + split-NEE inside the loop body
    sc, cam = worldgen_scene
    lamp = int(sc.table.block_idx("lamp"))
    assert sc.set_block((0, -2, 0), lamp)
    assert sc.bvh_device is not None
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=1, max_bounces=2)
    want = np.asarray(_host_loop(sc, cam, frame=0, chunks=2, cfg=cfg))
    got = np.asarray(sc.render_converged(*cam, 0, 2, cfg))
    np.testing.assert_array_equal(want, got)
