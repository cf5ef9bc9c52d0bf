"""cfg.pallas_tile: patch re-layout of the fused kernel's ray blocks.

WHICH 1024 pixels share a Mosaic block is a pure layout choice — the
permutation is reshape/transpose in XLA and every downstream shading op
is row-independent — so renders must be bit-identical across tile
shapes. Block cost (max over lanes of path steps) is what changes;
tools/capmodel.py's tile sweep predicts it, the chip A/B decides
(probe token entry_t32).
"""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig

from tests.test_path_inst import _ego_scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def test_tile_shapes_bit_identical(block_table):
    sc, cam = _ego_scene(block_table, with_lamp=True)
    cfg = RenderConfig(width=40, height=24, samples_per_pixel=2,
                       max_bounces=3, tracer="proc", pallas_unroll=1,
                       proc_backend="pallas")
    imgs = {}
    for tile in ("8x128", "32x32", "16x64"):
        imgs[tile] = np.asarray(sc.render_samples(
            *cam, 0, cfg.replace(pallas_tile=tile)
        ))
    for tile in ("32x32", "16x64"):
        assert (imgs[tile].view(np.uint32)
                == imgs["8x128"].view(np.uint32)).all(), tile
    assert imgs["8x128"].std() > 1.0


def test_tile_shape_validation(block_table):
    sc, cam = _ego_scene(block_table, with_lamp=False)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=1,
                       max_bounces=1, tracer="proc", pallas_unroll=1,
                       proc_backend="pallas", pallas_tile="32x16")
    with pytest.raises(ValueError, match="TH\\*TW"):
        sc.render_samples(*cam, 0, cfg)
