"""Golden-image regression gates.

The reference validates by human-checked converged screenshots
(assets/screenshots/, README.md:5-9). Here the analog is automated: fixed
worlds + cameras render to stored goldens; regressions must keep MSE on
[0,1]-scaled bytes below the BASELINE gate (1e-3) and in practice must be
byte-identical on CPU (same seeds, same arithmetic).

Regenerate after *intentional* semantic changes with:
  GOLDEN_REGEN=1 python -m pytest tests/test_goldens.py
"""

import os

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.image import mse

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("GOLDEN_REGEN") == "1"


def _worldgen_scene(block_table):
    wc = WorldConfig(size=(48, 48, 48), origin=(-24, -24, -24), seed=0)
    return Scene(wc, table=block_table)


def _lamp_scene(block_table):
    wc = WorldConfig(size=(24, 24, 24), origin=(0, 0, 0), seed=0)
    g = np.full(wc.size, block_table.air, np.uint8)
    g[:, :4, :] = block_table.block_idx("stone")
    g[12, 4, 12] = block_table.block_idx("lamp")
    g[8, 4, 8] = block_table.block_idx("mirror")
    g[16, 4, 16] = block_table.block_idx("glass")
    return Scene(wc, table=block_table, grid=g)


def _check(name: str, img: np.ndarray):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img)
        pytest.skip(f"golden {name} (re)generated")
    with np.load(path) as z:
        want = z["img"]
    assert img.shape == want.shape
    err = mse(img, want)
    assert err < 1e-3, f"{name}: MSE {err:.2e} vs golden"


CAM_DOWN = (
    np.array([0.0, 20.0, 0.1], np.float32),
    np.array([0.0, -0.894, 0.447], np.float32),
    np.array([-1.0, 0.0, 0.0], np.float32),
    np.array([0.0, -0.447, -0.894], np.float32),
)


def test_golden_primary_visibility(block_table):
    """BASELINE config 1: 1 spp / 1 bounce albedo-ish hit shading."""
    sc = _worldgen_scene(block_table)
    cfg = RenderConfig(width=64, height=48, samples_per_pixel=1, max_bounces=1)
    img = np.asarray(sc.render(*CAM_DOWN, frame=0, cfg=cfg))
    _check("primary_visibility", img)


def test_golden_diffuse_4spp_4bounce(block_table):
    """BASELINE config 2: diffuse path tracing, 4/4, fixed camera."""
    sc = _worldgen_scene(block_table)
    cfg = RenderConfig(width=48, height=36, samples_per_pixel=4, max_bounces=4)
    img = np.asarray(sc.render(*CAM_DOWN, frame=0, cfg=cfg))
    _check("diffuse_4spp_4bounce", img)


def test_golden_nee_materials(block_table):
    """Lamp + mirror + glass with NEE/MIS (BASELINE config 4 materials)."""
    sc = _lamp_scene(block_table)
    eye = np.array([12.0, 10.0, 4.0], np.float32)
    front = np.array([0.0, -0.707, 0.707], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.707, -0.707], np.float32)
    cfg = RenderConfig(width=48, height=36, samples_per_pixel=8, max_bounces=4)
    img = np.asarray(sc.render(eye, front, right, up, 0, cfg))
    _check("nee_materials", img)


def test_golden_dynamic_world_edit(block_table):
    """BASELINE config 5: edits on a live grid change the image coherently."""
    sc = _lamp_scene(block_table)
    eye = np.array([12.0, 10.0, 4.0], np.float32)
    front = np.array([0.0, -0.707, 0.707], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.707, -0.707], np.float32)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=4, max_bounces=3)
    before = np.asarray(sc.render(eye, front, right, up, 0, cfg))
    sc.set_block([12, 5, 12], block_table.block_idx("stone"))  # cover the lamp
    after = np.asarray(sc.render(eye, front, right, up, 0, cfg))
    assert (before != after).any()
    _check("dynamic_world_edit", after)
