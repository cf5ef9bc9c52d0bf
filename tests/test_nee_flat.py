"""Flat-list light sampling (ops/nee.sample_light_flat) vs the BVH descent.

At game scale (<= Scene.FLAT_LIGHT_CAP light triangles) split-NEE samples
lights by brute-force importance over the flat list — the TPU-first trade
(like ops/instances vs the reference's TLAS). Different pdf than the
stochastic descent, same integral: gates are statistical mean agreement
plus direct checks of the sampler's geometry/pdf fields.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops import nee, rng
from vrv_tpu.render.scene import Scene


@pytest.fixture(scope="module")
def lamp_scene(block_table):
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    grid_np = sc._grid_np
    solid = block_table.solid[grid_np]
    ys = np.nonzero(solid[g // 2, :, g // 2])[0]
    ytop = int(ys.max())
    org = np.asarray(wc.origin)
    assert sc.set_block(
        np.array([g // 2, ytop + 1, g // 2]) + org,
        int(block_table.block_idx("lamp")),
    )
    assert sc.bvh_device is not None and sc.bvh_device.get("flat") is not None
    eye = np.array([0.0, ytop + 6 + org[1], -8.0])
    front = jnp.asarray([0.0, -0.45, 0.893], jnp.float32)
    right = jnp.asarray([-1.0, 0.0, 0.0], jnp.float32)
    up = jnp.asarray([0.0, -0.893, -0.45], jnp.float32)
    return sc, (eye, front, right, up)


def test_flat_split_mean_matches_descent_split(lamp_scene):
    """Same expected radiance whether split-NEE picks its light by flat
    importance or by stochastic descent (both unbiased; statistical gate
    on the frame mean of a lamp render)."""
    sc, cam = lamp_scene
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=32,
                       max_bounces=3, beam_prepass=False, nee_mode="split")
    flat_img = np.asarray(sc.render_samples(*cam, 0, cfg)).mean(0)
    # strip the flat bundle -> the descent fallback (separate jit cache
    # entry by dict structure); restore after
    flat = sc.bvh_device.pop("flat")
    try:
        bvh_img = np.asarray(sc.render_samples(*cam, 0, cfg)).mean(0)
    finally:
        sc.bvh_device["flat"] = flat
    rel = abs(flat_img.mean() - bvh_img.mean()) / max(bvh_img.mean(), 1e-9)
    assert rel < 0.03, (flat_img.mean(), bvh_img.mean())
    denom = np.maximum(bvh_img.mean(-1), 1.0)
    pix_rel = np.abs(flat_img.mean(-1) - bvh_img.mean(-1)) / denom
    assert np.median(pix_rel) < 0.25, np.median(pix_rel)


def test_flat_sampler_fields(lamp_scene):
    """Direct checks of the sampler outputs on the lamp scene: the chosen
    triangle is a real (non-pad) light, the sampled point lies on it, the
    pdf bookkeeping is consistent, and w matches its definition."""
    sc, _ = lamp_scene
    flat = sc.bvh_device["flat"]
    tri = np.asarray(flat["tri"])
    power = np.asarray(flat["power"])
    real_rows = power > 0

    # points a few cells below the lamp looking up
    n = 64
    rs = np.random.RandomState(0)
    lamp_c = tri[real_rows][0].mean(0)
    pts = lamp_c[None] + np.array([0.0, -3.0, 0.0]) + rs.uniform(
        -1.5, 1.5, (n, 3)
    )
    normals = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    seeds = rng.murmur3_combine(
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(7)
    )
    ls = nee.sample_light_flat(
        jnp.asarray(pts, jnp.float32), jnp.asarray(normals, jnp.float32),
        seeds, flat,
    )
    valid = np.asarray(ls.valid)
    assert valid.any(), "upward-facing points below a lamp must sample it"
    y = np.asarray(ls.point)[valid]
    d = np.asarray(ls.dist)[valid]
    # sampled point at recorded distance
    np.testing.assert_allclose(
        np.linalg.norm(y - pts[valid], axis=1), d, rtol=1e-4, atol=1e-4
    )
    # the point lies on one of the real light triangles (plane + bary)
    vt = tri[real_rows]
    on_some = np.zeros(len(y), bool)
    for t in vt:
        e1, e2 = t[1] - t[0], t[2] - t[0]
        nrm = np.cross(e1, e2)
        nrm /= np.linalg.norm(nrm)
        dist_pl = np.abs((y - t[0]) @ nrm)
        # barycentric inside test
        M = np.stack([e1, e2], axis=1)
        try:
            coef, *_ = np.linalg.lstsq(M, (y - t[0]).T, rcond=None)
        except np.linalg.LinAlgError:
            continue
        bu, bv = coef[0], coef[1]
        on_some |= (dist_pl < 1e-3) & (bu >= -1e-4) & (bv >= -1e-4) & (
            bu + bv <= 1.0 + 1e-4
        )
    assert on_some.all()
    # w definition: clamp(imp/scale, 0, 0.5); inv_pdf = area * W / imp > 0
    assert (np.asarray(ls.w)[valid] > 0).all()
    assert (np.asarray(ls.w)[valid] <= 0.5 + 1e-7).all()
    assert (np.asarray(ls.inv_pdf_area)[valid] > 0).all()
    # cos_light positive for valid samples (one-sided lights)
    assert (np.asarray(ls.cos_light)[valid] > 0).all()


def test_flat_selection_proportional_to_importance(block_table):
    """Two lamps, one 4x closer (16x importance): the sampler must pick
    the near one ~16x more often (chi-square-ish loose gate)."""
    g = 16
    wc = WorldConfig(size=(g, g, g), origin=(0, 0, 0), seed=0)
    air = int(block_table.air)
    lamp = int(block_table.block_idx("lamp"))
    grid = np.full((g, g, g), air, np.uint8)
    grid[8, 8, 8] = lamp    # near (dist 2 from sample point below)
    grid[8, 14, 8] = lamp   # far  (dist 8)
    sc = Scene(wc, table=block_table, grid=grid)
    flat = sc.bvh_device.get("flat")
    assert flat is not None

    n = 4096
    pts = np.tile(np.array([8.5, 6.0, 8.5], np.float32), (n, 1))
    normals = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    seeds = rng.murmur3_combine(
        jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3)
    )
    ls = nee.sample_light_flat(
        jnp.asarray(pts), jnp.asarray(normals), seeds, flat,
    )
    y = np.asarray(ls.point)
    picked_near = y[:, 1] < 10.0
    frac = picked_near.mean()
    # near:far importance ratio is ~(8-ish)^2/(2-ish)^2 per face pair;
    # exact ratio depends on the visible face set — loose gate: strongly
    # prefers the near lamp but still sometimes samples the far one
    assert frac > 0.80, frac
    assert frac < 0.999, frac
