"""Beam pre-pass gates (ops/dda.beam_march / beam_advance).

The pre-pass marches one conservative cone per 8x8 pixel tile through the
distance field and starts every tile ray at the proven-safe depth. Its
contract: the advance never skips a hit (conservativeness), and rendered
images match the unadvanced render except possibly at exact corner-tie
rays (both DDA outcomes valid; the tie resolution is sensitive to the
advanced origin's last ulp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene


def test_beam_advance_is_conservative():
    """No ray's true hit lies before its advance, over random scenes."""
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.ops.dda import beam_advance, build_distance_field, trace

    rng = np.random.default_rng(1)
    S, air = 48, 4
    grid = np.full((S, S, S), air, np.uint8)
    m = rng.random((S, S, S)) < 0.02
    grid[m] = rng.integers(0, 4, m.sum()).astype(np.uint8)
    translucent = np.array([0, 0, 1, 0, 1], bool)
    dist = build_distance_field(jnp.asarray(grid), air)

    checked = 0
    for trial in range(6):
        eye = rng.uniform(5, S - 5, 3).astype(np.float32)
        if grid[tuple(np.floor(eye).astype(int))] != air:
            continue
        f = rng.normal(size=3).astype(np.float32)
        f /= np.linalg.norm(f)
        r = np.cross(f, [0.0, 1.0, 0.0]).astype(np.float32)
        r /= np.linalg.norm(r)
        u = np.cross(f, r).astype(np.float32)
        o, d, _ = raygen(
            jnp.asarray(eye), jnp.asarray(f), jnp.asarray(r), jnp.asarray(u),
            64, 48, 2, trial,
        )
        adv = np.asarray(beam_advance(dist, jnp.asarray(eye), d)).reshape(-1)
        res = trace(
            jnp.asarray(grid), jnp.asarray(translucent),
            o.reshape(-1, 3), d.reshape(-1, 3),
        )
        hit, t = np.asarray(res.hit), np.asarray(res.t)
        assert not (hit & (t < adv - 1e-5)).any(), trial
        checked += 1
    assert checked >= 3  # enough eyes landed in air


def test_beam_render_matches_unadvanced(block_table):
    """Default (beam on) render equals the beam-off render except for a
    bounded set of corner-tie pixels."""
    wc = WorldConfig(size=(48, 48, 48), origin=(-24, -24, -24), seed=0)
    sc = Scene(wc, table=block_table)
    eye = np.array([0.0, 14.0, -10.0], np.float32)
    front = np.array([0.0, -0.35, 0.936], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.936, -0.35], np.float32)
    base = RenderConfig(width=96, height=64, samples_per_pixel=2, max_bounces=3)
    on = np.asarray(sc.render(eye, front, right, up, 3, base))
    off = np.asarray(
        sc.render(eye, front, right, up, 3, base.replace(beam_prepass=False))
    )
    diff = np.abs(on.astype(int) - off.astype(int))
    assert (diff == 0).mean() > 0.99
    assert (diff.max(-1) > 1).mean() < 0.005


def test_beam_noop_outside_grid(block_table):
    """Eye outside the grid: the cone march cannot certify anything and
    must leave rays unadvanced (identical render)."""
    wc = WorldConfig(size=(48, 48, 48), origin=(-24, -24, -24), seed=0)
    sc = Scene(wc, table=block_table)
    eye = np.array([0.0, 60.0, -60.0], np.float32)
    front = np.array([0.0, -0.35, 0.936], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.936, -0.35], np.float32)
    base = RenderConfig(width=64, height=48, samples_per_pixel=1, max_bounces=2)
    a = np.asarray(sc.render(eye, front, right, up, 1, base))
    b = np.asarray(
        sc.render(eye, front, right, up, 1, base.replace(beam_prepass=False))
    )
    assert np.array_equal(a, b)
    assert a.std() > 1  # non-trivial image


def test_beam_wavefront_matches_unadvanced(block_table):
    """Wavefront mode's beam advance: same statistical gate as megakernel."""
    wc = WorldConfig(size=(48, 48, 48), origin=(-24, -24, -24), seed=0)
    sc = Scene(wc, table=block_table)
    eye = np.array([0.0, 14.0, -10.0], np.float32)
    front = np.array([0.0, -0.35, 0.936], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.936, -0.35], np.float32)
    base = RenderConfig(
        width=96, height=64, samples_per_pixel=2, max_bounces=3,
        mode="wavefront",
    )
    on = np.asarray(sc.render(eye, front, right, up, 3, base))
    off = np.asarray(
        sc.render(eye, front, right, up, 3, base.replace(beam_prepass=False))
    )
    diff = np.abs(on.astype(int) - off.astype(int))
    assert (diff == 0).mean() > 0.99
    assert (diff.max(-1) > 1).mean() < 0.005
