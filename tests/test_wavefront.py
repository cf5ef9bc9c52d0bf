"""Wavefront modes.

'wavefront_compact' (the literal per-bounce + ray-queue formulation) must
stay byte-identical to megakernel mode; 'wavefront' (the fused-kernel
formulation) must be bit-identical to megakernel by construction and
report the same occupancy telemetry the compact pipeline derives from
its queues."""

import numpy as np
import pytest

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene


def test_wavefront_matches_megakernel(block_table):
    wc = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(wc.size, block_table.air, dtype=np.uint8)
    grid[:, :3, :] = block_table.block_idx("stone")
    grid[8, 3, 8] = block_table.block_idx("lamp")
    grid[4, 3, 4] = block_table.block_idx("mirror")
    grid[12, 3, 12] = block_table.block_idx("glass")
    sc = Scene(wc, table=block_table, grid=grid)

    eye = np.array([8.0, 9.0, 8.0], np.float32)
    front = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.array([1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)

    # beam pre-pass off: wavefront mode does not implement the primary-ray
    # beam march, and the advance flips exact corner-tie rays anyway (see
    # tests/test_beam.py); the mode-equivalence property is gated beam-off
    mega = RenderConfig(width=16, height=8, samples_per_pixel=2, max_bounces=3,
                        beam_prepass=False)
    wave = mega.replace(mode="wavefront_compact")
    img_m = np.asarray(sc.render(eye, front, right, up, 7, mega))
    img_w = np.asarray(sc.render(eye, front, right, up, 7, wave))
    # identical RNG and identical accumulation; scatter-add order may skew
    # float sums by an ulp -> allow 1 byte
    diff = np.abs(img_m.astype(int) - img_w.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.98
    # the fused-kernel wavefront rides the megakernel dispatch: identical
    # bytes by construction
    img_f = np.asarray(
        sc.render(eye, front, right, up, 7, mega.replace(mode="wavefront"))
    )
    assert (img_f == img_m).all()


def test_wavefront_occupancy_reporting(block_table):
    """Per-bounce live-ray occupancy (the profiling signal the reference's
    wavefront branch existed for, README.md:28-43)."""
    import jax.numpy as jnp

    from vrv_tpu.render.wavefront import render_samples_wavefront

    wc = WorldConfig(size=(16, 16, 16), origin=(0, 0, 0), seed=0)
    grid = np.full(wc.size, block_table.air, dtype=np.uint8)
    grid[:, :3, :] = block_table.block_idx("stone")
    sc = Scene(wc, table=block_table, grid=grid)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=2, max_bounces=3)
    fb, occ = render_samples_wavefront(
        sc.grid, sc.translucent, sc.materials, None, 0, sc.dist, None, sc.rows,
        sc.camera_to_local(np.array([8.0, 8.0, 8.0])),
        jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        jnp.uint32(0), cfg, with_occupancy=True,
    )
    occ = np.asarray(occ)
    assert occ.shape == (3,)
    n_rays = 16 * 8 * 2
    assert occ[0] == n_rays            # all primaries alive
    assert occ[1] <= occ[0]            # monotone decay as rays terminate
    assert occ[2] <= occ[1]
    assert fb.shape == (8, 16, 3)

    # the fused-kernel formulation reports the same counts (recorded
    # alive masks instead of queue lengths) and the same radiance
    from vrv_tpu.render.wavefront import render_samples_wavefront_fused

    fb2, occ2 = render_samples_wavefront_fused(
        sc.grid, sc.translucent, sc.materials, None, 0, sc.dist, None, sc.rows,
        sc.camera_to_local(np.array([8.0, 8.0, 8.0])),
        jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        jnp.uint32(0), cfg, with_occupancy=True,
    )
    assert (np.asarray(occ2) == occ).all()
    np.testing.assert_allclose(np.asarray(fb2), np.asarray(fb), atol=1e-5)
