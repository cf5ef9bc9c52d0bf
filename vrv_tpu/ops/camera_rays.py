"""Primary-ray generation (raygen).

Mirrors the reference kernel's main() prologue
(reference src/render_system/pathtrace_shader.rs:893-919):

  - uv = 2 * pixel / screen_size - 1 (:886-888)
  - per-sample sub-pixel jitter of 0.01/screen_axis (:915-918)
  - dir = normalize((uv.x + jx) * right * aspect + (uv.y + jy) * up + front)
  - seed chain: pixel = murmur3(x, y, frame); sample = combine(pixel, s)
    (:899-908)

Returns rays with the sample axis leading: (spp, H, W, ...) so data
parallelism can shard samples across devices (parallel/).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vrv_tpu.ops import rng


def raygen(
    eye: jax.Array,
    front: jax.Array,
    right: jax.Array,
    up: jax.Array,
    width: int,
    height: int,
    spp: int,
    frame,
    jitter_scale: float = 0.01,
    y0=0,
    local_height: int = 0,
    s0=0,
    local_spp: int = 0,
    layout: str = "shw",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (origin, direction, sample_seed u32) shaped (spp,H,W[,3])
    for layout="shw" (default) or (H,spp,W[,3]) for layout="hsw".

    The two layouts hold identical per-(sample, y, x) values — all math
    is elementwise over broadcast grids, so only the axis order differs.
    "hsw" exists for the fused path kernel: flattened to (H*spp, W) rows,
    an (8, 128)-ray block then holds the SAME 128 pixels across up to 8
    samples (which differ only by sub-pixel jitter), instead of 1024
    distinct pixels — in-block march divergence drops to that of a
    128-pixel run.

    width/height/spp are the GLOBAL extents (they fix uv scaling and RNG
    seeds); y0/s0 + local_height/local_spp select a shard of rows/samples
    for multi-chip data parallelism (parallel/render_pjit.py). Defaults
    render the full frame.
    """
    local_height = local_height or height
    local_spp = local_spp or spp
    xs = jnp.arange(width, dtype=jnp.uint32)
    ys = jnp.arange(local_height, dtype=jnp.uint32) + rng.u32(y0)
    px = xs[None, :]
    py = ys[:, None]

    pixel_seed = rng.murmur3_combine(px, py)                       # (H, W)
    pixel_seed = rng.murmur3_combine(pixel_seed, rng.u32(frame))
    uv_x2 = 2.0 * px.astype(jnp.float32) / width - 1.0             # (1, W)
    uv_y2 = 2.0 * py.astype(jnp.float32) / height - 1.0            # (H, 1)
    aspect = jnp.float32(width) / jnp.float32(height)

    sids = jnp.arange(local_spp, dtype=jnp.uint32) + rng.u32(s0)
    if layout == "hsw":
        sample_ids = sids[None, :, None]
        sample_seed = rng.murmur3_combine(pixel_seed[:, None, :], sample_ids)
        uv_x = uv_x2[None]                                         # (1, 1, W)
        uv_y = uv_y2[:, None]                                      # (H, 1, 1)
    else:
        sample_ids = sids[:, None, None]
        sample_seed = rng.murmur3_combine(pixel_seed[None], sample_ids)
        uv_x = uv_x2[None]                                         # (1, 1, W)
        uv_y = uv_y2[None]                                         # (1, H, 1)

    jx = jitter_scale * (1.0 / width) * (rng.draw(sample_seed, 0) - 0.5)
    jy = jitter_scale * (1.0 / height) * (rng.draw(sample_seed, 1) - 0.5)

    d = (
        (uv_x + jx)[..., None] * right * aspect
        + (uv_y + jy)[..., None] * up
        + front
    )
    d = d / jnp.sqrt((d * d).sum(-1, keepdims=True))
    o = jnp.broadcast_to(eye, d.shape)
    return o, d, sample_seed
