"""Vectorized 3D simplex noise for worldgen.

The reference drives worldgen with the `noise` crate's OpenSimplex
(reference src/game_system/chunk.rs:4,83). TPU-side we need a noise field
that (a) is deterministic per seed, (b) is smooth with the same effective
frequency content at the reference's scale (world coords / 20,
chunk.rs:69), and (c) evaluates as one batched jnp expression over the
whole grid instead of the reference's triple scalar loop (chunk.rs:70-96).

We implement classic 3D simplex noise (skew factor 1/3, unskew 1/6,
12-gradient set) — the same lattice family as OpenSimplex; output is in
[-1, 1] and rescaled to approximately match OpenSimplex's amplitude
(OpenSimplex ~ +-0.87 of simplex range at these parameters; worldgen only
thresholds the field at 0.2 so the visual character, not the exact field,
is what carries over; documented delta vs. the reference).

The permutation table is derived from the seed with a Fisher-Yates
shuffle, host-side, and closed over as a constant so the whole generator
jits to a single fused XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 12 edge-centre gradients of a cube (Perlin's simplex gradient set).
_GRAD3 = np.array(
    [
        [1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
        [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
        [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1],
    ],
    dtype=np.float32,
)

_F3 = 1.0 / 3.0
_G3 = 1.0 / 6.0


@functools.lru_cache(maxsize=32)
def _perm_table(seed: int) -> np.ndarray:
    rng = np.random.default_rng((seed * 0x9E3779B97F4A7C15 + 0x632BE59BD9B4E019) & (2**64 - 1))
    p = rng.permutation(256).astype(np.int32)
    return np.concatenate([p, p])


def simplex3(x, y, z, seed: int = 0):
    """Classic 3D simplex noise at float coords; returns values in ~[-1, 1].

    Accepts arrays of any (broadcastable) shape; fully vectorized.
    """
    perm = jnp.asarray(_perm_table(seed))
    grad = jnp.asarray(_GRAD3)

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)

    s = (x + y + z) * _F3
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    k = jnp.floor(z + s)
    t = (i + j + k) * _G3
    x0 = x - (i - t)
    y0 = y - (j - t)
    z0 = z - (k - t)

    # rank the displacement components to pick the simplex corner order
    gx = x0 >= y0
    gy = y0 >= z0
    gz = x0 >= z0

    i1 = (gx & gz).astype(jnp.float32)
    j1 = ((~gx) & gy).astype(jnp.float32)
    k1 = ((~gy) & (~gz)).astype(jnp.float32)
    i2 = (gx | (gy & gz)).astype(jnp.float32)
    j2 = ((~gx) | gy).astype(jnp.float32)
    k2 = (~(gy & (gx | gz))).astype(jnp.float32)

    x1 = x0 - i1 + _G3
    y1 = y0 - j1 + _G3
    z1 = z0 - k1 + _G3
    x2 = x0 - i2 + 2.0 * _G3
    y2 = y0 - j2 + 2.0 * _G3
    z2 = z0 - k2 + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3

    ii = (i.astype(jnp.int32)) & 255
    jj = (j.astype(jnp.int32)) & 255
    kk = (k.astype(jnp.int32)) & 255

    def gi(di, dj, dk):
        return perm[ii + di + perm[jj + dj + perm[kk + dk]]] % 12

    g0 = gi(0, 0, 0)
    g1 = gi(i1.astype(jnp.int32), j1.astype(jnp.int32), k1.astype(jnp.int32))
    g2 = gi(i2.astype(jnp.int32), j2.astype(jnp.int32), k2.astype(jnp.int32))
    g3 = gi(1, 1, 1)

    def corner(gidx, cx, cy, cz):
        tt = 0.6 - cx * cx - cy * cy - cz * cz
        tt = jnp.maximum(tt, 0.0)
        gv = grad[gidx]
        dot = gv[..., 0] * cx + gv[..., 1] * cy + gv[..., 2] * cz
        return (tt * tt) * (tt * tt) * dot

    n = (
        corner(g0, x0, y0, z0)
        + corner(g1, x1, y1, z1)
        + corner(g2, x2, y2, z2)
        + corner(g3, x3, y3, z3)
    )
    # 32 scales classic simplex to ~[-1, 1]; 0.864 ~ OpenSimplex amplitude
    return 32.0 * 0.864 * n


def fbm3(x, y, z, seed: int = 0, octaves: int = 1, lacunarity: float = 2.0, gain: float = 0.5):
    """Fractional Brownian motion stack over simplex3 (extra capability)."""
    total = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y), jnp.shape(z)), jnp.float32)
    amp, freq, norm = 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * simplex3(
            jnp.asarray(x) * freq, jnp.asarray(y) * freq, jnp.asarray(z) * freq, seed=seed + o
        )
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm
