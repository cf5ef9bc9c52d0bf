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

The lattice hash is ARITHMETIC (xxhash-style integer avalanche), not a
permutation table: on TPU a per-point table lookup lowers to a scalar-loop
gather (~8 ns/element, docs/PERF.md) while integer multiply/xor/shift run
dense on the VPU. That makes the noise — and therefore worldgen occupancy —
evaluable inside a ray-marching loop with ZERO memory traffic, which is
what the procedural tracer (ops/dda_proc.py) is built on. As a bonus the
hash has no 256-cell period (the classic perm table wraps at 256 lattice
units).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# 12 edge-centre gradients of a cube (Perlin's simplex gradient set), used
# only by tests as the oracle for the branchless gradient selection below.
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

# Upper bound on |grad simplex3| w.r.t. its input coords (one axis unit =
# one lattice unit). Empirical sup over 150K autodiff samples is ~5.96
# (p99.99 ~5.85); the margin covers sampling sparsity.
# tests/test_misc.py::test_noise_lipschitz re-checks the empirical sup
# against this bound.
LIPSCHITZ = 7.0


def _seed_mix(seed: int) -> int:
    """Host-side: derive a 32-bit hash offset from the python seed."""
    return (seed * 0x9E3779B97F4A7C15 + 0x632BE59BD9B4E019) >> 17 & 0xFFFFFFFF


def _grad_index(ii, jj, kk, seed_mix):
    """uint32 avalanche hash of a lattice point -> gradient index in [0,12).

    Pure integer multiply/xor/shift — no table, no gather.
    """
    u32 = jnp.uint32
    h = (
        ii.astype(u32) * u32(0x9E3779B1)
        ^ jj.astype(u32) * u32(0x85EBCA77)
        ^ kk.astype(u32) * u32(0xC2B2AE3D)
        ^ u32(seed_mix)
    )
    h = h * u32(0x27D4EB2F)
    h = h ^ (h >> u32(15))
    h = h * u32(0x2C1B3C6D)
    h = h ^ (h >> u32(13))
    # map the top 16 bits uniformly onto [0, 12)
    return (((h >> u32(16)) * u32(12)) >> u32(16)).astype(jnp.int32)


def _grad_dot(gi, cx, cy, cz):
    """dot(_GRAD3[gi], (cx, cy, cz)) branchlessly (no table lookup).

    _GRAD3 layout: group g = gi >> 2 zeroes one axis; the two live axes get
    signs (1 - 2*(gi & 1), 1 - 2*((gi >> 1) & 1)).
    """
    s1 = 1.0 - 2.0 * (gi & 1).astype(jnp.float32)
    s2 = 1.0 - 2.0 * ((gi >> 1) & 1).astype(jnp.float32)
    g0 = gi < 4
    g1 = (gi >= 4) & (gi < 8)
    a = jnp.where(g0 | g1, cx, cy)
    b = jnp.where(g0, cy, cz)
    return s1 * a + s2 * b


def simplex3(x, y, z, seed: int = 0):
    """Classic 3D simplex noise at float coords; returns values in ~[-1, 1].

    Accepts arrays of any (broadcastable) shape; fully vectorized, and —
    by design — free of gathers (see module docstring).
    """
    seed_mix = _seed_mix(seed)

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

    ii = i.astype(jnp.int32)
    jj = j.astype(jnp.int32)
    kk = k.astype(jnp.int32)

    def gi(di, dj, dk):
        return _grad_index(ii + di, jj + dj, kk + dk, seed_mix)

    g0 = gi(0, 0, 0)
    g1 = gi(i1.astype(jnp.int32), j1.astype(jnp.int32), k1.astype(jnp.int32))
    g2 = gi(i2.astype(jnp.int32), j2.astype(jnp.int32), k2.astype(jnp.int32))
    g3 = gi(1, 1, 1)

    def corner(gidx, cx, cy, cz):
        # falloff cutoff 0.5 (not Perlin's 0.6): with 0.5 the differing
        # corner's contribution vanishes exactly on simplex tie planes, so
        # the two possible decompositions at a ranking tie agree to the bit
        # and 1-ulp fusion drift between differently-compiled evaluations
        # of this function cannot produce O(1e-4) value jumps (verified in
        # tests/test_misc.py::test_noise_tie_continuity). Critical for the
        # procedural tracer's worldgen-recompute contract (ops/dda_proc.py).
        tt = 0.5 - cx * cx - cy * cy - cz * cz
        tt = jnp.maximum(tt, 0.0)
        dot = _grad_dot(gidx, cx, cy, cz)
        return (tt * tt) * (tt * tt) * dot

    n = (
        corner(g0, x0, y0, z0)
        + corner(g1, x1, y1, z1)
        + corner(g2, x2, y2, z2)
        + corner(g3, x3, y3, z3)
    )
    # 76.7 scales cutoff-0.5 simplex to ~[-1, 1] (Gustavson's constant;
    # empirical max 0.9995 over 1M samples); 0.864 ~ OpenSimplex amplitude
    return 76.7 * 0.864 * n


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
