"""Dynamic entity meshes: ray vs small world-space triangle sets.

The reference renders dynamic entities (the ego cube, main.rs:84-101) as
TLAS instances of uploaded vertex buffers (scene.rs:129-177). TPU-side the
dynamic set is tiny (tens of triangles), so instead of an acceleration
structure we brute-force every ray against every instance triangle with
one vectorized Moller-Trumbore pass and merge with the voxel hit by t —
cheaper than any traversal at this scale and fully fused by XLA.

Barycentrics follow the Vulkan convention the kernel consumes
(pathtrace_shader.rs:716: bary3 = (1-u-v, u, v) weighting (v0, v1, v2)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class InstanceHit(NamedTuple):
    hit: jax.Array    # (n,) bool
    t: jax.Array      # (n,) f32
    prim: jax.Array   # (n,) int32 triangle index
    bary: jax.Array   # (n, 2) f32 (u, v)


def trace_instances(
    origin: jax.Array,      # (n, 3)
    direction: jax.Array,   # (n, 3)
    tri: jax.Array,         # (T, 3, 3) world-space triangles
    valid: jax.Array,       # (T,) bool
    t_min: float = 0.001,
    t_max: float = 1000.0,
) -> InstanceHit:
    """Nearest valid triangle hit per ray (Moller-Trumbore, both-sided)."""
    v0 = tri[:, 0]                                  # (T, 3)
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0

    o = origin[:, None, :]                          # (n, 1, 3)
    d = direction[:, None, :]

    p = jnp.cross(d, e2[None])                      # (n, T, 3)
    det = (e1[None] * p).sum(-1)                    # (n, T)
    ok = jnp.abs(det) > 1e-9                        # no culling (both sides)
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tv = o - v0[None]
    u = (tv * p).sum(-1) * inv_det
    q = jnp.cross(tv, e1[None])
    v = (d * q).sum(-1) * inv_det
    t = (e2[None] * q).sum(-1) * inv_det
    ok = (
        ok
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= t_min) & (t <= t_max)
        & valid[None]
    )
    t = jnp.where(ok, t, jnp.float32(3e38))
    # first-minimum selection as dense one-hot math — the argmin +
    # take_along_axis formulation lowered to TPU row gathers that
    # dominated the batched shadow pass (~180 ms each at 1.6M rays;
    # bit-identical replacement: same first-min index, same elements)
    tt = t.min(axis=1)                              # (n,)
    is_min = t == tt[:, None]                       # (n, T)
    first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
    idx = jnp.arange(t.shape[1], dtype=jnp.int32)
    prim = (first.astype(jnp.int32) * idx[None, :]).sum(axis=1)
    uu = jnp.where(first, u, 0.0).sum(axis=1)       # where, not multiply:
    vv = jnp.where(first, v, 0.0).sum(axis=1)       # 0 * inf would NaN
    hit = tt < jnp.float32(3e38)                    # ok held t <= t_max
    return InstanceHit(
        hit=hit,
        t=jnp.where(hit, tt, 0.0),
        prim=prim,
        bary=jnp.stack([uu, vv], axis=-1),
    )


def transform_mesh(mesh: dict, isometry) -> dict:
    """Apply an Isometry (translation + quaternion) to a SoA mesh, host-side."""
    import numpy as np

    from vrv_tpu.game.world import quat_rotate

    pos = np.asarray(mesh["positions"], np.float64)
    out = np.stack([quat_rotate(isometry.rotation, p) for p in pos]) + (
        isometry.translation
    )
    return {
        "positions": out.astype(np.float32),
        "t": mesh["t"],
        "uv": mesh["uv"],
    }
