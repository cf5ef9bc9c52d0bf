"""Counter-based RNG, bit-exact with the reference's murmur3 chain.

The reference shader derives every random draw as a pure function of a
(seed, slot) pair via a murmur3-style hash (reference
src/render_system/pathtrace_shader.rs:78-119):

    murmur3_combine(h, k)  -> one murmur3 body round
    murmur3_finalize(h)    -> murmur3 fmix32
    floatConstruct(m)      -> mantissa-stuffed float in [0, 1)

Because draws are keyed functions rather than a mutable stream, the whole
scheme is already "counter-based" — ideal for SPMD: we reproduce it with
uint32 vector ops so TPU renders consume the *same* random numbers as the
Vulkan reference, enabling draw-for-draw radiance comparison (not merely
statistical parity) on scenes where the light-structure traversal depth
matches.

A PCG32-hash variant is provided as an alternative mode (same calling
convention); it is marginally cheaper but forfeits reference parity.

All functions accept scalars or arrays of uint32 and are jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U = jnp.uint32


def u32(x) -> jax.Array:
    return jnp.asarray(x).astype(_U)


def murmur3_combine(h, k) -> jax.Array:
    """One murmur3_32 body round (pathtrace_shader.rs:92-100)."""
    h = u32(h)
    k = u32(k) * _U(0x1B873593)
    h = h ^ k
    h = (h << _U(13)) | (h >> _U(19))
    h = h * _U(5) + _U(0xE6546B64)
    return h


def murmur3_finalize(h) -> jax.Array:
    """murmur3 fmix32 finalizer (pathtrace_shader.rs:104-111)."""
    h = u32(h)
    h = h ^ (h >> _U(16))
    h = h * _U(0x85EBCA6B)
    h = h ^ (h >> _U(13))
    h = h * _U(0xC2B2AE35)
    h = h ^ (h >> _U(16))
    return h


def float_construct(m) -> jax.Array:
    """uint32 -> float32 in [0, 1) from the low 23 bits (pathtrace_shader.rs:78-87)."""
    m = u32(m)
    m = (m & _U(0x007FFFFF)) | _U(0x3F800000)
    return jax.lax.bitcast_convert_type(m, jnp.float32) - jnp.float32(1.0)


def murmur3_combinef(h, k_float) -> jax.Array:
    """Combine with the bit pattern of a float32 (pathtrace_shader.rs:113-115)."""
    kf = jnp.asarray(k_float, jnp.float32)
    return murmur3_combine(h, jax.lax.bitcast_convert_type(kf, _U))


def murmur3_finalizef(h) -> jax.Array:
    """Finalize to a float32 in [0, 1) (pathtrace_shader.rs:117-119)."""
    return float_construct(murmur3_finalize(h))


# Draw mode: 'murmur3' reproduces the reference bit-for-bit; 'pcg' is the
# PCG32-hash alternative (same counter-based calling convention, slightly
# cheaper, forfeits draw-level parity). Selected per render via
# RenderConfig.rng — the render jit cache keys on the config, so each mode
# traces its own program.
MODE = "murmur3"


def draw(seed, slot) -> jax.Array:
    """uniform [0,1) draw keyed by (seed, slot).

    murmur3 mode: finalizef(combine(seed, slot)) — the idiom the reference
    kernel uses for every sample (e.g. pathtrace_shader.rs:758, 819,
    822-825, 834-836).
    """
    if MODE == "pcg":
        return pcg_draw(seed, slot)
    return murmur3_finalizef(murmur3_combine(seed, slot))


# ---------------------------------------------------------------------------
# Python-int oracle (for unit tests; mirrors the uint32 math without jnp)
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def murmur3_combine_py(h: int, k: int) -> int:
    k = (k * 0x1B873593) & _M32
    h ^= k
    h = ((h << 13) | (h >> 19)) & _M32
    h = (h * 5 + 0xE6546B64) & _M32
    return h


def murmur3_finalize_py(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def float_construct_py(m: int) -> float:
    import struct

    m = (m & 0x007FFFFF) | 0x3F800000
    return struct.unpack("<f", struct.pack("<I", m))[0] - 1.0


def murmur3_finalizef_py(h: int) -> float:
    return float_construct_py(murmur3_finalize_py(h))


# ---------------------------------------------------------------------------
# PCG32-hash alternative (non-parity mode)
# ---------------------------------------------------------------------------


def pcg_hash(h) -> jax.Array:
    """PCG output permutation over an LCG-stirred state; one-shot hash."""
    state = u32(h) * _U(747796405) + _U(2891336453)
    word = ((state >> ((state >> _U(28)) + _U(4))) ^ state) * _U(277803737)
    return (word >> _U(22)) ^ word


def pcg_draw(seed, slot) -> jax.Array:
    return float_construct(pcg_hash(u32(seed) * _U(0x9E3779B9) + u32(slot)))
