"""RNG parity tests: jnp murmur3 chain vs a pure-Python uint32 oracle.

The oracle mirrors reference pathtrace_shader.rs:78-119 arithmetic exactly
(wrapping uint32 semantics), so agreement here means the device renders
consume bit-identical random numbers to the Vulkan kernel.
"""

import numpy as np
import jax.numpy as jnp

from vrv_tpu.ops import rng


def test_combine_matches_oracle():
    hs = np.array([0, 1, 0xDEADBEEF, 0xFFFFFFFF, 12345], dtype=np.uint32)
    ks = np.array([0, 7, 0x9E3779B9, 0xFFFFFFFF, 42], dtype=np.uint32)
    got = np.asarray(rng.murmur3_combine(hs, ks))
    want = np.array(
        [rng.murmur3_combine_py(int(h), int(k)) for h, k in zip(hs, ks)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_finalize_matches_oracle():
    hs = np.array([0, 1, 2, 0xCAFEBABE, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.murmur3_finalize(hs))
    want = np.array([rng.murmur3_finalize_py(int(h)) for h in hs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_float_construct_matches_oracle_and_range():
    ms = np.array([0, 1, 0x007FFFFF, 0x12345678, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.float_construct(ms))
    want = np.array([rng.float_construct_py(int(m)) for m in ms], dtype=np.float32)
    np.testing.assert_array_equal(got, want)
    assert (got >= 0.0).all() and (got < 1.0).all()
    # all-zero mantissa -> 0.0 exactly (pathtrace_shader.rs:77 comment)
    assert got[0] == 0.0


def test_pixel_seed_chain_matches_reference_recipe():
    # seed = combine(combine(x, y), frame); sample = combine(seed, s)
    # (pathtrace_shader.rs:899-900, 908)
    x, y, frame, s = 399, 299, 17, 2
    h = rng.murmur3_combine_py(x, y)
    h = rng.murmur3_combine_py(h, frame)
    h = rng.murmur3_combine_py(h, s)
    want = rng.murmur3_finalizef_py(rng.murmur3_combine_py(h, 4))
    got = float(
        rng.draw(
            rng.murmur3_combine(rng.murmur3_combine(rng.murmur3_combine(x, y), frame), s), 4
        )
    )
    assert got == want


def test_draw_distribution_uniform():
    seeds = jnp.arange(100_000, dtype=jnp.uint32)
    d = np.asarray(rng.draw(seeds, 0))
    assert abs(d.mean() - 0.5) < 5e-3
    hist, _ = np.histogram(d, bins=16, range=(0, 1))
    assert hist.min() > 100_000 / 16 * 0.9


def test_pcg_draw_uniform():
    seeds = jnp.arange(50_000, dtype=jnp.uint32)
    d = np.asarray(rng.pcg_draw(seeds, 3))
    assert abs(d.mean() - 0.5) < 1e-2
    assert (d >= 0).all() and (d < 1).all()
