"""Distance-field-skipping tracer must agree exactly with the exact tracer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import dda

AIR = 7
TRANSLUCENT = np.array([True, False, False, False, False, False, False, True])


def _dist(grid):
    return jax.jit(dda.build_distance_field, static_argnums=(1,))(
        jnp.asarray(grid), AIR
    )


def test_distance_field_values():
    g = np.full((9, 9, 9), AIR, np.uint8)
    g[4, 4, 4] = 5
    d = np.asarray(_dist(g))
    assert d[4, 4, 4] == 0
    assert d[5, 4, 4] == 1
    assert d[6, 5, 3] == 2  # chebyshev
    assert d[0, 0, 0] == 4
    assert d.max() <= 15


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_trace_skip_matches_trace(seed):
    rng = np.random.default_rng(seed)
    g = np.full((24, 24, 24), AIR, np.uint8)
    # a floor + scattered blocks + glass
    g[:, :3, :] = 5
    for c in rng.integers(0, 24, size=(20, 3)):
        g[tuple(c)] = [5, 0, 4][int(c.sum()) % 3]

    n = 512
    origins = rng.uniform(-4, 28, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    gj = jnp.asarray(g)
    tl = jnp.asarray(TRANSLUCENT)
    exact = dda.trace(gj, tl, jnp.asarray(origins), jnp.asarray(dirs))
    dist = _dist(g)
    skip = dda.trace_skip(gj, dist, tl, jnp.asarray(origins), jnp.asarray(dirs))

    np.testing.assert_array_equal(np.asarray(exact.hit), np.asarray(skip.hit))
    hits = np.asarray(exact.hit)
    np.testing.assert_array_equal(
        np.asarray(exact.block)[hits], np.asarray(skip.block)[hits]
    )
    np.testing.assert_array_equal(
        np.asarray(exact.face)[hits], np.asarray(skip.face)[hits]
    )
    np.testing.assert_array_equal(
        np.asarray(exact.cell)[hits], np.asarray(skip.cell)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(exact.t)[hits], np.asarray(skip.t)[hits], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(exact.entering)[hits], np.asarray(skip.entering)[hits]
    )
