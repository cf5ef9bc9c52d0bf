"""Pallas DDA kernel vs the XLA reference tracer (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import dda
from vrv_tpu.ops.pallas.trace import trace_pallas

AIR = 7
TRANSLUCENT = np.array([True, False, False, False, False, False, False, True])


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_trace_matches_xla(seed):
    rng = np.random.default_rng(seed)
    g = np.full((16, 16, 16), AIR, np.uint8)
    g[:, :3, :] = 5
    for c in rng.integers(0, 16, size=(10, 3)):
        g[tuple(c)] = [5, 0, 4][int(c.sum()) % 3]

    n = 256
    origins = rng.uniform(-3, 19, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    gj = jnp.asarray(g)
    tl = jnp.asarray(TRANSLUCENT)
    dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(gj, AIR)

    want = dda.trace_skip(gj, dist, tl, jnp.asarray(origins), jnp.asarray(dirs))
    got = trace_pallas(
        gj, dist, tl, jnp.asarray(origins), jnp.asarray(dirs), interpret=True
    )

    np.testing.assert_array_equal(np.asarray(want.hit), np.asarray(got.hit))
    hits = np.asarray(want.hit)
    for field in ("block", "face", "entering"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, field))[hits],
            np.asarray(getattr(got, field))[hits],
            err_msg=field,
        )
    np.testing.assert_array_equal(
        np.asarray(want.cell)[hits], np.asarray(got.cell)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(want.t)[hits], np.asarray(got.t)[hits], rtol=1e-6
    )
