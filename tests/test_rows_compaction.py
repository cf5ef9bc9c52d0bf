"""Rows-tracer compaction path: equality with the exact tracer when the
batch exceeds the tail cap (cap patched small to exercise phase 2 on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import dda
from vrv_tpu.ops.dda_rows import pack_rows, trace_rows

AIR = 7
TRANSLUCENT = np.array([True, False, False, False, False, False, False, True])


@pytest.mark.parametrize("w", [4, 32])
def test_rows_compaction_matches_exact(w, monkeypatch):
    monkeypatch.setattr(dda, "TRACE_COMPACT_CAP", 256)
    monkeypatch.setattr(dda, "TRACE_COMPACT_K", 4)
    rng = np.random.default_rng(5)
    g = np.full((16, 16, 32), AIR, np.uint8)
    g[:, :3, :] = 5
    for c in rng.integers(0, np.array(g.shape), size=(25, 3)):
        g[tuple(c)] = [5, 0, 4][int(c.sum()) % 3]
    gj = jnp.asarray(g)
    tl = jnp.asarray(TRANSLUCENT)
    dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(gj, AIR)
    rows = pack_rows(gj, dist, tl, w)

    n = 2048  # > patched cap -> compaction phase runs
    o = rng.uniform(-4, 36, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    want = dda.trace(gj, tl, jnp.asarray(o), jnp.asarray(d))
    got = trace_rows(g.shape, rows, 8, jnp.asarray(o), jnp.asarray(d))

    np.testing.assert_array_equal(np.asarray(want.hit), np.asarray(got.hit))
    hits = np.asarray(want.hit)
    for f in ("block", "face", "entering"):
        np.testing.assert_array_equal(
            np.asarray(getattr(want, f))[hits], np.asarray(getattr(got, f))[hits],
            err_msg=f,
        )
    np.testing.assert_array_equal(
        np.asarray(want.cell)[hits], np.asarray(got.cell)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(want.t)[hits], np.asarray(got.t)[hits], rtol=2e-6, atol=2e-6
    )


def test_skip_tracer_compaction_matches_exact(monkeypatch):
    monkeypatch.setattr(dda, "TRACE_COMPACT_CAP", 256)
    monkeypatch.setattr(dda, "TRACE_COMPACT_K", 4)
    rng = np.random.default_rng(6)
    g = np.full((16, 16, 16), AIR, np.uint8)
    g[:, :3, :] = 5
    for c in rng.integers(0, 16, size=(20, 3)):
        g[tuple(c)] = [5, 0, 4][int(c.sum()) % 3]
    gj = jnp.asarray(g)
    tl = jnp.asarray(TRANSLUCENT)
    dist = jax.jit(dda.build_distance_field, static_argnums=(1,))(gj, AIR)

    n = 2048
    o = rng.uniform(-4, 20, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    want = dda.trace(gj, tl, jnp.asarray(o), jnp.asarray(d))
    got = dda.trace_skip(gj, dist, tl, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(want.hit), np.asarray(got.hit))
    hits = np.asarray(want.hit)
    np.testing.assert_array_equal(
        np.asarray(want.face)[hits], np.asarray(got.face)[hits]
    )
