"""Pallas procedural-trace kernel vs the XLA tracer (interpret mode).

The kernel must be BIT-identical to ops/dda_proc.trace_proc on edit-free
worldgen scenes — same march formulas, same noise math (the kernel inlines
ops/noise.simplex3 verbatim apart from seed prefolding).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrv_tpu.config import WorldConfig
from vrv_tpu.ops.dda_proc import ProcStatic, trace_proc
from vrv_tpu.ops.pallas.trace_proc import trace_proc_pallas


def _ps(block_table, wc, shape):
    return ProcStatic(
        seed=wc.seed, noise_scale=wc.noise_scale, y_falloff=wc.y_falloff,
        threshold=wc.threshold, origin=tuple(wc.origin), shape=shape,
        grass=int(block_table.block_idx("grass")),
        stone=int(block_table.block_idx("stone")),
        air=int(block_table.air), n_edits=0, use_coarse=False,
    )


def test_pallas_matches_xla_tracer(block_table):
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    ps = _ps(block_table, wc, (g, g, g))
    o = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (4000, 3), minval=-10.0, maxval=g + 10.0),
        np.float32,
    )
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4000, 3)), np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    # include degenerate + axis-aligned rays (padding/edge classes)
    d[0] = 0
    d[1] = [1, 0, 0]
    d[2] = [0, -1, 0]
    ref = trace_proc(ps, jnp.asarray(o), jnp.asarray(d))
    got = trace_proc_pallas(ps, jnp.asarray(o), jnp.asarray(d), interpret=True)
    for f in ("hit", "t", "block", "face", "entering"):
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        assert (a == b).all(), f"{f}: {(a != b).sum()} mismatches"
    assert (np.asarray(ref.cell) == np.asarray(got.cell)).all()


def _edit_pd(block_table, edits, cap):
    """pd edit arrays exactly as render/scene._proc_finalize builds them:
    (cell -> block) dict, sentinel-padded to cap."""
    cells = np.full((cap, 3), -(1 << 20), np.int32)
    blocks = np.full(cap, block_table.air, np.uint8)
    solidv = np.zeros(cap, bool)
    transl = np.ones(cap, bool)
    for i, (c, b) in enumerate(sorted(edits.items())):
        cells[i] = c
        blocks[i] = b
        solidv[i] = b != block_table.air
        transl[i] = bool(block_table.translucent[b])
    return {
        "edit_cells": jnp.asarray(cells),
        "edit_blocks": jnp.asarray(blocks),
        "edit_solid": jnp.asarray(solidv),
        "edit_translucent": jnp.asarray(transl),
    }


def test_pallas_edits_bit_identical(block_table):
    """Edited worlds (solid placements, holes, glass, lamp) through the
    SMEM edit list are bit-identical to the XLA tracer's dense compare."""
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    ps0 = _ps(block_table, wc, (g, g, g))

    from vrv_tpu.ops.dda_proc import worldgen_blocks

    xs, ys, zs = np.meshgrid(*[np.arange(g, dtype=np.int32)] * 3, indexing="ij")
    pristine = np.asarray(
        jax.jit(worldgen_blocks, static_argnums=(0,))(
            ps0, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
            jnp.asarray(zs.ravel()),
        )
    ).reshape(g, g, g)
    solid_cells = np.argwhere(pristine != block_table.air)
    air_cells = np.argwhere(pristine == block_table.air)
    # mix: a hole, a glass pane, a lamp, a stone placement, a mirror
    edits = {
        tuple(int(v) for v in solid_cells[0]): int(block_table.air),
        tuple(int(v) for v in air_cells[len(air_cells) // 2]): int(
            block_table.block_idx("glass")),
        tuple(int(v) for v in air_cells[7]): int(block_table.block_idx("lamp")),
        tuple(int(v) for v in solid_cells[len(solid_cells) // 3]): int(
            block_table.block_idx("stone")),
        tuple(int(v) for v in air_cells[-3]): int(block_table.block_idx("mirror")),
    }
    cap = 8
    ps = ps0._replace(n_edits=cap)
    pd = _edit_pd(block_table, edits, cap)

    n = 4000
    o = np.array(
        jax.random.uniform(jax.random.PRNGKey(11), (n, 3), minval=-10.0, maxval=g + 10.0),
        np.float32,
    )
    d = np.array(jax.random.normal(jax.random.PRNGKey(12), (n, 3)), np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    # aim a slab of rays straight at each edited cell so every edit class
    # (hole / glass / lamp / solid / mirror) is actually exercised
    targets = np.array(sorted(edits), np.float32) + 0.5
    for i, tc in enumerate(targets):
        src = np.array([-5.0, g + 5.0, -5.0], np.float32) + i
        o[i + 3] = src
        d[i + 3] = (tc - src) / np.linalg.norm(tc - src)
    d[0] = 0
    ref = trace_proc(ps, jnp.asarray(o), jnp.asarray(d), pd=pd)
    got = trace_proc_pallas(ps, jnp.asarray(o), jnp.asarray(d), pd=pd,
                            interpret=True)
    for f in ("hit", "t", "block", "face", "entering"):
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        assert (a == b).all(), f"{f}: {(a != b).sum()} mismatches"
    assert (np.asarray(ref.cell) == np.asarray(got.cell)).all()
    # the edits actually changed the image vs the pristine world
    base = trace_proc(ps0, jnp.asarray(o), jnp.asarray(d))
    assert (np.asarray(base.block) != np.asarray(ref.block)).any()


def test_pallas_coarse_skip_bit_identical(block_table):
    """The in-kernel constant empty-box skip (two-level occupancy baked as
    compile-time words) never changes results: bit-identical to both the
    skipless kernel and the XLA tracer."""
    from vrv_tpu.ops.dda_proc import build_coarse_dist, worldgen_blocks
    from vrv_tpu.ops.pallas.trace_proc import coarse_consts

    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    ps = _ps(block_table, wc, (g, g, g))._replace(use_coarse=True)

    xs, ys, zs = np.meshgrid(*[np.arange(g, dtype=np.int32)] * 3, indexing="ij")
    grid = np.asarray(
        jax.jit(worldgen_blocks, static_argnums=(0,))(
            ps, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
            jnp.asarray(zs.ravel()),
        )
    ).reshape(g, g, g)
    cc = coarse_consts(build_coarse_dist(grid, block_table.air), grid,
                       int(block_table.air))
    ps_skip = ps._replace(coarse_const=cc)

    o = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (3000, 3), minval=-12.0, maxval=g + 12.0),
        np.float32,
    )
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (3000, 3)), np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d[0] = [0, 1, 0]
    d[1] = [0, 0, -1]

    plain = trace_proc_pallas(
        ps._replace(use_coarse=False), jnp.asarray(o), jnp.asarray(d), interpret=True
    )
    skip = trace_proc_pallas(ps_skip, jnp.asarray(o), jnp.asarray(d), interpret=True)
    ref = trace_proc(ps._replace(use_coarse=False), jnp.asarray(o), jnp.asarray(d))
    for f in ("hit", "t", "block", "face", "entering"):
        a = np.asarray(getattr(skip, f))
        assert (a == np.asarray(getattr(plain, f))).all(), f"skip vs plain: {f}"
        assert (a == np.asarray(getattr(ref, f))).all(), f"skip vs xla: {f}"
    assert (np.asarray(skip.cell) == np.asarray(plain.cell)).all()


def test_pallas_tile2d_bit_identical(block_table):
    """2D image-tile blocking only reassigns rays to blocks — results are
    bit-identical to the flat 1D packing."""
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    ps = _ps(block_table, wc, (g, g, g))
    R, W = 24, 40  # not multiples of the (8, 128) tile — padding exercised
    o = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(9), (R * W, 3), minval=-8.0, maxval=g + 8.0),
        np.float32,
    )
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(10), (R * W, 3)), np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    flat = trace_proc_pallas(ps, jnp.asarray(o), jnp.asarray(d), interpret=True)
    tiled = trace_proc_pallas(ps, jnp.asarray(o), jnp.asarray(d), interpret=True,
                              hw=(R, W))
    for f in ("hit", "t", "block", "face", "entering"):
        a, b = np.asarray(getattr(flat, f)), np.asarray(getattr(tiled, f))
        assert (a == b).all(), f"{f}: {(a != b).sum()} mismatches"
    assert (np.asarray(flat.cell) == np.asarray(tiled.cell)).all()
