"""Upward-exit certificate (ProcStatic.y_air) soundness.

Both Pallas kernels retire an in-air ray with dy >= 0 at/above the
all-air bound as an immediate miss instead of marching it to the grid
exit. The bound is the pristine-worldgen top (scene._sync_proc) raised
at runtime by solid edits (in-kernel, from the SMEM edit keys). The
retirement must be BIT-identical to the exhaustive march — checked here
against the XLA tracer (ops/dda_proc.trace_proc, which has no
certificate) on the adversarial ray classes:

- straight-up and shallow-diagonal rays above the terrain (the rays the
  certificate kills) must still record the exact same miss;
- a solid edit placed ABOVE the worldgen top must still be hit (the
  runtime bound must cover it);
- an air edit carving the terrain top must not unsoundly extend marches.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import vrv_tpu.ops.pallas.trace_proc as tp
from vrv_tpu.config import WorldConfig
from vrv_tpu.ops.dda_proc import trace_proc
from vrv_tpu.ops.pallas.trace_proc import trace_proc_pallas
from vrv_tpu.render.scene import Scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


G = 32


def _scene(block_table):
    # steep y_falloff so the window holds real terrain AND real sky: solid
    # needs simplex > 0.2 + wy/20, impossible above wy = 16 (simplex <= 1)
    # but ~30% dense near wy = 0 — at the reference's shallow falloff (500)
    # every ground-level window is solid-capable to the top and the
    # certificate compiles out (inert), which would make this file vacuous
    wc = WorldConfig(size=(G, G, G), origin=(-G // 2, 0, -G // 2), seed=0,
                     y_falloff=20.0)
    return Scene(wc, table=block_table)


def _assert_traces_equal(ps, pd, o, d, msg=""):
    ref = trace_proc(ps, o, d, pd=pd)
    got = trace_proc_pallas(ps, o, d, pd=pd, interpret=True)
    for f in ("hit", "t", "block", "face", "entering"):
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        assert (a == b).all(), f"{msg}: field {f} mismatch"
    return ref


def _up_rays(y_air):
    """Rays in air at/above/below the bound, pointed up and diagonally."""
    o = []
    d = []
    for x in (3.5, 12.5, 28.5):
        for y0 in (y_air + 0.5, y_air - 3.5, 2.0):
            o.append([x, y0, 9.5])
            d.append([0.0, 1.0, 0.0])           # straight up
            o.append([x, y0, 9.5])
            d.append([0.9, 0.1, 0.4])           # shallow climb
            o.append([x, y0, 9.5])
            d.append([0.7, 0.0, -0.7])          # exactly horizontal
    o = jnp.asarray(np.array(o, np.float32))
    dn = np.array(d, np.float32)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    return o, jnp.asarray(dn)


def test_upcert_matches_xla_pristine(block_table):
    sc = _scene(block_table)
    ps, pd = sc.proc_static, sc.proc_arrays
    assert ps.y_air > 0, "worldgen scene must have a y_air bound"
    o, d = _up_rays(ps.y_air)
    ref = _assert_traces_equal(ps, pd, o, d, "pristine")
    # sanity: some of these rays genuinely miss (the cert fires) and some
    # hit terrain (the cert must not have killed them)
    hits = np.asarray(ref.hit)
    assert hits.any() and (~hits).any()


def test_upcert_edit_above_worldgen_top(block_table):
    """A block placed above the worldgen top must still be hit: the
    certificate's runtime bound must rise above the edit."""
    sc = _scene(block_table)
    y_top = sc.proc_static.y_air  # pristine bound (cell coords)
    assert y_top + 4 < G
    stone = int(block_table.block_idx("stone"))
    cell = np.array([10, y_top + 3, 9]) + np.asarray(sc.world_cfg.origin)
    sc.set_block(cell, stone)
    ps, pd = sc.proc_static, sc.proc_arrays
    assert ps.n_edits > 0
    # ray from below the worldgen top straight up through the edit cell
    o = jnp.asarray([[10.5, float(y_top) - 0.5, 9.5],
                     [10.5, float(y_top) - 0.5, 9.4],
                     # neighbor column: must MISS (cert may fire above
                     # the raised bound only)
                     [12.5, float(y_top) + 0.5, 9.5]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]] * 3, jnp.float32)
    ref = _assert_traces_equal(ps, pd, o, d, "edit above top")
    hits = np.asarray(ref.hit)
    assert hits[0] and hits[1], "placed block above worldgen top must be hit"
    assert not hits[2]
    cells = np.asarray(ref.cell)
    assert tuple(cells[0]) == (10, y_top + 3, 9)


def test_upcert_air_edit_keeps_bound_sound(block_table):
    """Carving the top solid cell to air must not break agreement (the
    worldgen bound stays; the cert is merely conservative)."""
    sc = _scene(block_table)
    y_top = sc.proc_static.y_air
    # find a solid column-top cell in the pristine world and carve it
    pris = sc._pristine
    cols = np.argwhere(pris[:, y_top - 1, :] != block_table.air)
    assert len(cols), "expected solid cells at the top layer"
    x, z = cols[0]
    sc.set_block(
        np.array([int(x), y_top - 1, int(z)]) + np.asarray(sc.world_cfg.origin),
        int(block_table.air),
    )
    ps, pd = sc.proc_static, sc.proc_arrays
    o, d = _up_rays(ps.y_air)
    _assert_traces_equal(ps, pd, o, d, "air edit")


def test_upcert_fused_path_kernel(block_table):
    """The fused path kernel's bounce records stay bit-identical to the
    staged XLA chain on a sky-heavy view (most bounce rays exit upward,
    so the cert fires constantly)."""
    from vrv_tpu.ops.camera_rays import raygen
    from vrv_tpu.ops.pallas.path_proc import trace_path_pallas

    sc = _scene(block_table)
    ps, pd = sc.proc_static, sc.proc_arrays
    eye = np.array([0.0, float(ps.y_air) + 4.0, -6.0], np.float32)
    front = jnp.asarray([0.0, -0.45, 0.893], jnp.float32)
    right = jnp.asarray([-1.0, 0.0, 0.0], jnp.float32)
    up = jnp.asarray([0.0, -0.893, -0.45], jnp.float32)
    W, H, B = 16, 12, 3
    o, d, seeds = raygen(
        sc.camera_to_local(eye), front, right, up, W, H, 1, jnp.uint32(0),
    )
    n = H * W
    o, d, seeds = o.reshape(n, 3), d.reshape(n, 3), seeds.reshape(n)
    traces, dirs, _, _ = trace_path_pallas(
        ps, o, d, seeds, B, pd=pd, interpret=True, unroll=1,
    )
    # bounce 0 equals the plain XLA trace bit-for-bit; later bounces
    # equal the XLA trace along the kernel's own recorded chain (live
    # rays only; t approximately — the chain reconstruction here FMA-
    # contracts differently, see test_path_pallas.py)
    ref0 = trace_proc(ps, o, d, pd=pd)
    for f in ("hit", "t", "block", "face", "entering"):
        a = np.asarray(getattr(ref0, f))
        g = np.asarray(getattr(traces[0], f))
        assert (a == g).all(), f"bounce 0 field {f}"
    assert (~np.asarray(ref0.hit)).any(), "sky-heavy view should have misses"
    cur_o, cur_d = o, d
    for b in range(1, B):
        tr_prev = traces[b - 1]
        hit_p = cur_o + tr_prev.t[:, None] * cur_d
        nxt_o = jnp.where(tr_prev.hit[:, None], hit_p, 0.0)
        nxt_d = dirs[b - 1]
        ref = trace_proc(ps, nxt_o, nxt_d, pd=pd)
        live = np.asarray(tr_prev.hit)
        for f in ("hit", "face", "entering"):
            a = np.asarray(getattr(ref, f))[live]
            g = np.asarray(getattr(traces[b], f))[live]
            assert (a == g).all(), f"bounce {b} field {f}"
        np.testing.assert_allclose(
            np.asarray(ref.t)[live], np.asarray(traces[b].t)[live],
            rtol=1e-5, atol=1e-5, err_msg=f"bounce {b}: t",
        )
        cur_o, cur_d = nxt_o, nxt_d
