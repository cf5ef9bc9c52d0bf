"""Fused path kernel tail restart (pallas_step_cap).

A block's cost is the max over its lanes of total path steps; one
grazing ray makes the whole 8x128 block march its tail. With a step
cap, pass 1 stops early and pass 2 re-traces only the unfinished lanes
from scratch (ops/pallas/path_proc.trace_path_pallas). Per-lane state
machines are deterministic, so the capped two-pass result must be
BIT-identical to the uncapped single pass — for every cap, including
caps small enough that pass 2 carries most of the work.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import vrv_tpu.ops.pallas.trace_proc as tp
from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops.camera_rays import raygen
from vrv_tpu.ops.pallas.path_proc import trace_path_pallas
from vrv_tpu.render.scene import Scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def _rays(sc, n_w=20, n_h=12, b=3):
    eye = np.array([0.0, 14.0, -10.0], np.float32)
    front = jnp.asarray([0.0, -0.5, 0.866], jnp.float32)
    right = jnp.asarray([-1.0, 0.0, 0.0], jnp.float32)
    up = jnp.asarray([0.0, -0.866, -0.5], jnp.float32)
    o, d, seeds = raygen(
        sc.camera_to_local(eye), front, right, up, n_w, n_h, 1,
        jnp.uint32(0),
    )
    n = n_h * n_w
    return o.reshape(n, 3), d.reshape(n, 3), seeds.reshape(n), b


@pytest.mark.parametrize("cap", [8, 24, 64])
def test_step_cap_bit_identical(block_table, cap):
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    ps, pd = sc.proc_static, sc.proc_arrays
    o, d, seeds, B = _rays(sc)
    ref_tr, ref_d, _, _ = trace_path_pallas(
        ps, o, d, seeds, B, pd=pd, interpret=True, unroll=1,
    )
    cap_tr, cap_d, _, _ = trace_path_pallas(
        ps, o, d, seeds, B, pd=pd, interpret=True, unroll=1, step_cap=cap,
    )
    for b in range(B):
        for f in ("hit", "t", "block", "face", "entering"):
            a = np.asarray(getattr(ref_tr[b], f))
            c = np.asarray(getattr(cap_tr[b], f))
            assert (a == c).all(), f"cap={cap} bounce {b} field {f}"
    for b in range(B - 1):
        assert (np.asarray(ref_d[b]) == np.asarray(cap_d[b])).all(), b


def test_step_cap_full_render_identical(block_table):
    """End-to-end: capped render == uncapped render, through megakernel
    dispatch (the production wiring of cfg.pallas_step_cap)."""
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    eye = np.array([0.0, 14.0, -10.0], np.float32)
    front = np.array([0.0, -0.5, 0.866], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -0.866, -0.5], np.float32)
    base = RenderConfig(width=24, height=16, samples_per_pixel=1,
                        max_bounces=3, tracer="proc", pallas_unroll=1,
                        proc_backend="pallas")
    ref = np.asarray(sc.render_samples(eye, front, right, up, 0, base))
    capped = np.asarray(sc.render_samples(
        eye, front, right, up, 0, base.replace(pallas_step_cap=16)
    ))
    assert (ref == capped).all()


def test_step_cap_bit_identical_with_inkernel_nee(block_table):
    """Tail restart x in-kernel NEE: a lane interrupted mid-path OR
    mid-shadow re-traces from scratch in pass 2 — records AND the NEE
    (index, vis) outputs must be bit-identical to the uncapped pass."""
    from tests.test_path_inst import _ego_scene

    sc, cam = _ego_scene(block_table, with_lamp=True)
    ps, pd = sc.proc_static, sc.proc_arrays
    o, d, seeds, B = _rays(sc)
    flat = sc.bvh_device["flat"]
    kw = dict(pd=pd, interpret=True, unroll=1, lights=flat,
              inst=sc.instances_device, inst_static=sc.inst_static)
    ref_tr, ref_d, ref_i, ref_n = trace_path_pallas(
        ps, o, d, seeds, B, **kw)
    cap_tr, cap_d, cap_i, cap_n = trace_path_pallas(
        ps, o, d, seeds, B, step_cap=24, **kw)
    for b in range(B):
        for f in ("hit", "t", "block", "face", "entering"):
            assert (np.asarray(getattr(ref_tr[b], f))
                    == np.asarray(getattr(cap_tr[b], f))).all(), (b, f)
    for b in range(B - 1):
        assert (np.asarray(ref_d[b]) == np.asarray(cap_d[b])).all(), b
        assert (np.asarray(ref_n[b][0]) == np.asarray(cap_n[b][0])).all(), b
        assert (np.asarray(ref_n[b][1]) == np.asarray(cap_n[b][1])).all(), b
    assert (np.asarray(ref_n[0][0]) >= 0).any()  # non-vacuous
