"""Per-lane t ceiling (tcap) on the single-bounce Pallas tracer.

Shadow rays pass their light distance as tcap: any first-hit at
t <= tcap is recorded identically to the uncapped trace, and a lane
whose march passes tcap retires without a record — which cannot change
the visibility verdict  vis = (~hit) | (t >= dist - eps)  because every
lost hit has t > dist - eps. Gates: record agreement below the cap and
verdict equality for the full shadow rule, against the uncapped trace.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import vrv_tpu.ops.pallas.trace_proc as tp
from vrv_tpu.config import WorldConfig
from vrv_tpu.ops.pallas.trace_proc import trace_proc_pallas
from vrv_tpu.render.scene import Scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def test_tcap_preserves_visibility_verdict(block_table):
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    ps, pd = sc.proc_static, sc.proc_arrays

    rs = np.random.RandomState(5)
    n = 256
    o = rs.uniform(2.0, g - 2.0, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # simulated light distances spanning short and long shadow rays
    dist = rs.uniform(1.0, 1.5 * g, n).astype(np.float32)
    eps = np.float32(1e-3) + np.float32(1e-3) * dist
    tcap = dist - eps

    ref = trace_proc_pallas(ps, jnp.asarray(o), jnp.asarray(d), pd=pd,
                            interpret=True)
    cap = trace_proc_pallas(ps, jnp.asarray(o), jnp.asarray(d), pd=pd,
                            interpret=True, tcap=jnp.asarray(tcap))

    rh, rt = np.asarray(ref.hit), np.asarray(ref.t)
    ch, ct = np.asarray(cap.hit), np.asarray(cap.t)
    # below the cap, records agree exactly
    below = rh & (rt <= tcap)
    assert (ch[below] == rh[below]).all()
    assert (ct[below] == rt[below]).all()
    for f in ("block", "face", "entering"):
        a = np.asarray(getattr(ref, f))[below]
        b = np.asarray(getattr(cap, f))[below]
        assert (a == b).all(), f
    # capped lanes never record hits past the cap
    assert (~(ch & (ct > tcap))).all()
    # the shadow visibility verdict is identical
    vis_ref = (~rh) | (rt >= dist - eps)
    vis_cap = (~ch) | (ct >= dist - eps)
    assert (vis_ref == vis_cap).all()
    # sanity: the cap actually dropped some far hits (non-vacuous)
    assert (rh & ~ch).any()


def test_tcap_xla_tracer_matches_verdict(block_table):
    """The XLA while_loop tracer honors the same per-lane cap (the staged
    fallback's shadow rays stop at the light too — ops/dda_proc.trace_proc
    tcap), with the identical record-below-cap / verdict-invariance
    contract as the Pallas kernel."""
    from vrv_tpu.ops.dda_proc import trace_proc

    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    ps, pd = sc.proc_static, sc.proc_arrays

    rs = np.random.RandomState(6)
    n = 256
    o = rs.uniform(2.0, g - 2.0, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dist = rs.uniform(1.0, 1.5 * g, n).astype(np.float32)
    eps = np.float32(1e-3) + np.float32(1e-3) * dist
    tcap = dist - eps

    ref = trace_proc(ps, jnp.asarray(o), jnp.asarray(d), pd=pd)
    cap = trace_proc(ps, jnp.asarray(o), jnp.asarray(d), pd=pd,
                     tcap=jnp.asarray(tcap))

    rh, rt = np.asarray(ref.hit), np.asarray(ref.t)
    ch, ct = np.asarray(cap.hit), np.asarray(cap.t)
    below = rh & (rt <= tcap)
    assert (ch[below] == rh[below]).all()
    assert (ct[below] == rt[below]).all()
    assert (~(ch & (ct > tcap))).all()
    vis_ref = (~rh) | (rt >= dist - eps)
    vis_cap = (~ch) | (ct >= dist - eps)
    assert (vis_ref == vis_cap).all()
    assert (rh & ~ch).any()

    # tail-compaction branch: force n past the cap so the sorted-prefix
    # re-march runs (the tcap vector must follow the survivor permutation)
    import vrv_tpu.ops.dda_proc as dp

    old_cap = dp.PROC_COMPACT_CAP
    dp.PROC_COMPACT_CAP = 64
    try:
        cap2 = trace_proc(ps, jnp.asarray(o), jnp.asarray(d), pd=pd,
                          tcap=jnp.asarray(tcap))
    finally:
        dp.PROC_COMPACT_CAP = old_cap
    assert (np.asarray(cap2.hit) == ch).all()
    assert (np.asarray(cap2.t) == ct).all()
