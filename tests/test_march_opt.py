"""cfg.pallas_march_opt: the convert/select-lean march body is VALUE-
identical to the round-3 body.

The rewrites (ops/pallas/trace_proc.py): sign-bit-xor gradient dots
(s * v with s an exact +-1.0 == IEEE sign flip), bool-derived simplex
corner offsets, hoisted per-axis step constants (step_consts), and
xor-derived exiting-face codes. Chosen from measured v5e VPU op costs
(tools/vpu_probe.py): f32<->i32 converts and selects run at ~2x the ALU
ops they replace, while i32 multiplies are full-rate.

Gates: helper-level bit equality, the single-bounce kernel, and the full
graded render (lamp + edit + instance + in-kernel NEE), old vs new.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops.noise import _grad_dot, _seed_mix
from vrv_tpu.ops.pallas.trace_proc import (
    _grad_dot_sx,
    _simplex3_seeded,
    trace_proc_pallas,
)

from tests.test_path_inst import _ego_scene
from tests.test_pallas_proc import _ps


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def test_grad_dot_signxor_bit_identical():
    k = jax.random.PRNGKey(0)
    gi = jax.random.randint(k, (4096,), 0, 12)
    c = jax.random.normal(jax.random.PRNGKey(1), (3, 4096))
    # include signed zeros and exact negatives (the xor path flips the
    # sign BIT; -0.0 must round-trip exactly like the multiply)
    c = c.at[:, 0].set(0.0).at[:, 1].set(-0.0).at[:, 2].set(-1.5)
    a = np.asarray(_grad_dot(gi, c[0], c[1], c[2]))
    b = np.asarray(_grad_dot_sx(gi, c[0], c[1], c[2]))
    assert (a.view(np.uint32) == b.view(np.uint32)).all()


def test_simplex_opt_bit_identical():
    sm = _seed_mix(0)
    k = jax.random.PRNGKey(2)
    p = jax.random.uniform(k, (3, 20000), minval=-8.0, maxval=8.0)
    # lattice points and tie planes are the sensitive inputs
    p = p.at[:, :64].set(jnp.floor(p[:, :64]))
    a = np.asarray(_simplex3_seeded(p[0], p[1], p[2], sm, opt=False))
    b = np.asarray(_simplex3_seeded(p[0], p[1], p[2], sm, opt=True))
    assert (a.view(np.uint32) == b.view(np.uint32)).all()


def test_trace_kernel_march_opt_bit_identical(block_table):
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    ps = _ps(block_table, wc, (g, g, g))
    o = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (3000, 3),
                           minval=-10.0, maxval=g + 10.0),
        np.float32,
    )
    d = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (3000, 3)),
                   np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d[0] = 0
    d[1] = [1, 0, 0]
    d[2] = [0, -1, 0]
    rs = {}
    for mo in (False, True):
        rs[mo] = trace_proc_pallas(
            ps, jnp.asarray(o), jnp.asarray(d), interpret=True, march_opt=mo,
        )
    for f in ("hit", "t", "block", "face", "cell", "entering"):
        a = np.asarray(getattr(rs[False], f))
        b = np.asarray(getattr(rs[True], f))
        assert (a == b).all(), f"{f}: {(a != b).sum()} mismatches"


def test_graded_render_march_opt_bit_identical(block_table):
    """Full graded feature set (lamp edit + light BVH + ego-cube instance
    + in-kernel NEE incl. pdf records): the fused path kernel's outputs
    feed every downstream stage, so f32 radiance bit-equality here pins
    the whole opt rewrite."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_bounces=3, tracer="proc", pallas_unroll=1,
                       proc_backend="pallas")
    imgs = {}
    for mo in (0, 1, 2):
        imgs[mo] = np.asarray(sc.render_samples(
            *cam, 0, cfg.replace(pallas_march_opt=mo)
        ))
    assert (imgs[0].view(np.uint32) == imgs[1].view(np.uint32)).all()
    # level 2 (resolved-lane drift: the freeze selects dropped) must also
    # be output-identical — nothing reads a resolved lane's cell again
    assert (imgs[0].view(np.uint32) == imgs[2].view(np.uint32)).all()
    assert imgs[1].std() > 1.0  # non-trivial frame (lamp visible)
