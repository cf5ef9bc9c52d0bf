"""Regression gates for the round-3 code-review fixes.

Covers: the fused path kernel's coarse-skip + instance early-exit
combination (trace_path_pallas is a documented public entry point and
must work with ps.use_coarse=True even though megakernel disables it),
the instance alpha byte-exactness eligibility gate (a non-byte alpha
like 0.3 must evict to the staged kernels instead of silently diverging
fused-vs-staged), and `--debug-view none` not overriding --mode.
"""

import dataclasses

import numpy as np
import pytest

import jax

from vrv_tpu.config import build_arg_parser, configs_from_args
from vrv_tpu.config import WorldConfig
from vrv_tpu.game.world import Isometry
from vrv_tpu.ops.instances import transform_mesh
from vrv_tpu.render.scene import Scene
from vrv_tpu.utils.geometry import unitcube


def _cube_scene(block_table, g=32, rest=False):
    """Worldgen scene + a unitcube instance: floating 3 cells up
    (rest=False) or RESTING directly on the terrain's top solid cell
    (rest=True — the reference app's ego-cube-on-the-ground pose, and
    the geometry class where a coarse skip's landing cell contains an
    instance side-face hit with a solid boundary right below it)."""
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc = Scene(wc, table=block_table)
    grid_np = sc._grid_np
    solid = block_table.solid[grid_np]
    ys = np.nonzero(solid[g // 2, :, g // 2])[0]
    ytop = int(ys.max())
    dy = 1.0 if rest else 3.0
    # grid-local cube base corner: (g/2, ytop+dy, g/2)
    cube = transform_mesh(
        unitcube(),
        Isometry(np.array([g / 2.0, ytop + dy, g / 2.0])),
    )
    sc.set_instances([cube])
    eye = np.array([g / 2.0, ytop + 8.0, g / 2.0 - 6.0], np.float32)
    return sc, eye, ytop


def test_fused_path_coarse_skip_with_instances(block_table):
    """trace_path_pallas with use_coarse=True AND instances: the instance
    early-exit compares march progress against the instance hit t, and
    under a coarse skip that progress must be the landing-cell ENTRY t
    (the last skipped crossing) — the call must run (regression:
    NameError on t_skip) and produce results bit-identical to the
    exhaustive (coarse-off) march, including for oblique rays that hit a
    resting cube's side face inside the skip's landing cell and then
    record the terrain boundary voxel hit right below it (the region-
    EXIT t would retire those lanes with zero records)."""
    from vrv_tpu.ops.pallas.path_proc import trace_path_pallas

    sc, eye, ytop = _cube_scene(block_table, rest=True)
    ps = sc.proc_static
    assert ps is not None and ps.coarse_const, "coarse consts must be baked"
    assert sc.instances_device is not None and sc.inst_static is not None
    g = 32

    # fan 1: from above, down through the cube into the terrain
    # (instance hits AND voxel hits AND sky misses)
    k = 8
    gy, gx = np.mgrid[0:k, 0:k].astype(np.float32)
    d1 = np.stack(
        [(gx - k / 2) / k, -np.ones_like(gx), (gy - k / 2) / k], axis=-1
    ).reshape(-1, 3)
    o1 = np.broadcast_to(eye, d1.shape).astype(np.float32)
    # fan 2: oblique rays from the -x side aimed across the cube's side
    # faces and the first air cells around its base, so some lanes hit
    # the side face inside the landing cell and then the solid boundary
    eye2 = np.array([g / 2.0 - 5.0, ytop + 7.0, g / 2.0 + 0.5], np.float32)
    ty, tz = np.mgrid[0:k, 0:k].astype(np.float32)
    targets = np.stack(
        [np.full_like(ty, g / 2.0),
         ytop + 1.05 + 0.9 * ty / (k - 1),
         g / 2.0 + 0.05 + 0.9 * tz / (k - 1)], axis=-1
    ).reshape(-1, 3)
    d2 = targets - eye2
    o2 = np.broadcast_to(eye2, d2.shape).astype(np.float32)
    o = np.concatenate([o1, o2]).astype(np.float32)
    d = np.concatenate([d1, d2]).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    seeds = np.arange(len(d), dtype=np.uint32)

    def run(use_coarse):
        # unroll=1 keeps the interpret-mode XLA:CPU compile affordable
        return trace_path_pallas(
            ps._replace(use_coarse=use_coarse), o, d, seeds, 2,
            pd=sc.proc_arrays, interpret=True, unroll=1,
            inst=sc.instances_device, inst_static=sc.inst_static,
        )

    r_coarse = run(True)
    r_exact = run(False)
    flat_c, tdef = jax.tree_util.tree_flatten(r_coarse)
    flat_e, tdef_e = jax.tree_util.tree_flatten(r_exact)
    assert tdef == tdef_e
    assert flat_c
    for a, b in zip(flat_c, flat_e):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the fans actually exercised both resolution classes
    assert bool(np.asarray(r_coarse[2][0].hit).any()), "no instance hit"
    assert bool(np.asarray(r_coarse[0][0].hit).any()), "no voxel hit"
    # and the divergence class itself: some lane marched to a recorded
    # voxel ENTERING crossing that the instance then beat at resolution
    # (retire masks the hit bit via inst_wins but keeps the recorded
    # entering/face/hx fields in the packed word — the class where a
    # region-exit-t early-exit would have left the record zero)
    both = (np.asarray(r_coarse[2][0].hit)
            & ~np.asarray(r_coarse[0][0].hit)
            & np.asarray(r_coarse[0][0].entering))
    assert bool(both.any()), "no lane marched voxel-record-then-instance-won"


def test_set_instances_alpha_byte_exact_gate(block_table):
    """An instance texture whose alpha is not representable as k/255 in
    f32 must set inst_static=None (staged kernels), because the fused
    kernel reconstructs alpha from baked u8 bytes; the shipped assets
    (u8-sourced, byte/255 in f32) must stay kernel-eligible."""
    sc, _, _ = _cube_scene(block_table)
    assert sc.inst_static is not None  # shipped assets are byte-exact

    refl = block_table.reflectivity.copy()
    refl[0, ..., 3] = np.float32(0.3)  # not k/255 for any integer k
    t2 = dataclasses.replace(block_table, reflectivity=refl)
    g = 32
    wc = WorldConfig(size=(g, g, g), origin=(-g // 2, -g // 2, -g // 2), seed=0)
    sc2 = Scene(wc, table=t2)
    cube = transform_mesh(unitcube(), Isometry(np.array([0.0, g - 4.0, 0.0])))
    sc2.set_instances([cube])
    assert sc2.inst_static is None


@pytest.mark.parametrize(
    "argv,mode",
    [
        (["--mode", "wavefront_compact", "--debug-view", "none"],
         "wavefront_compact"),
        (["--mode", "wavefront", "--debug-view", "prim"], "megakernel"),
        (["--mode", "wavefront"], "wavefront"),
        (["--debug-albedo"], "megakernel"),
        # explicit --debug-view none wins over --debug-albedo: no view
        # renders, so the chosen mode must not be overridden either
        (["--mode", "wavefront", "--debug-albedo", "--debug-view", "none"],
         "wavefront"),
    ],
)
def test_debug_view_none_keeps_mode(argv, mode):
    """'none' is an accepted --debug-view choice and must not silently
    force the renderer mode to megakernel; real debug views still do."""
    args = build_arg_parser().parse_args(argv)
    rc, _ = configs_from_args(args)
    assert rc.mode == mode
