"""Texture-fetch formulations are bit-identical.

cfg.tex_fetch selects how shade_resolved reads the small reachable
texture set ('split' one-hot dot + select chain / 'dot' barrier-forced
MXU dot + one-hot einsum / 'take' combined-index row gather). All three
read exactly one texel per row (or exact 0 for rows outside the set),
so full renders must be bitwise equal — the formulation is purely a
performance choice (xprof found XLA rewrites the 'split' dot into a
gather fusion that materializes the (n,K,C) intermediate).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vrv_tpu.config import RenderConfig

from tests.test_path_inst import _ego_scene


@pytest.fixture(autouse=True)
def interpret_pallas():
    import vrv_tpu.ops.pallas.trace_proc as tp

    old = tp.INTERPRET
    tp.INTERPRET = True
    yield
    tp.INTERPRET = old


def test_fetch_modes_bit_identical_unit():
    """Direct unit check of the three fetch kernels on random indices,
    including rows whose texture id is outside the set (exact 0)."""
    from vrv_tpu.ops.shade import _fetch_atlas_onehot, _fetch_atlas_take

    rng = np.random.default_rng(7)
    T, S, C = 9, 16, 8
    atlas = jnp.asarray(rng.standard_normal((T, S, S, C)), jnp.float32)
    n = 257
    tex_set = (0, 2, 3, 7)
    t = jnp.asarray(rng.integers(0, T, n), jnp.int32)  # some outside the set
    u = jnp.asarray(rng.random(n), jnp.float32)
    v = jnp.asarray(rng.random(n), jnp.float32)

    from vrv_tpu.ops.shade import _fetch_atlas_mxu

    split = np.asarray(_fetch_atlas_onehot(atlas, t, u, v, tex_set, "split"))
    dot = np.asarray(_fetch_atlas_onehot(atlas, t, u, v, tex_set, "dot"))
    take = np.asarray(_fetch_atlas_take(atlas, t, u, v, tex_set))
    mxu = np.asarray(_fetch_atlas_mxu(atlas, t, u, v, tex_set))
    assert (split == dot).all()
    assert (split == take).all()
    assert (split == mxu).all()
    outside = ~np.isin(np.asarray(t), tex_set)
    assert outside.any() and (split[outside] == 0.0).all()


def test_dedup_groups_bit_identical():
    """Content-dedup groups (tuple entries) read the representative's
    texels for every member id — equal to the flat per-id fetch when the
    members' content is byte-identical."""
    from vrv_tpu.ops.shade import _fetch_atlas_onehot, _fetch_atlas_take

    rng = np.random.default_rng(11)
    T, S, C = 8, 16, 8
    atlas_np = rng.standard_normal((T, S, S, C)).astype(np.float32)
    atlas_np[3] = atlas_np[1]  # duplicated content
    atlas_np[6] = atlas_np[1]
    atlas_np[5] = atlas_np[2]
    atlas = jnp.asarray(atlas_np)
    n = 300
    t = jnp.asarray(rng.integers(0, T, n), jnp.int32)
    u = jnp.asarray(rng.random(n), jnp.float32)
    v = jnp.asarray(rng.random(n), jnp.float32)

    flat = (1, 2, 3, 5, 6)
    grouped = ((1, 3, 6), (2, 5))
    want = np.asarray(_fetch_atlas_onehot(atlas, t, u, v, flat, "split"))
    for mode in ("split", "dot"):
        got = np.asarray(_fetch_atlas_onehot(atlas, t, u, v, grouped, mode))
        assert (want == got).all(), mode
    got = np.asarray(_fetch_atlas_take(atlas, t, u, v, grouped))
    assert (want == got).all()
    from vrv_tpu.ops.shade import _fetch_atlas_mxu

    got = np.asarray(_fetch_atlas_mxu(atlas, t, u, v, grouped))
    assert (want == got).all()


def test_scene_tex_dedup_map(block_table):
    """Scene.tex_dedup maps every texture id to the lowest id with
    byte-identical packed content, and the shipped assets really do
    collapse (the dedup's whole value)."""
    from vrv_tpu.config import WorldConfig
    from vrv_tpu.render.scene import Scene

    sc = Scene(WorldConfig(size=(8, 8, 8), origin=(0, 0, 0), seed=0),
               table=block_table)
    dd = sc.tex_dedup
    import numpy as _np
    packed = _np.concatenate(
        [block_table.reflectivity, block_table.emissivity,
         block_table.metallicity], axis=-1)
    assert len(dd) == packed.shape[0]
    for tid, canon in enumerate(dd):
        assert canon <= tid
        assert packed[tid].tobytes() == packed[canon].tobytes()
    assert len(set(dd)) < len(dd)  # shipped assets really share textures


def test_fetch_modes_bit_identical_full_scene(block_table):
    """Graded feature set (lamp + edit + instance): whole renders equal
    bitwise across tex_fetch modes."""
    sc, cam = _ego_scene(block_table, with_lamp=True)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_bounces=3, tracer="proc", pallas_unroll=1)
    imgs = [
        np.asarray(sc.render_samples(
            *cam, 0, cfg.replace(proc_backend="pallas", tex_fetch=mode)))
        for mode in ("split", "dot", "take", "mxu")
    ]
    for i in range(1, len(imgs)):
        assert (imgs[0] == imgs[i]).all(), i
