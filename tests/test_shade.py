"""do_bounce parity unit tests: BSDF branches + radiance constants.

Direct checks of the reference kernel's semantics (SURVEY Appendix A):
  - Q3: BGRA byte order + hard clip in packing
  - Q9: sky = 50, emissive = 1000 * tex * -dot(dir, normal)
  - Q12: mirror = exact reflect; transmissive = straight-through with
    reflectivity forced to 1 (alpha of the reflectivity texture drives it)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrv_tpu.ops import dda, rng, shade
from vrv_tpu.render.megakernel import pack_bgra


def _trace_one(block_table, block_name, o, d):
    g = np.full((8, 8, 8), block_table.air, np.uint8)
    g[4, 4, 4] = block_table.block_idx(block_name)
    tr = dda.trace(
        jnp.asarray(g), jnp.asarray(block_table.translucent),
        jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32),
    )
    return tr


def _materials(block_table):
    return {
        "reflectivity": jnp.asarray(block_table.reflectivity),
        "emissivity": jnp.asarray(block_table.emissivity),
        "metallicity": jnp.asarray(block_table.metallicity),
    }


def _bounce(block_table, tr, o, d, seed=7):
    return shade.do_bounce(
        jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32),
        tr, jnp.asarray([seed], jnp.uint32), _materials(block_table), None,
    )


def test_pack_bgra_order_and_clip():
    img = pack_bgra(jnp.asarray([[[1.0, 0.5, 0.25]], [[300.0, -5.0, float("nan")]]]))
    out = np.asarray(img)
    # BGR swizzle (pathtrace_shader.rs:949): byte0 = blue
    np.testing.assert_array_equal(out[0, 0], [63, 127, 255, 255])
    # hard clip + nan -> 0
    np.testing.assert_array_equal(out[1, 0], [0, 0, 255, 255])


def test_sky_on_miss(block_table):
    tr = _trace_one(block_table, "stone", [0.5, 0.5, 0.5], [0.0, 0.0, 1.0])
    assert not bool(tr.hit[0])
    br = _bounce(block_table, tr, [0.5, 0.5, 0.5], [0.0, 0.0, 1.0])
    np.testing.assert_array_equal(np.asarray(br.emissivity)[0], [50.0, 50.0, 50.0])
    np.testing.assert_array_equal(np.asarray(br.reflectivity)[0], [0.0, 0.0, 0.0])
    assert bool(br.miss[0])


def test_mirror_reflects_exactly(block_table):
    d = np.array([1.0, -1.0, 0.0]) / np.sqrt(2)
    o = [3.0, 6.5, 4.5]  # hits the mirror's up face at 45 degrees
    tr = _trace_one(block_table, "mirror", o, d)
    assert bool(tr.hit[0]) and int(tr.face[0]) == 3
    br = _bounce(block_table, tr, o, d)
    # reflect through the +y normal
    np.testing.assert_allclose(
        np.asarray(br.new_direction)[0],
        [1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0],
        atol=1e-6,
    )
    # mirror branch: reflectivity = texture rgb (white), pdf ratio 1
    np.testing.assert_allclose(np.asarray(br.reflectivity)[0], [1.0, 1.0, 1.0], atol=1e-5)
    assert not bool(br.miss[0])


def test_transmissive_glass_continues_straight(block_table):
    glass = block_table.block_idx("glass")
    # glass reflectivity alpha < 1 drives transmissivity; find an rng seed
    # whose scatter draw lands in the transmissive branch
    d = np.array([0.0, -1.0, 0.0])
    o = [4.5, 7.5, 4.5]
    tr = _trace_one(block_table, "glass", o, d)
    assert bool(tr.hit[0]) and int(tr.block[0]) == glass
    # alpha of glass's up-face texel at the hit point
    found = False
    for seed in range(64):
        br = _bounce(block_table, tr, o, d, seed=seed)
        nd = np.asarray(br.new_direction)[0]
        if np.allclose(nd, d, atol=1e-6):
            # transmissive: direction unchanged, reflectivity forced to 1
            np.testing.assert_allclose(
                np.asarray(br.reflectivity)[0], [1.0, 1.0, 1.0], atol=1e-6
            )
            found = True
            break
    assert found, "no seed landed in the transmissive branch"


def test_lambertian_reflectivity_over_pi(block_table):
    d = np.array([0.0, -1.0, 0.0])
    o = [4.5, 7.5, 4.5]
    tr = _trace_one(block_table, "stone", o, d)
    br = _bounce(block_table, tr, o, d, seed=3)
    # stone: metallicity 0, alpha 1 -> always lambertian; without lights the
    # pdf ratio is exactly 1, so R = texel_rgb / pi
    refl = np.asarray(br.reflectivity)[0]
    stone = block_table.block_idx("stone")
    # hit point (4.5, 5, 4.5) -> up face texel at uv (.5, .5)
    texel = block_table.reflectivity[stone * 6 + 3, 8, 8, :3]
    np.testing.assert_allclose(refl, texel / np.pi, rtol=1e-5)
    # new direction in the upper hemisphere
    assert np.asarray(br.new_direction)[0][1] > 0


def test_emissive_lamp_scales_with_cosine(block_table):
    # straight-on hit: -dot(d, n) = 1
    d0 = np.array([0.0, -1.0, 0.0])
    o0 = [4.5, 7.5, 4.5]
    tr0 = _trace_one(block_table, "lamp", o0, d0)
    e0 = np.asarray(_bounce(block_table, tr0, o0, d0).emissivity)[0]
    lamp = block_table.block_idx("lamp")
    texel = block_table.emissivity[lamp * 6 + 3, 8, 8]
    np.testing.assert_allclose(e0, 1000.0 * texel, rtol=1e-5)

    # oblique hit at 45 degrees: scaled by cos
    d1 = np.array([1.0, -1.0, 0.0]) / np.sqrt(2)
    o1 = [1.5, 8.0, 4.5]
    tr1 = _trace_one(block_table, "lamp", o1, d1)
    assert bool(tr1.hit[0]) and int(tr1.face[0]) == 3
    e1 = np.asarray(_bounce(block_table, tr1, o1, d1).emissivity)[0]
    ratio = e1 / np.maximum(e0, 1e-9)
    np.testing.assert_allclose(ratio, 1.0 / np.sqrt(2), rtol=3e-2)


def test_fetch_atlas_onehot_bit_identical(block_table):
    """The one-hot MXU atlas fetch equals the gather bit-for-bit on the
    covered texture set and returns zeros outside it."""
    import numpy as np
    import jax.numpy as jnp

    from vrv_tpu.ops.shade import _fetch_atlas, _fetch_atlas_onehot

    packed = np.concatenate(
        [block_table.reflectivity, block_table.emissivity,
         block_table.metallicity], axis=-1,
    )
    atlas = jnp.asarray(packed)
    grass = int(block_table.block_idx("grass"))
    stone = int(block_table.block_idx("stone"))
    tex_set = tuple(b * 6 + f for b in (grass, stone) for f in range(6))

    rng = np.random.default_rng(7)
    n = 4096
    t = jnp.asarray(rng.choice(tex_set, n).astype(np.int32))
    u = jnp.asarray(rng.random(n, dtype=np.float32))
    v = jnp.asarray(rng.random(n, dtype=np.float32))
    ref = np.asarray(_fetch_atlas(atlas, t, u, v))
    got = np.asarray(_fetch_atlas_onehot(atlas, t, u, v, tex_set))
    assert (ref == got).all()

    # ids outside the set -> zeros (downstream hit-masking discards them)
    t_out = jnp.full((8,), int(block_table.air) * 6, jnp.int32)
    z = np.asarray(_fetch_atlas_onehot(atlas, t_out, u[:8], v[:8], tex_set))
    assert (z == 0).all()
