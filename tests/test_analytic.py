"""Quantitative anchors with analytically known radiance.

The MSE-vs-reference-frames gate is unmeetable in this environment (no
GPU; docs/PARITY.md), so these tests anchor the renderer to ABSOLUTE
radiance values derived outside the render path:

1. Closed form: above an all-covering lambertian slab with no lights,
   every camera ray's radiance is EXACTLY sky * albedo(texel) — the
   cosine-sampled bounce escapes to the sky with probability 1 and the
   estimator has zero variance: the reference's lambert bounce multiplies
   throughput by reflectivity/pi exactly (refl_lambert * spdf/rpdf with
   spdf/rpdf == x/x == 1.0 in f32 — pathtrace_shader.rs:775-779 keeps the
   1/pi; the constants are tuned around it). Pixel values are checked
   against 50 * atlas_texel / pi computed from first principles (plane
   intersection + the chunk.rs uv affine + nearest texel), per pixel,
   near-exactly.

2. Numerical quadrature: a lamp block standing on the slab lights it;
   with sky_emission = 0 and 2 bounces, the pixel estimate's expectation
   is the single-scatter integral
       (rho_P gain / pi^2) * sum_faces  int te(y) cos_l(y)^2 cos_x(y)
                                              / d(y)^2  dA
   (one cos_l from the cosine-lobed emitter — emissivity = gain*te*cos,
   pathtrace_shader.rs:754 — one from the solid-angle measure, and the
   reference's throughput convention keeps BRDF/pi against the
   cos/pi-cancelled pdf, hence pi^-2; the one-sample-MIS identity makes
   every estimator — pure chain, mixture MIS, split/flat — share this
   expectation). A midpoint-rule quadrature over
   the lamp's four exposed side faces is the oracle; both NEE estimators
   (mixture MIS and the production split/flat sampler) must match it
   within CLT error bars. This is the absolute-correctness complement to
   the furnace-style unbiasedness gates in test_lightbvh.
"""

import numpy as np

import jax.numpy as jnp

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.ops.camera_rays import raygen
from vrv_tpu.render.scene import Scene

SLAB_Y = 24  # cells y >= SLAB_Y are stone; the exposed plane is y == SLAB_Y
G = 32


def _slab_scene(block_table, lamp_cell=None):
    wc = WorldConfig(size=(G, G, G), origin=(0, 0, 0), seed=0)
    sc = Scene(wc, table=block_table)
    grid = np.full((G, G, G), block_table.air, np.uint8)
    grid[:, SLAB_Y:, :] = block_table.block_idx("stone")
    if lamp_cell is not None:
        grid[lamp_cell] = block_table.block_idx("lamp")
    sc.set_grid(grid, (0, 0, 0))
    return sc


def _cam_down(fy=0.94, fz=0.342):
    # orthonormal triple pointing +y-ward (toward the slab), the
    # convention the other render tests use
    f = np.array([0.0, fy, fz], np.float64)
    f /= np.linalg.norm(f)
    front = f.astype(np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -f[2], f[1]], np.float32)
    return front, right, up


def test_flat_slab_closed_form(block_table):
    """Render == 50 * albedo(texel) per pixel, from first principles."""
    sc = _slab_scene(block_table)
    assert sc.bvh_device is None  # no lights -> the closed form holds

    W, H = 24, 16
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=1,
                       max_bounces=3, tracer="rows", jitter_scale=0.0)
    eye = np.array([16.0, 12.0, 14.0], np.float32)
    front, right, up = _cam_down()

    img = np.asarray(sc.render_samples(
        eye, front, right, up, 0, cfg
    ))[0]                                                   # (H, W, 3)

    # first-principles expectation: intersect the unjittered primaries
    # with the y == SLAB_Y plane; texel via the chunk.rs affine for the
    # 'down' face (u = fx, v = fz) and nearest 16x16 sampling
    o, d, _ = raygen(jnp.asarray(eye), jnp.asarray(front),
                     jnp.asarray(right), jnp.asarray(up),
                     W, H, 1, jnp.uint32(0), jitter_scale=0.0)
    o = np.asarray(o)[0].reshape(-1, 3)
    d = np.asarray(d)[0].reshape(-1, 3)
    t = (SLAB_Y - o[:, 1]) / d[:, 1]
    px = o + t[:, None] * d
    hits = (d[:, 1] > 0) & (px[:, 0] >= 0) & (px[:, 0] < G) \
        & (px[:, 2] >= 0) & (px[:, 2] < G)
    fx = px[:, 0] - np.floor(px[:, 0])
    fz = px[:, 2] - np.floor(px[:, 2])
    tx = np.clip((fx * 16).astype(np.int32), 0, 15)
    ty = np.clip((fz * 16).astype(np.int32), 0, 15)
    refl = np.asarray(sc.materials["reflectivity"])
    stone = block_table.block_idx("stone")
    rho = refl[stone * 6 + 2, ty, tx, :3]                   # 'down' face
    expected = np.where(
        hits[:, None], 50.0 * rho / np.pi, 50.0
    ).reshape(H, W, 3)

    err = np.abs(img - expected)
    # texel-boundary pixels may disagree (the tracer's t vs the plane
    # intersection differ in the last ulp); everything else is exact
    exact = (err < 1e-3).all(axis=-1)
    assert exact.mean() >= 0.95, f"only {exact.mean():.2%} pixels match"
    assert np.median(err) < 1e-4
    assert hits.mean() > 0.5  # the slab actually fills most of the view

    # bounce budget semantics: at max_bounces=1 the floor contributes
    # only its (zero) emission, sky pixels stay 50
    img1 = np.asarray(sc.render_samples(
        eye, front, right, up, 0, cfg.replace(max_bounces=1)
    ))[0]
    expected1 = np.broadcast_to(
        np.where(hits[:, None], 0.0, 50.0), (H * W, 3)
    ).reshape(H, W, 3)
    assert (np.abs(img1 - expected1) < 1e-3).all(axis=-1).mean() >= 0.95


def test_mirror_slab_closed_form(block_table):
    """Mirror branch: L == reflectivity(texel) * 50 exactly (the metallic
    branch multiplies by the raw texture rgb — no 1/pi — and the
    reflected ray escapes to the sky deterministically)."""
    wc = WorldConfig(size=(G, G, G), origin=(0, 0, 0), seed=0)
    sc = Scene(wc, table=block_table)
    mirror = block_table.block_idx("mirror")
    grid = np.full((G, G, G), block_table.air, np.uint8)
    grid[:, SLAB_Y:, :] = mirror
    sc.set_grid(grid, (0, 0, 0))

    metal = np.asarray(sc.materials["metallicity"])
    assert (metal[mirror * 6 + 2] == 1.0).all()  # branch is deterministic

    W, H = 24, 16
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=1,
                       max_bounces=3, tracer="rows", jitter_scale=0.0)
    eye = np.array([16.0, 12.0, 14.0], np.float32)
    front, right, up = _cam_down()
    img = np.asarray(sc.render_samples(eye, front, right, up, 0, cfg))[0]

    o, d, _ = raygen(jnp.asarray(eye), jnp.asarray(front),
                     jnp.asarray(right), jnp.asarray(up),
                     W, H, 1, jnp.uint32(0), jitter_scale=0.0)
    o = np.asarray(o)[0].reshape(-1, 3)
    d = np.asarray(d)[0].reshape(-1, 3)
    t = (SLAB_Y - o[:, 1]) / d[:, 1]
    px = o + t[:, None] * d
    hits = (d[:, 1] > 0) & (px[:, 0] >= 0) & (px[:, 0] < G) \
        & (px[:, 2] >= 0) & (px[:, 2] < G)
    tx = np.clip(((px[:, 0] - np.floor(px[:, 0])) * 16).astype(np.int32), 0, 15)
    ty = np.clip(((px[:, 2] - np.floor(px[:, 2])) * 16).astype(np.int32), 0, 15)
    refl = np.asarray(sc.materials["reflectivity"])
    rho = refl[mirror * 6 + 2, ty, tx, :3]
    expected = np.where(hits[:, None], 50.0 * rho, 50.0).reshape(H, W, 3)
    exact = (np.abs(img - expected) < 1e-3).all(axis=-1)
    assert exact.mean() >= 0.95, f"only {exact.mean():.2%} pixels match"


def _quadrature(sc, block_table, P, rho_P, gain, m=48):
    """Single-scatter integral at floor point P via midpoint rule over
    the lamp's four exposed side faces (the cosine-lobed emitter)."""
    emis = np.asarray(sc.materials["emissivity"])
    lamp = block_table.block_idx("lamp")
    cell = np.array([16.0, 23.0, 16.0])
    n_floor = np.array([0.0, -1.0, 0.0])
    total = np.zeros(3)
    # (face, plane axis, plane value, in-plane axes)
    faces = [
        (0, 0, 16.0, (-1.0, 0.0, 0.0)),
        (1, 0, 17.0, (1.0, 0.0, 0.0)),
        (4, 2, 16.0, (0.0, 0.0, -1.0)),
        (5, 2, 17.0, (0.0, 0.0, 1.0)),
    ]
    # face uv affines for frac = y - cell (chunk.rs tables): see
    # ops/dda.FACE_U_AFFINE / FACE_V_AFFINE rows 0/1/4/5
    g = (np.arange(m) + 0.5) / m
    for face, ax, plane, nf in faces:
        nf = np.asarray(nf)
        # in-plane coordinates: a = the other horizontal axis, b = y
        a, b = np.meshgrid(g, g, indexing="ij")
        y = np.empty((m, m, 3))
        y[..., ax] = plane
        y[..., 1] = 23.0 + b
        other = 2 if ax == 0 else 0
        y[..., other] = cell[other] + a
        frac = y - cell
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        if face == 0:
            u, v = 1.0 - fz, 1.0 - fy
        elif face == 1:
            u, v = fz, 1.0 - fy
        elif face == 4:
            u, v = fx, 1.0 - fy
        else:
            u, v = 1.0 - fx, 1.0 - fy
        tx = np.clip((u * 16).astype(np.int32), 0, 15)
        ty = np.clip((v * 16).astype(np.int32), 0, 15)
        te = emis[lamp * 6 + face, ty, tx]                  # (m, m, 3)
        to = y - P                                          # (m, m, 3)
        d2 = (to * to).sum(-1)
        dist = np.sqrt(d2)
        dirn = to / dist[..., None]
        cos_x = (dirn * n_floor).sum(-1)
        cos_l = (-dirn * nf).sum(-1)
        w = (np.maximum(cos_x, 0.0) * np.maximum(cos_l, 0.0) ** 2) / d2
        total += (te * w[..., None]).sum((0, 1)) * gain / (m * m)
    return (rho_P / np.pi ** 2) * total


def test_lamp_single_scatter_matches_quadrature(block_table):
    sc = _slab_scene(block_table, lamp_cell=(16, 23, 16))
    assert sc.bvh_device is not None
    assert sc.bvh_device.get("flat") is not None  # production sampler

    W, H, SPP = 16, 12, 320
    base = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                        max_bounces=2, tracer="rows", jitter_scale=0.0,
                        sky_emission=0.0)
    eye = np.array([16.5, 16.0, 12.0], np.float32)
    front, right, up = _cam_down()

    # pixel -> floor point (deterministic primaries), masking lamp-view
    # pixels and anything outside the slab
    o, d, _ = raygen(jnp.asarray(eye), jnp.asarray(front),
                     jnp.asarray(right), jnp.asarray(up),
                     W, H, 1, jnp.uint32(0), jitter_scale=0.0)
    o = np.asarray(o)[0].reshape(-1, 3)
    d = np.asarray(d)[0].reshape(-1, 3)
    t = (SLAB_Y - o[:, 1]) / d[:, 1]
    P = o + t[:, None] * d
    lo, hi = np.array([16.0, 23.0, 16.0]), np.array([17.0, 24.0, 17.0])
    with np.errstate(divide="ignore"):
        t0 = (lo - o) / d
        t1 = (hi - o) / d
    tin = np.minimum(t0, t1).max(1)
    tout = np.maximum(t0, t1).min(1)
    hits_lamp = (tin <= tout) & (tout > 0) & (tin < t)
    floor_px = (
        (d[:, 1] > 0) & ~hits_lamp
        & (P[:, 0] > 1) & (P[:, 0] < G - 1)
        & (P[:, 2] > 1) & (P[:, 2] < G - 1)
    )
    assert floor_px.sum() >= 40

    refl = np.asarray(sc.materials["reflectivity"])
    stone = block_table.block_idx("stone")
    fx = P[:, 0] - np.floor(P[:, 0])
    fz = P[:, 2] - np.floor(P[:, 2])
    tx = np.clip((fx * 16).astype(np.int32), 0, 15)
    ty = np.clip((fz * 16).astype(np.int32), 0, 15)
    rho = refl[stone * 6 + 2, ty, tx, :3]

    idx = np.nonzero(floor_px)[0]
    quad = np.array([
        _quadrature(sc, block_table, P[i], rho[i], base.emission_gain)
        for i in idx
    ])                                                      # (K, 3)

    for mode in ("mixture", "split"):
        samples = np.asarray(sc.render_samples(
            eye, front, right, up, 0, base.replace(nee_mode=mode)
        ))                                                  # (SPP, H, W, 3)
        flat = samples.reshape(SPP, -1, 3)[:, idx, :]
        # region-mean gate: K pixels x SPP samples of the same integral
        # family -> tight CLT bars on the mean over the region
        est = flat.mean((0, 1))
        truth = quad.mean(0)
        sem = flat.mean(1).std(0) / np.sqrt(SPP)
        err = np.abs(est - truth)
        tol = 5.0 * sem + 0.05 * truth + 1e-3
        assert (err <= tol).all(), (
            f"{mode}: est {est} vs quadrature {truth} (sem {sem})"
        )
        assert (truth > 1e-2).any()  # non-vacuous: the lamp actually lights


def test_lamp_direct_view_closed_form(block_table):
    """Emission convention: a pixel looking straight at a lamp face reads
    EXACTLY gain * te(texel) * cos(view angle) at max_bounces=1 — the
    cosine-lobed emitter of pathtrace_shader.rs:754, deterministic."""
    sc = _slab_scene(block_table, lamp_cell=(16, 23, 16))
    W, H = 24, 16
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=1,
                       max_bounces=1, tracer="rows", jitter_scale=0.0,
                       sky_emission=0.0)
    # straight down just over the lamp (it must subtend many pixels):
    # every lamp-view ray enters its -y face
    eye = np.array([16.5, 21.8, 16.5], np.float32)
    front = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.array([-1.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    img = np.asarray(sc.render_samples(eye, front, right, up, 0, cfg))[0]

    o, d, _ = raygen(jnp.asarray(eye), jnp.asarray(front),
                     jnp.asarray(right), jnp.asarray(up),
                     W, H, 1, jnp.uint32(0), jitter_scale=0.0)
    o = np.asarray(o)[0].reshape(-1, 3)
    d = np.asarray(d)[0].reshape(-1, 3)
    t = (23.0 - o[:, 1]) / d[:, 1]                    # lamp top plane
    px = o + t[:, None] * d
    on_lamp = (
        (px[:, 0] >= 16.02) & (px[:, 0] <= 16.98)
        & (px[:, 2] >= 16.02) & (px[:, 2] <= 16.98)   # margins: edge ulps
    )
    assert on_lamp.sum() >= 20
    tx = np.clip(((px[:, 0] - 16.0) * 16).astype(np.int32), 0, 15)
    ty = np.clip(((px[:, 2] - 16.0) * 16).astype(np.int32), 0, 15)
    emis = np.asarray(sc.materials["emissivity"])
    lamp = block_table.block_idx("lamp")
    te = emis[lamp * 6 + 2, ty, tx]                   # 'down' face texels
    cos_v = d[:, 1]                                   # -d . (0,-1,0)
    expected = cfg.emission_gain * te * cos_v[:, None]

    got = img.reshape(-1, 3)[on_lamp]
    want = expected[on_lamp]
    rel = np.abs(got - want) / np.maximum(want, 1e-3)
    ok = (rel < 1e-3).all(axis=-1)
    assert ok.mean() >= 0.9, f"only {ok.mean():.2%} lamp pixels match"
