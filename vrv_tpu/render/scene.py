"""Scene: device-resident world state + functional updates.

The TPU-native replacement for the reference's Scene/TLAS lifecycle
(reference src/render_system/scene.rs): where the reference re-meshes a
chunk, re-uploads vertex buffers, rebuilds BLAS records and marks the TLAS
dirty on every edit (scene.rs:129-386, chunk_manager.rs:331-392), here the
scene *is* a handful of arrays:

  - grid          (X,Y,Z) uint8 block ids in HBM
  - translucent   (n_blocks+1,) bool LUT
  - materials     three small float32 atlases (VMEM-resident at run time)
  - light BVH     SoA arrays (render/lightbvh.py), rebuilt host-side only
                  when an edit touches an emissive block or its neighbours
                  (the reference rebuilds its light BVH on any TLAS dirty,
                  scene.rs:287-308 — we're strictly lazier)

`set_block` is a functional update (jnp .at[].set with buffer donation):
the copy-then-swap the reference does on the host (chunk_manager.rs:337-340)
becomes an in-place HBM write under jit.

Light-BVH arrays are padded to power-of-two node capacities so edits that
change the light count hit a small number of jit specializations.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vrv_tpu.assets import BlockTable, load_block_table
from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.game import chunk as chunklib
from vrv_tpu.render import lightbvh as lb
from vrv_tpu.render import megakernel


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_cell(grid, cell, value):
    return grid.at[cell[0], cell[1], cell[2]].set(value)


def device_bvh(bvh: lb.LightBvh) -> Optional[dict]:
    if not bvh.has_lights:
        return None
    from vrv_tpu.ops.nee import pack_nodes

    dev = {
        "is_leaf": jnp.asarray(bvh.is_leaf),
        "left": jnp.asarray(bvh.left),
        "right": jnp.asarray(bvh.right),
        "aabb_min": jnp.asarray(bvh.aabb_min),
        "aabb_max": jnp.asarray(bvh.aabb_max),
        "lum6": jnp.asarray(bvh.lum6),
        "tri": jnp.asarray(bvh.tri),
        "lpa": jnp.asarray(bvh.lpa),
        "uv": jnp.asarray(bvh.uv),
        "tex": jnp.asarray(bvh.tex),
    }
    dev["packed"] = pack_nodes(dev)
    return dev


class Scene:
    """Mutable host handle around immutable device arrays."""

    def __init__(
        self,
        world_cfg: WorldConfig,
        table: Optional[BlockTable] = None,
        grid: Optional[np.ndarray] = None,
    ):
        self.world_cfg = world_cfg
        self.table = table or load_block_table()
        if grid is None:
            grid = chunklib.generate_dense_grid(world_cfg, self.table)
        self.grid = jnp.asarray(grid, jnp.uint8)
        # host mirror: every host-side consumer (light scan, proc diff,
        # edit checks) reads this instead of fetching the whole device
        # array — a 2 MB device->host pull costs ~100 ms through the
        # remote-compile tunnel, which used to dominate edit latency
        self._grid_np = np.array(np.asarray(self.grid))
        self.origin = np.asarray(world_cfg.origin, np.float32)
        self.translucent = jnp.asarray(self.table.translucent)
        self.materials = {
            "reflectivity": jnp.asarray(self.table.reflectivity),
            "emissivity": jnp.asarray(self.table.emissivity),
            "metallicity": jnp.asarray(self.table.metallicity),
            # fused 8-channel atlas: refl rgba | emis rgb | metal r
            "packed": jnp.asarray(
                np.concatenate(
                    [
                        self.table.reflectivity,
                        self.table.emissivity,
                        self.table.metallicity,
                    ],
                    axis=-1,
                )
            ),
        }
        self._emissive_blocks = np.nonzero(
            (self.table.texture_luminances.reshape(self.table.n_blocks, 6) > 0).any(1)
        )[0]
        # content dedup over the packed atlas (many face ids share one
        # texture — e.g. stone/soil use a single image for all 6 faces):
        # tex_dedup[tid] = lowest id with byte-identical 8-channel texels.
        # Groups derived from this shrink the one-hot fetch's K at
        # bit-identical results (ops/shade._tex_groups).
        packed_np = np.concatenate(
            [self.table.reflectivity, self.table.emissivity,
             self.table.metallicity], axis=-1,
        )
        by_content: dict = {}
        self.tex_dedup = tuple(
            by_content.setdefault(packed_np[i].tobytes(), i)
            for i in range(packed_np.shape[0])
        )
        self._pristine: Optional[np.ndarray] = None  # worldgen(world_cfg) cache
        self._pristine_key = None
        # emissive entity-instance triangles feeding the light BVH
        # (reference scene.rs:433-445: upload scans every object's triangles
        # for emissive textures and registers them as lights)
        self._inst_light_tri = np.zeros((0, 3, 3), np.float32)
        self._inst_light_lpa = np.zeros((0,), np.float32)
        self._inst_light_uv = np.zeros((0, 3, 2), np.float32)
        self._inst_light_tex = np.zeros((0,), np.int32)
        self._rebuild_lights()
        self._rebuild_dist()
        self._sync_proc()
        self.instances_device: Optional[dict] = None
        self.inst_static = None  # static tex-id tuple when kernel-eligible
        self.tlas_rebuilds = 0  # observability: analog of TLAS dirty rebuilds

    def set_instances(self, meshes) -> None:
        """Upload dynamic entity meshes (list of grid-LOCAL SoA meshes —
        callers subtract the window origin, see SceneManager._upload; a
        later recenter translates the uploaded set in set_grid).

        The analog of the reference's per-frame TLAS instance buffer
        (scene.rs:218-258). Arrays are padded to power-of-two triangle
        capacities to bound jit specializations.
        """
        tris, ts, uvs = [], [], []
        for mesh in meshes:
            pos = np.asarray(mesh["positions"], np.float32).reshape(-1, 3, 3)
            tris.append(pos)
            ts.append(np.asarray(mesh["t"], np.uint32).reshape(-1, 3)[:, 0])
            uvs.append(np.asarray(mesh["uv"], np.float32).reshape(-1, 3, 2))
        if not tris:
            self.instances_device = None
            self.inst_static = None
            self._set_instance_lights(
                np.zeros((0, 3, 3), np.float32), np.zeros((0,), np.float32),
                np.zeros((0, 3, 2), np.float32), np.zeros((0,), np.int32),
            )
            return
        tri = np.concatenate(tris)
        t = np.concatenate(ts)
        uv = np.concatenate(uvs)
        # fused-kernel eligibility: the in-kernel scatter branch reads
        # per-TEXTURE constant metallicity plus a per-texel alpha table
        # baked as compile-time kernel constants (a runtime texel gather
        # inside the kernel is banned; constants ride a select tree like
        # the coarse-skip words). Alpha bytes reconstruct the atlas f32
        # exactly (byte/255 in f32 both here and at asset load). Any
        # texel-VARYING metallicity texture evicts instances to the
        # staged kernels (none exists in the shipped assets — the ego
        # cube's glass faces vary only in alpha).
        tex_ids = sorted({int(x) for x in t})
        kernel_ok = True
        alpha_tables = []
        metal_vals = []
        n_tex = len(self.table.texture_luminances)
        for ti in tex_ids:
            if ti < 0 or ti >= n_tex:
                kernel_ok = False
                break
            m = self.table.metallicity[ti]
            if float(m.max()) != float(m.min()):
                kernel_ok = False
                break
            metal_vals.append(float(m.flat[0]))
            a_f32 = self.table.reflectivity[ti][..., 3].astype(np.float32)
            # byte-exactness gate: the kernel reconstructs alpha as
            # byte/255 in f32; a programmatic table whose alpha is out
            # of [0, 1] (byte packing would overflow into neighboring
            # texels' 8-bit lanes) or not representable as k/255 (e.g.
            # 0.3) would silently diverge fused-vs-staged — evict it to
            # the staged kernels instead
            if not (np.all(a_f32 >= 0.0) and np.all(a_f32 <= 1.0)):
                kernel_ok = False
                break
            ab = np.round(
                a_f32.astype(np.float64) * 255.0
            ).astype(np.uint32).ravel()  # (256,) ty-major like _fetch_atlas
            if not np.array_equal(
                ab.astype(np.float32) / np.float32(255.0), a_f32.ravel()
            ):
                kernel_ok = False
                break
            words = tuple(
                int(ab[4 * w] | (ab[4 * w + 1] << 8)
                    | (ab[4 * w + 2] << 16) | (ab[4 * w + 3] << 24))
                for w in range(64)
            )
            alpha_tables.append(words)
        self.inst_static = (
            (tuple(tex_ids), tuple(alpha_tables), tuple(metal_vals))
            if kernel_ok else None
        )
        # emissive-instance lights (scene.rs:433-445): a triangle whose
        # texture has positive mean emissive power is an NEE light; the
        # luminance-per-area comes from the texture mean (utils.rs:223-235)
        lum = self.table.texture_luminances
        tl = lum[np.clip(t.astype(np.int64), 0, len(lum) - 1)].astype(np.float32)
        em = tl > 0
        self._set_instance_lights(tri[em], tl[em], uv[em], t[em].astype(np.int32))
        n = len(tri)
        cap = max(16, 1 << (n - 1).bit_length())
        pad = cap - n
        self.instances_device = {
            "tri": jnp.asarray(np.pad(tri, ((0, pad), (0, 0), (0, 0)))),
            "t": jnp.asarray(np.pad(t, (0, pad)).astype(np.int32)),
            "uv": jnp.asarray(np.pad(uv, ((0, pad), (0, 0), (0, 0)))),
            "valid": jnp.asarray(np.arange(cap) < n),
        }

    def _rebuild_dist(self):
        from vrv_tpu.ops.dda import build_distance_field

        self.dist = jax.jit(build_distance_field, static_argnums=(1,))(
            self.grid, int(self.table.air)
        )
        self._repack_rows()

    def _repack_rows(self):
        import os

        from vrv_tpu.ops.dda_rows import W, pack_rows, pack_rows_3axis

        w = int(os.environ.get("VRV_ROW_W", W))
        X, Y, Z = self.grid.shape
        if Z % w == 0 and X == Y == Z:
            # cubic: three transposed tables so every ray's dominant axis
            # gets multi-cell row scans (pack_rows_3axis)
            self.rows = jax.jit(pack_rows_3axis, static_argnums=(3,))(
                self.grid, self.dist, self.translucent, w
            )
        elif Z % w == 0:
            self.rows = jax.jit(pack_rows, static_argnums=(3,))(
                self.grid, self.dist, self.translucent, w
            )
        else:
            self.rows = None

    # ------------------------------------------------------------------
    # procedural tracer bundle (ops/dda_proc.py)
    # ------------------------------------------------------------------

    # beyond this many deviations from pristine worldgen the proc tracer
    # is disabled (render falls back to the 'rows' grid tracer). The
    # per-STEP edit compare is O(pad) only in chunks near the edit-set
    # AABB (trace_proc.EDIT_GATE_MIN per-chunk gating); the per-RETIRE
    # compares stay O(pad) everywhere, which bounds the useful cap —
    # round-5 on-chip A/B in docs/PERF.md prices the tiers.
    PROC_EDIT_CAP = 1024
    # beyond this many light triangles the flat split-NEE sampler stops
    # paying and sampling falls back to the stochastic BVH descent
    FLAT_LIGHT_CAP = 64

    def _sync_proc(self) -> None:
        """(Re)derive the procedural-tracer view of the current grid.

        The grid qualifies whenever it equals the tracer's own worldgen
        prediction plus at most PROC_EDIT_CAP cell edits — true for
        generated scenes, edited scenes, and streamed windows alike. The
        edit list is the diff, which also absorbs any near-threshold cells
        where XLA fusion drift rounds the density differently between the
        worldgen program and the tracer (see dda_proc.worldgen_blocks).
        """
        from vrv_tpu.ops import dda_proc

        wc = self.world_cfg
        grid_np = self._grid_np
        key = (tuple(wc.origin), grid_np.shape, wc.seed)
        t = self.table

        def _block_lambert(b: int) -> bool:
            # statically cosine-scattering: no mirror branch (metallicity
            # 0 everywhere) and no transmissive branch (alpha 1) — the
            # scatter in shade.do_bounce is then texel-independent
            return all(
                float(t.metallicity[b * 6 + f].max()) == 0.0
                and float(t.reflectivity[b * 6 + f][..., 3].min()) == 1.0
                for f in range(6)
            )

        self._lambert_blocks = tuple(
            b for b in range(t.n_blocks) if b != t.air and _block_lambert(b)
        )
        lambert_only = all(
            b in self._lambert_blocks
            for b in (int(t.block_idx("grass")), int(t.block_idx("stone")))
        )
        ps0 = dda_proc.ProcStatic(
            seed=wc.seed, noise_scale=wc.noise_scale, y_falloff=wc.y_falloff,
            threshold=wc.threshold, origin=tuple(int(x) for x in wc.origin),
            shape=grid_np.shape,
            grass=int(self.table.block_idx("grass")),
            stone=int(self.table.block_idx("stone")),
            air=int(self.table.air), n_edits=0,
            lambert_only=lambert_only,
            tex_dedup=self.tex_dedup,
        )
        if self._pristine_key != key:
            xs, ys, zs = np.meshgrid(
                *[np.arange(s, dtype=np.int32) for s in grid_np.shape], indexing="ij"
            )
            self._pristine = np.asarray(
                jax.jit(dda_proc.worldgen_blocks, static_argnums=(0,))(
                    ps0, jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
                    jnp.asarray(zs.ravel()),
                )
            ).reshape(grid_np.shape)
            self._pristine_key = key
        diff = np.argwhere(self._pristine != grid_np)
        self._proc_diff = {
            tuple(int(x) for x in c): int(grid_np[tuple(c)]) for c in diff
        }
        # highest pristine-solid y + 1 -> upward-exit certificate bound
        # (ProcStatic.y_air; solid edits extend it in-kernel at runtime)
        solid_ys = np.nonzero(
            (self._pristine != self.table.air).any(axis=(0, 2))
        )[0]
        ps0 = ps0._replace(
            y_air=int(solid_ys.max()) + 1 if len(solid_ys) else 0
        )
        self._proc_ps0 = ps0
        self._proc_finalize()

    def _sync_proc_edit(self, cell) -> None:
        """Incremental _sync_proc after one set_block: update the diff map
        at the edited cell only (the pristine prediction is cached) —
        avoids the full-grid compare per edit."""
        if getattr(self, "_pristine", None) is None or not hasattr(self, "_proc_diff"):
            return self._sync_proc()
        key = (tuple(self.world_cfg.origin), self._grid_np.shape, self.world_cfg.seed)
        if self._pristine_key != key:
            return self._sync_proc()
        ct = tuple(int(x) for x in cell)
        new = int(self._grid_np[ct])
        if int(self._pristine[ct]) == new:
            self._proc_diff.pop(ct, None)
        else:
            self._proc_diff[ct] = new
        self._proc_finalize()

    def _proc_finalize(self) -> None:
        """Build (proc_static, proc_arrays) from the current diff map."""
        from vrv_tpu.ops import dda_proc

        grid_np = self._grid_np
        ps0 = self._proc_ps0
        if len(self._proc_diff) > self.PROC_EDIT_CAP:
            self.proc_static = None
            self.proc_arrays = None
            return
        n = len(self._proc_diff)
        # pad to the next pow2 bucket (shape-stable jit caches); min 4 —
        # the per-step in-kernel compare is O(cap), and a single placed
        # lamp at the old min of 16 cost ~66 ms/frame (probe.py entry)
        cap = 0 if n == 0 else max(4, 1 << (n - 1).bit_length())
        cells = np.full((cap, 3), -(1 << 20), np.int32)  # sentinel: never matches
        blocks = np.full(cap, self.table.air, np.uint8)
        solidv = np.zeros(cap, bool)
        transl = np.ones(cap, bool)
        for i, (c, b) in enumerate(sorted(self._proc_diff.items())):
            cells[i] = c
            blocks[i] = b
            solidv[i] = b != self.table.air
            transl[i] = bool(self.table.translucent[b])
        coarse_np = dda_proc.build_coarse_dist(grid_np, self.table.air)
        if n == 0:
            # edit-free: bake the empty-box skip structures as
            # compile-time constants (with edits the kernels march
            # without in-kernel skips — rebaking per edit would force a
            # recompile per set_block)
            from vrv_tpu.ops.pallas.trace_proc import coarse_consts

            ps0 = ps0._replace(
                coarse_const=coarse_consts(
                    coarse_np, grid_np, int(self.table.air)
                )
            )
        # fused-path eligibility under edits: every edited-in block must
        # either scatter cosine (air holes or opaque-lambert placements)
        # or be constant-material OPAQUE (the mirror class: per-face
        # constant metallicity, alpha == 1 everywhere — the kernel's
        # retire branches reflect-vs-cosine on those constants, so the
        # DEFAULT placed block (mirror, quirk Q7) no longer evicts the
        # fast path). Glass (texel-varying alpha, translucent) still
        # falls back to the staged per-bounce kernels.
        t = self.table

        def _const_opaque(b: int):
            mets = []
            for f in range(6):
                a = t.reflectivity[b * 6 + f][..., 3]
                m = t.metallicity[b * 6 + f]
                if float(a.min()) != 1.0 or float(a.max()) != 1.0:
                    return None
                if float(m.max()) != float(m.min()):
                    return None
                mets.append(float(m.flat[0]))
            return tuple(mets)

        def _glass_class(b: int):
            """(metal x6, alpha-words x6) for a TRANSLUCENT block with
            per-face constant metallicity and byte-exact per-texel alpha
            (the glass class) — the kernel reconstructs alpha as byte/255
            in f32 exactly like the asset loader, the same gate
            set_instances applies to instance textures."""
            mets, words6 = [], []
            for f in range(6):
                m = t.metallicity[b * 6 + f]
                if float(m.max()) != float(m.min()):
                    return None
                mets.append(float(m.flat[0]))
                a_f32 = t.reflectivity[b * 6 + f][..., 3].astype(np.float32)
                if not (np.all(a_f32 >= 0.0) and np.all(a_f32 <= 1.0)):
                    return None
                ab = np.round(
                    a_f32.astype(np.float64) * 255.0
                ).astype(np.uint32).ravel()
                if not np.array_equal(
                    ab.astype(np.float32) / np.float32(255.0), a_f32.ravel()
                ):
                    return None
                words6.append(tuple(
                    int(ab[4 * w] | (ab[4 * w + 1] << 8)
                        | (ab[4 * w + 2] << 16) | (ab[4 * w + 3] << 24))
                    for w in range(64)
                ))
            return tuple(mets), tuple(words6)

        edits_lambert = True
        edit_mats = {}
        edit_glass = {}
        edits_fused = True
        for b in set(self._proc_diff.values()):
            if b == t.air or b in self._lambert_blocks:
                continue
            edits_lambert = False
            if bool(t.translucent[b]):
                gl = _glass_class(b)
                if gl is None:
                    edits_fused = False
                else:
                    edit_glass[int(b)] = gl
            else:
                mats = _const_opaque(b)
                if mats is None:
                    edits_fused = False
                else:
                    edit_mats[int(b)] = mats
        self.proc_static = ps0._replace(
            n_edits=cap,
            edits_lambert=edits_lambert,
            edits_fused=edits_fused,
            edit_mats=tuple(sorted(edit_mats.items())),
            edit_glass=tuple(
                (b, m, w) for b, (m, w) in sorted(edit_glass.items())
            ),
            lambert_blocks=self._lambert_blocks if cap else (),
        )
        self.proc_arrays = {
            "coarse": jnp.asarray(coarse_np),
        }
        if cap:
            # per-coarse-block tight boxes of the edit set: the kernels'
            # per-chunk edit gate tests lanes against these (inflated by
            # chunk reach) instead of one global AABB — a camera looking
            # AT a build would otherwise gate most view-center chunks ON
            # (round-5 on-chip: global AABB left edits256 at 41% of the
            # headline rate). Host-side (cells are host-known); pow2 pad
            # rows are impossible boxes (lo > hi)
            groups: dict = {}
            for i, (c, b) in enumerate(sorted(self._proc_diff.items())):
                groups.setdefault(
                    (c[0] >> 3, c[1] >> 3, c[2] >> 3), []
                ).append(c)
            nb = len(groups)
            cb_cap = max(4, 1 << max(0, (nb - 1)).bit_length()) if nb else 4
            big = 1 << 20
            cboxes = np.full((cb_cap, 6), big, np.int32)
            cboxes[:, 1::2] = -big
            for i, cells_g in enumerate(groups.values()):
                a = np.asarray(cells_g, np.int64)
                cboxes[i] = [a[:, 0].min(), a[:, 0].max(),
                             a[:, 1].min(), a[:, 1].max(),
                             a[:, 2].min(), a[:, 2].max()]
            self.proc_arrays.update(
                edit_cells=jnp.asarray(cells),
                edit_blocks=jnp.asarray(blocks),
                edit_solid=jnp.asarray(solidv),
                edit_translucent=jnp.asarray(transl),
                edit_cboxes=jnp.asarray(cboxes),
            )

    # ------------------------------------------------------------------
    # light structure
    # ------------------------------------------------------------------

    def _set_instance_lights(self, tri: np.ndarray, lpa: np.ndarray,
                             uv: np.ndarray, tex: np.ndarray) -> None:
        """Adopt the instance set's emissive triangles; rebuild the light
        BVH only when they actually changed (a moving non-emissive entity —
        the common case, quirk Q5 — never triggers a rebuild)."""
        if (
            tri.shape == self._inst_light_tri.shape
            and np.array_equal(tri, self._inst_light_tri)
            and np.array_equal(lpa, self._inst_light_lpa)
            # uv/tex feed the split-NEE direct-term emission fetch: equal
            # geometry with a retextured emissive face still needs a rebuild
            and np.array_equal(uv, self._inst_light_uv)
            and np.array_equal(tex, self._inst_light_tex)
        ):
            return
        self._inst_light_tri = np.ascontiguousarray(tri, np.float32)
        self._inst_light_lpa = np.ascontiguousarray(lpa, np.float32)
        self._inst_light_uv = np.ascontiguousarray(uv, np.float32)
        self._inst_light_tex = np.ascontiguousarray(tex, np.int32)
        self._rebuild_lights()

    def _rebuild_lights(self):
        tris, lpa, uv, tex = lb.emissive_lights(self._grid_np, self.table)
        if len(self._inst_light_tri):
            # grid lights + instance lights in one tree (the reference keeps
            # per-object BL BVHs under a TL BVH, scene.rs:260-308; one flat
            # tree has identical traversal semantics for our single grid)
            tris = np.concatenate([tris, self._inst_light_tri])
            lpa = np.concatenate([lpa, self._inst_light_lpa])
            uv = np.concatenate([uv, self._inst_light_uv])
            tex = np.concatenate([tex, self._inst_light_tex])
        self.light_bvh = lb.build_light_bvh(tris, lpa, uv=uv, tex=tex)
        self.bvh_device = device_bvh(self.light_bvh)
        # pow2 depth bucket: bvh_max_depth keys the jit caches, and edits
        # that add/remove lamps jitter the exact tree depth by +-1 — each
        # distinct value would force a full recompile (minutes through the
        # TPU tunnel). The masked descent (ops/nee.traverse) is no-op past
        # a lane's leaf, so over-provisioning the loop bound is
        # result-identical; bucketing bounds the specializations.
        d = max(1, self.light_bvh.max_depth)
        self.bvh_max_depth = 1 << (d - 1).bit_length()
        if self.bvh_device is not None and 0 < len(tris) <= self.FLAT_LIGHT_CAP:
            # flat light list for ops/nee.sample_light_flat (split NEE at
            # game scale: brute-force importance beats the descent on TPU,
            # like ops/instances vs the TLAS). Padded to a pow2 bucket for
            # jit shape stability; pad rows have power 0 -> never sampled.
            L = len(tris)
            cap = max(4, 1 << (L - 1).bit_length())
            pad = cap - L
            areas = 0.5 * np.linalg.norm(
                np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]),
                axis=1,
            ).astype(np.float32)
            self.bvh_device["flat"] = {
                "tri": jnp.asarray(np.pad(
                    tris.astype(np.float32), ((0, pad), (0, 0), (0, 0))
                )),
                "power": jnp.asarray(np.pad(
                    (lpa.astype(np.float32) * areas), (0, pad)
                )),
                "area": jnp.asarray(np.pad(areas, (0, pad))),
                "uv": jnp.asarray(np.pad(
                    uv.astype(np.float32), ((0, pad), (0, 0), (0, 0))
                )),
                "tex": jnp.asarray(np.pad(tex.astype(np.int32), (0, pad))),
            }
        # static texture-id set reachable by light samples, grouped by
        # atlas content (tex_dedup): routes the split-NEE emission fetch
        # through the exact one-hot MXU matmul with the smallest K
        if len(tex):
            groups: dict = {}
            for tid in sorted({int(x) for x in tex}):
                canon = (
                    self.tex_dedup[tid]
                    if tid < len(self.tex_dedup) else tid
                )
                groups.setdefault(canon, []).append(tid)
            self.light_tex_set = tuple(
                tuple(g) for _, g in sorted(groups.items())
            )
        else:
            self.light_tex_set = None
        # static emissive palettes per light-texture group: the in-kernel-
        # radiance retire path computes the NEE emission texel via a
        # constant select tree instead of an XLA row gather. The shipped
        # lamp textures have ~30 unique emissive texel values; any group
        # over the 32-entry cap disables the palettes (ikr then falls
        # back to the record-replay path). Texel index packing matches
        # shade._fetch_atlas (row-major ty*16+tx over the 16x16 image).
        self.light_em = None
        if self.light_tex_set is not None:
            tabs = []
            for group in self.light_tex_set:
                em = self.table.emissivity[group[0]].reshape(
                    -1, 3).astype(np.float32)
                pal, inv = np.unique(em, axis=0, return_inverse=True)
                if len(pal) > 32 or em.shape[0] != 256:
                    tabs = None
                    break
                words = np.zeros(64, np.uint32)
                for i, v in enumerate(inv.ravel()):
                    words[i >> 2] |= np.uint32(v) << np.uint32(8 * (i & 3))
                tabs.append((
                    tuple(int(t) for t in group),
                    tuple(int(w) for w in words),
                    tuple((float(r), float(g), float(b)) for r, g, b in pal),
                ))
            if tabs:
                self.light_em = tuple(tabs)

    def _edit_touches_lights(self, cell: np.ndarray, old: int, new: int) -> bool:
        if old in self._emissive_blocks or new in self._emissive_blocks:
            return True
        # neighbouring an emissive block changes its face set
        grid_np = self._grid_np
        size = np.asarray(grid_np.shape)
        for off in chunklib.FACE_NEIGHBOR:
            nb = cell + off
            if ((nb >= 0) & (nb < size)).all() and grid_np[tuple(nb)] in self._emissive_blocks:
                return True
        return False

    # ------------------------------------------------------------------
    # world edits (block.rs semantics; ids include air)
    # ------------------------------------------------------------------

    def get_block(self, global_coords) -> Optional[int]:
        cell = np.asarray(global_coords) - self.origin.astype(np.int64)
        size = np.asarray(self.grid.shape)
        if ((cell < 0) | (cell >= size)).any():
            return None
        return int(self._grid_np[tuple(cell)])

    @property
    def grid_host(self) -> np.ndarray:
        """Host mirror of the block grid — use this for per-frame host-side
        queries (physics, picking): reading `scene.grid` pulls the whole
        device array through the TPU tunnel (~100 ms for 2 MB)."""
        return self._grid_np

    def set_grid(self, grid: np.ndarray, origin) -> None:
        """Replace the whole window (streaming-world recenter): new block
        array + world origin, with every derived structure rebuilt once."""
        old_origin = self.origin
        self.grid = jnp.asarray(grid, jnp.uint8)
        self._grid_np = np.array(grid, dtype=np.uint8)
        self.origin = np.asarray(origin, np.float32)
        self.world_cfg = self.world_cfg.replace(
            origin=tuple(int(x) for x in origin)
        )
        # entity instances are stored grid-LOCAL (scene_manager uploads
        # world - origin): a recenter shifts the frame, so translate the
        # uploaded triangles and the instance-light set by the origin
        # delta — exact (pure translation), no re-upload needed
        delta = (old_origin - self.origin).astype(np.float32)
        if delta.any():
            if self.instances_device is not None:
                self.instances_device = {
                    **self.instances_device,
                    "tri": self.instances_device["tri"] + jnp.asarray(delta),
                }
            if len(self._inst_light_tri):
                self._inst_light_tri = self._inst_light_tri + delta
        self.tlas_rebuilds += 1
        self._rebuild_dist()
        self._rebuild_lights()
        self._sync_proc()

    def set_block(self, global_coords, block_id: int) -> bool:
        """Functional grid edit; returns False if outside the world."""
        cell = np.asarray(global_coords, np.int64) - self.origin.astype(np.int64)
        size = np.asarray(self.grid.shape)
        if ((cell < 0) | (cell >= size)).any():
            return False
        old = int(self._grid_np[tuple(cell)])
        touches = self._edit_touches_lights(cell, old, block_id)
        self.grid = _set_cell(self.grid, jnp.asarray(cell, jnp.int32), jnp.uint8(block_id))
        self._grid_np[tuple(cell)] = block_id
        self.tlas_rebuilds += 1
        # incremental derived-structure update: a single-cell edit only
        # moves the distance field within chebyshev radius cap of the cell
        # (ops/dda.update_distance_field; exact vs the full rebuild), and
        # the row repack is elementwise — vs the reference's re-mesh +
        # BLAS/TLAS rebuild chain (chunk_manager.rs:331-392)
        old_renders = old != self.table.air
        new_renders = block_id != self.table.air
        if old_renders != new_renders:
            from vrv_tpu.ops.dda import update_distance_field

            self.dist = update_distance_field(
                self.dist, self.grid, cell, became_solid=new_renders,
                air_id=int(self.table.air),
            )
            self._repack_rows()
        elif old != block_id:
            # renderability unchanged (e.g. stone -> lamp): dist is
            # untouched, but the packed row words carry block ids
            self._repack_rows()
        if touches:
            self._rebuild_lights()
        self._sync_proc_edit(cell)
        return True

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------

    def camera_to_local(self, eye) -> jnp.ndarray:
        return jnp.asarray(np.asarray(eye, np.float32) - self.origin)

    def _proc_for(self, cfg: RenderConfig):
        """(proc_static, proc_arrays) when cfg wants — and the scene can
        back — the procedural tracer; (None, None) otherwise (the render
        path then falls to the grid tracers)."""
        if cfg.tracer == "proc" and self.proc_static is not None:
            return self.proc_static, self.proc_arrays
        return None, None

    def render(self, eye, front, right, up, frame: int, cfg: RenderConfig) -> jax.Array:
        """One frame -> (H, W, 4) u8 BGRA on device."""
        ps, pa = self._proc_for(cfg)
        fn = _jit_render(cfg, self.bvh_max_depth, self.bvh_device is not None, ps,
                         self.light_tex_set, self.inst_static,
                         self.light_em)
        return fn(
            self.grid,
            self.translucent,
            self.materials,
            self.bvh_device,
            self.dist,
            self.instances_device,
            self.rows,
            pa,
            self.camera_to_local(eye),
            jnp.asarray(front, jnp.float32),
            jnp.asarray(right, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.uint32(frame),
        )

    def render_sharded(self, mesh, eye, front, right, up, frame: int,
                       cfg: RenderConfig) -> jax.Array:
        """One frame across a ('samples' x 'rows') device mesh -> (H, W, 4)
        u8 BGRA. Same tracer dispatch as render() per shard (incl. the
        procedural bundle); the only steady-state collective is the
        sample-merge psum (parallel/render_pjit.py)."""
        from vrv_tpu.parallel.render_pjit import jit_render_sharded

        ps, pa = self._proc_for(cfg)
        fn = jit_render_sharded(mesh, cfg, self.bvh_max_depth,
                                self.bvh_device is not None, ps,
                                self.light_tex_set, self.inst_static,
                                self.light_em)
        return fn(
            self.grid,
            self.translucent,
            self.materials,
            self.bvh_device,
            self.dist,
            self.instances_device,
            self.rows,
            pa,
            self.camera_to_local(eye),
            jnp.asarray(front, jnp.float32),
            jnp.asarray(right, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.uint32(frame),
        )

    def render_converged(self, eye, front, right, up, frame: int, chunks: int,
                         cfg: RenderConfig) -> jax.Array:
        """One converged frame (`chunks` accumulated sample passes) in ONE
        dispatch -> (H, W, 4) u8 BGRA.

        The host-loop formulation (bench.py run_chunks, app --progressive)
        issues `chunks` separate jit dispatches per frame; at the
        reference's converged setting (128 spp, README.md:8-9) that is 128
        round-trips of per-dispatch overhead. Here a `lax.fori_loop` runs
        the same per-pass body on device — compiled ONCE, not unrolled —
        accumulating radiance in the identical order (acc starts at zero;
        0.0 + x == x for the non-negative radiance domain), so the packed
        frame is bit-identical to the host loop (tests/test_converged.py).
        Pass ids are frame*chunks + i, matching the host loop's reseeding.
        """
        ps, pa = self._proc_for(cfg)
        fn = _jit_render_converged(cfg, int(chunks), self.bvh_max_depth,
                                   self.bvh_device is not None, ps,
                                   self.light_tex_set, self.inst_static,
                                   self.light_em)
        return fn(
            self.grid,
            self.translucent,
            self.materials,
            self.bvh_device,
            self.dist,
            self.instances_device,
            self.rows,
            pa,
            self.camera_to_local(eye),
            jnp.asarray(front, jnp.float32),
            jnp.asarray(right, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.uint32(frame * chunks),
        )

    def render_converged_sharded(self, mesh, eye, front, right, up,
                                 frame: int, chunks: int,
                                 cfg: RenderConfig) -> jax.Array:
        """Converged frame with the pass axis sharded over the mesh: each
        device accumulates chunks/n_devices passes in a local fori_loop
        and the only collective is one radiance psum (render_pjit)."""
        from vrv_tpu.parallel.render_pjit import jit_render_converged_sharded

        ps, pa = self._proc_for(cfg)
        fn = jit_render_converged_sharded(
            mesh, int(chunks), cfg, self.bvh_max_depth,
            self.bvh_device is not None, ps, self.light_tex_set,
            self.inst_static, self.light_em,
        )
        return fn(
            self.grid,
            self.translucent,
            self.materials,
            self.bvh_device,
            self.dist,
            self.instances_device,
            self.rows,
            pa,
            self.camera_to_local(eye),
            jnp.asarray(front, jnp.float32),
            jnp.asarray(right, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.uint32(frame * chunks),
        )

    def render_samples(self, eye, front, right, up, frame: int, cfg: RenderConfig) -> jax.Array:
        ps, pa = self._proc_for(cfg)
        fn = _jit_render_samples(cfg, self.bvh_max_depth, self.bvh_device is not None,
                                 ps, self.light_tex_set, self.inst_static,
                                 self.light_em)
        return fn(
            self.grid,
            self.translucent,
            self.materials,
            self.bvh_device,
            self.dist,
            self.instances_device,
            self.rows,
            pa,
            self.camera_to_local(eye),
            jnp.asarray(front, jnp.float32),
            jnp.asarray(right, jnp.float32),
            jnp.asarray(up, jnp.float32),
            jnp.uint32(frame),
        )


import contextlib


@contextlib.contextmanager
def _rng_mode(mode: str):
    from vrv_tpu.ops import rng as _rng

    prev = _rng.MODE
    _rng.MODE = mode
    try:
        yield
    finally:
        _rng.MODE = prev


@functools.lru_cache(maxsize=64)
def _jit_render(cfg: RenderConfig, bvh_max_depth: int, has_lights: bool,
                proc_static=None, light_tex_set=None, inst_static=None,
                light_em=None):
    def fn(grid, translucent, materials, bvh, dist, inst, rows, proc,
           eye, front, right, up, frame):
        with _rng_mode(cfg.rng):
            return _fn_inner(grid, translucent, materials, bvh, dist, inst, rows,
                             proc, eye, front, right, up, frame)

    def _fn_inner(grid, translucent, materials, bvh, dist, inst, rows, proc,
                  eye, front, right, up, frame):
        if cfg.mode == "wavefront_compact":
            from vrv_tpu.render import wavefront

            return wavefront.render_frame_wavefront(
                grid, translucent, materials, bvh if has_lights else None,
                bvh_max_depth, dist, inst, rows, eye, front, right, up, frame, cfg,
                proc_static=proc_static, proc=proc,
            )
        if cfg.mode == "wavefront":
            from vrv_tpu.render import wavefront

            return wavefront.render_frame_wavefront_fused(
                grid, translucent, materials, bvh if has_lights else None,
                bvh_max_depth, dist, inst, rows, eye, front, right, up, frame, cfg,
                proc_static=proc_static, proc=proc,
                light_tex_set=light_tex_set, inst_static=inst_static,
                light_em=light_em,
            )
        return megakernel.render_frame(
            grid, translucent, materials, bvh if has_lights else None,
            bvh_max_depth, dist, inst, rows, eye, front, right, up, frame, cfg,
            proc_static=proc_static, proc=proc, light_tex_set=light_tex_set,
            inst_static=inst_static, light_em=light_em,
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jit_render_samples(cfg: RenderConfig, bvh_max_depth: int, has_lights: bool,
                        proc_static=None, light_tex_set=None, inst_static=None,
                        light_em=None):
    def fn(grid, translucent, materials, bvh, dist, inst, rows, proc,
           eye, front, right, up, frame):
        with _rng_mode(cfg.rng):
            return megakernel.render_samples(
                grid, translucent, materials, bvh if has_lights else None,
                bvh_max_depth, dist, inst, rows, eye, front, right, up, frame, cfg,
                proc_static=proc_static, proc=proc, light_tex_set=light_tex_set,
                inst_static=inst_static, light_em=light_em,
            )

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _jit_render_converged(cfg: RenderConfig, chunks: int, bvh_max_depth: int,
                          has_lights: bool, proc_static=None,
                          light_tex_set=None, inst_static=None,
                          light_em=None):
    def fn(grid, translucent, materials, bvh, dist, inst, rows, proc,
           eye, front, right, up, frame0):
        def body(i, acc):
            with _rng_mode(cfg.rng):
                smp = megakernel.render_samples(
                    grid, translucent, materials,
                    bvh if has_lights else None, bvh_max_depth, dist, inst,
                    rows, eye, front, right, up, frame0 + jnp.uint32(i), cfg,
                    proc_static=proc_static, proc=proc,
                    light_tex_set=light_tex_set, inst_static=inst_static,
                    light_em=light_em,
                )
            return acc + smp.sum(axis=0)

        acc = jax.lax.fori_loop(
            0, chunks, body,
            jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
        )
        return megakernel.pack_bgra(acc / (chunks * cfg.samples_per_pixel))

    return jax.jit(fn)
