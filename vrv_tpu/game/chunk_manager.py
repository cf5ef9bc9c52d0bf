"""Chunk lifecycle + world queries.

Mirrors reference src/game_system/chunk_manager.rs re-targeted at the
dense-grid scene:

  - chunk record state machine with load radius 6 / unload radius 8 around
    the ego's chunk (chunk_manager.rs:30-37, 97-119, 158-163)
  - generation scheduling: the reference spawns worker threads per chunk
    (:202-253); here generation is a batched jit worldgen call per chunk,
    budgeted per frame to keep the loop smooth (TPU-side there is no
    meshing step at all — generated blocks are written straight into the
    scene grid where they overlap its window)
  - set_block with copy-then-swap edit + neighbor re-dirtying semantics
    (:331-392), applied through WorldSetBlock changes
  - trace_to_solid: the 0.01-step ray march used for block picking
    (:394-443), plus an exact-DDA variant (documented delta, quirk Q8)
  - ChunkQuerier read facade (:447-472)
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np

from vrv_tpu.game import chunk as chunklib
from vrv_tpu.game.manager import Manager, UpdateData
from vrv_tpu.game.world import WorldSetBlock
from vrv_tpu.render.scene import Scene

FACE_LEFT, FACE_RIGHT, FACE_DOWN, FACE_UP, FACE_BACK, FACE_FRONT = range(6)


@dataclasses.dataclass
class ChunkRecord:
    """chunk_manager.rs:39-51 (timestamps become monotonically increasing ticks)."""

    data: Optional[np.ndarray] = None
    data_started_generating: Optional[int] = None
    data_set_at: Optional[int] = None
    synced_at: Optional[int] = None   # analog of mesh_set_at for grid sync


class ChunkQuerier:
    """Read facade (chunk_manager.rs:447-472) over the scene grid."""

    def __init__(self, scene: Scene):
        self.scene = scene

    def get_block(self, global_coords) -> Optional[int]:
        return self.scene.get_block(global_coords)

    def get_block_float(self, global_coords) -> Optional[int]:
        return self.get_block(chunklib.floor_coords(global_coords))

    def trace_to_solid(
        self, origin, direction, radius: float, exact: bool = False
    ) -> Optional[Tuple[np.ndarray, int]]:
        """Find the first solid block along a ray; returns (coords, face).

        Default reproduces the reference's 0.01-step march
        (chunk_manager.rs:394-443) including its corner-skipping behavior;
        exact=True uses a proper DDA (quirk Q8 delta, opt-in).
        """
        if exact:
            return self._trace_dda(origin, direction, radius)
        from vrv_tpu import native

        if native.lib is not None:
            return native.trace_to_solid(
                self.scene.grid_host, self.scene.origin,
                self.scene.table.solid, origin, direction, radius,
            )
        step = 0.01
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d) * step
        solid = self.scene.table.solid

        loc = o.copy()
        loc_q = chunklib.floor_coords(loc)
        while True:
            while (loc_q == chunklib.floor_coords(loc)).all():
                loc += d
                if ((loc - o) ** 2).sum() > radius * radius:
                    return None
            last_q = chunklib.floor_coords(loc - d)
            loc_q = chunklib.floor_coords(loc)
            block = self.get_block(loc_q)
            if block is None:
                return None
            if solid[block]:
                delta = loc_q - last_q
                # face truth table (chunk_manager.rs:420-434)
                if delta[0] == -1:
                    face = FACE_RIGHT
                elif delta[0] == 1:
                    face = FACE_LEFT
                elif delta[1] == -1:
                    face = FACE_UP
                elif delta[1] == 1:
                    face = FACE_DOWN
                elif delta[2] == -1:
                    face = FACE_FRONT
                elif delta[2] == 1:
                    face = FACE_BACK
                else:  # diagonal skip: the reference would panic; treat as miss
                    return None
                return loc_q, face

    def _trace_dda(self, origin, direction, radius):
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        solid = self.scene.table.solid
        cell = chunklib.floor_coords(o)
        inv = np.where(np.abs(d) < 1e-12, 1e30, 1.0 / np.where(d == 0, 1.0, d))
        t = 0.0
        while t <= radius:
            nxt = cell + (d > 0)
            t_axes = (nxt - o) * inv
            t_axes = np.where(np.abs(d) < 1e-12, 1e30, t_axes)
            axis = int(np.argmin(t_axes))
            t = float(t_axes[axis])
            if t > radius:
                return None
            step = 1 if d[axis] > 0 else -1
            cell = cell.copy()
            cell[axis] += step
            block = self.get_block(cell)
            if block is None:
                return None
            if solid[block]:
                face = axis * 2 + (0 if step > 0 else 1)
                return cell, face
        return None


class ChunkManager(Manager):
    """chunk_manager.rs:474-547 over the dense-grid scene."""

    def __init__(
        self,
        scene: Scene,
        generate: bool = False,
        budget_per_frame: int = 4,
    ):
        self.scene = scene
        self.generate = generate  # dense grid is pre-generated; streaming opt-in
        self.budget = budget_per_frame
        self.center_chunk = np.zeros(3, np.int64)
        self.chunks: Dict[Tuple[int, int, int], ChunkRecord] = {}
        # edits into not-yet-generated chunks, replayed at generation time
        self._pending_edits: Dict[Tuple[int, int, int], List] = {}
        self.tick = 0
        self.cfg = scene.world_cfg
        self._assembled_at = -1
        if self.generate:
            # seed the streaming window from the scene's pre-generated grid
            self._adopt_scene_grid()
            cc, _ = chunklib.global_to_chunk_coords(
                chunklib.floor_coords(
                    self.scene.origin + np.asarray(self.scene.grid.shape) / 2
                )
            )
            self.set_center_chunk(cc)

    def _adopt_scene_grid(self) -> None:
        """Split the scene's dense grid into chunk records (so worldgen isn't
        recomputed for already-materialized blocks, preserving edits)."""
        grid = self.scene.grid_host
        org = self.scene.origin.astype(np.int64)
        cs = np.asarray(chunklib.CHUNK_SHAPE, np.int64)
        if (org % cs != 0).any() or (np.asarray(grid.shape) % cs != 0).any():
            return  # window not chunk-aligned; records fill lazily instead
        self.tick += 1
        n = np.asarray(grid.shape) // cs
        base_chunk = org // cs
        for ix in range(n[0]):
            for iy in range(n[1]):
                for iz in range(n[2]):
                    key = tuple(base_chunk + np.array([ix, iy, iz]))
                    rec = ChunkRecord(
                        data=grid[
                            ix * cs[0]: (ix + 1) * cs[0],
                            iy * cs[1]: (iy + 1) * cs[1],
                            iz * cs[2]: (iz + 1) * cs[2],
                        ].copy(),
                    )
                    rec.data_started_generating = self.tick
                    rec.data_set_at = self.tick
                    rec.synced_at = self.tick
                    self.chunks[key] = rec

    # -- state machine (chunk_manager.rs:97-163) --

    def set_center_chunk(self, chunk_position) -> None:
        self.center_chunk = np.asarray(chunk_position, np.int64)
        r = self.cfg.min_render_radius
        for off in itertools.product(range(-r, r + 1), repeat=3):
            key = tuple(self.center_chunk + np.asarray(off))
            self.chunks.setdefault(key, ChunkRecord())

    def chunk_should_be_loaded(self, chunk_position) -> bool:
        d = np.abs(np.asarray(chunk_position) - self.center_chunk)
        return bool((d <= self.cfg.max_render_radius).all())

    def _sync_chunk_into_grid(self, key: Tuple[int, int, int],
                              rec: ChunkRecord, host: np.ndarray) -> bool:
        """Write generated chunk cells into `host` (a copy of the scene's
        dense window). Returns True when cells were written. The caller
        commits the batch through Scene.set_grid so the host mirror AND
        every derived structure (dist field, packed rows, light BVH, proc
        bundle) update together — a direct device-grid write would render
        stale acceleration structures over the new terrain."""
        cs = np.asarray(chunklib.CHUNK_SHAPE, np.int64)
        base = np.asarray(key, np.int64) * cs  # world block coords
        org = self.scene.origin.astype(np.int64)
        size = np.asarray(host.shape, np.int64)
        lo = np.maximum(base - org, 0)
        hi = np.minimum(base - org + cs, size)
        if (lo >= hi).any():
            rec.synced_at = rec.data_set_at
            return False
        src_lo = lo - (base - org)
        host[lo[0]: hi[0], lo[1]: hi[1], lo[2]: hi[2]] = rec.data[
            src_lo[0]: src_lo[0] + hi[0] - lo[0],
            src_lo[1]: src_lo[1] + hi[1] - lo[1],
            src_lo[2]: src_lo[2] + hi[2] - lo[2],
        ]
        rec.synced_at = rec.data_set_at
        return True

    def update(self, data: UpdateData) -> List[object]:
        # replay WorldSetBlock (chunk_manager.rs:516-526)
        for ch in data.world_changes:
            if isinstance(ch, WorldSetBlock):
                self.set_block(ch.global_coords, ch.block_id)

        # recenter on the ego (chunk_manager.rs:528-540)
        recentered = False
        ego = data.entities.get(data.ego_entity_id)
        if ego is not None and self.generate:
            cc, _ = chunklib.global_to_chunk_coords(
                chunklib.floor_coords(ego.isometry.translation)
            )
            if (cc != self.center_chunk).any():
                self.set_center_chunk(cc)
                recentered = True

        if self.generate:
            self._update_chunks(move_window=recentered)
        return []

    def _update_chunks(self, move_window: bool = False) -> None:
        self.tick += 1
        budget = self.budget
        for key in list(self.chunks.keys()):
            if not self.chunk_should_be_loaded(key):
                del self.chunks[key]
                continue
        # generate nearest-first (the reference generates the whole radius
        # asynchronously; budgeted synchronous generation keeps frames smooth)
        pending = [
            k for k, r in self.chunks.items()
            if r.data is None and r.data_started_generating is None
        ]
        pending.sort(key=lambda k: np.abs(np.asarray(k) - self.center_chunk).sum())
        for key in pending[: max(budget, 0)]:
            rec = self.chunks[key]
            rec.data_started_generating = self.tick
            rec.data = chunklib.generate_chunk(self.cfg, self.scene.table, key)
            # replay edits made while this chunk had no data yet (the
            # edit reached the scene grid but no record could hold it;
            # without the replay, pristine worldgen would revert it)
            pend = self._pending_edits.pop(key, ())
            if pend:
                rec.data = np.array(rec.data)  # worldgen output is read-only
                for bc, block_id in pend:
                    rec.data[tuple(bc)] = block_id
            rec.data_set_at = self.tick

        if move_window:
            self._assemble_window()
            return
        host = None
        dirty = False
        for key, rec in self.chunks.items():
            if rec.data is not None and rec.data_set_at is not None:
                if rec.synced_at is None or rec.data_set_at > rec.synced_at:
                    if host is None:
                        host = np.array(self.scene.grid_host)
                    dirty |= self._sync_chunk_into_grid(key, rec, host)
        if dirty:
            self.scene.set_grid(host, self.scene.origin)

    def _assemble_window(self) -> None:
        """Rebuild the scene's dense window centred on the current chunk
        (the streaming-world recenter: the reference's chunk load/unload,
        chunk_manager.rs:97-119, expressed as one window swap)."""
        cs = np.asarray(chunklib.CHUNK_SHAPE, np.int64)
        size = np.asarray(self.scene.grid.shape, np.int64)
        n = size // cs
        base_chunk = self.center_chunk - n // 2
        origin = base_chunk * cs
        grid = np.full(tuple(size), self.scene.table.air, np.uint8)
        for off in itertools.product(range(n[0]), range(n[1]), range(n[2])):
            key = tuple(base_chunk + np.asarray(off))
            rec = self.chunks.get(key)
            if rec is None or rec.data is None:
                continue
            ox, oy, oz = np.asarray(off) * cs
            grid[ox: ox + cs[0], oy: oy + cs[1], oz: oz + cs[2]] = rec.data
            rec.synced_at = self.tick
        self.scene.set_grid(grid, origin)

    # -- edits (chunk_manager.rs:331-392) --

    def set_block(self, global_coords, block_id: int) -> None:
        self.tick += 1
        self.scene.set_block(global_coords, block_id)
        cc, bc = chunklib.global_to_chunk_coords(np.asarray(global_coords, np.int64))
        key = tuple(cc)
        if key in self.chunks and self.chunks[key].data is not None:
            rec = self.chunks[key]
            new_data = rec.data.copy()  # copy-then-swap (chunk_manager.rs:337-340)
            new_data[tuple(bc)] = block_id
            rec.data = new_data
            rec.data_set_at = self.tick
        elif self.generate:
            # record-less chunk (pending generation): remember the edit so
            # worldgen replays it instead of reverting it
            self._pending_edits.setdefault(key, []).append(
                (tuple(int(x) for x in bc), block_id)
            )
        # neighbor re-dirtying at chunk borders (chunk_manager.rs:352-391)
        cs = np.asarray(chunklib.CHUNK_SHAPE, np.int64)
        for axis in range(3):
            for side, off in ((0, -1), (cs[axis] - 1, 1)):
                if bc[axis] == side:
                    nb = cc.copy()
                    nb[axis] += off
                    nrec = self.chunks.get(tuple(nb))
                    if nrec is not None:
                        nrec.data_set_at = self.tick
