"""Ego controls: input -> motion + block manipulation.

Mirrors reference src/game_system/ego_controls_manager.rs:

  - keys 1-9 select block ids 0-8 (:47-73); default selection 3 = mirror
    under alphabetical ordering (quirk Q7)
  - R cycles spp 1->2->4->...->64->1 (:98-112) — and unlike the reference
    (quirk Q1) the knob actually reaches the kernel
  - Tab toggles dynamic <-> kinematic body type via remove+add (:119-135)
  - kinematic: setVelocity move 10 / rotate 2 / jump 10 (:140-175);
    dynamic: mass-scaled impulses x0.3, torque x0.1, y zeroed unless
    jumping & grounded (:176-227)
  - mouse ray from screen uv (:233-241), break (left, 300 ms cooldown ->
    air) / place (right, face-adjacent, selected block) (:243-277)
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import numpy as np

from vrv_tpu.assets import BlockTable
from vrv_tpu.camera import RenderingPreferences, SphericalCamera
from vrv_tpu.config import SimConfig
from vrv_tpu.game.chunk_manager import ChunkQuerier
from vrv_tpu.game.input import UserInputState, screen_to_uv
from vrv_tpu.game.manager import Manager, UpdateData
from vrv_tpu.game.world import (
    DYNAMIC,
    KINEMATIC_VELOCITY,
    EntityCreationData,
    GlobalEntityAdd,
    GlobalEntityRemove,
    PhysicsApplyImpulse,
    PhysicsSetVelocity,
    WorldSetBlock,
    quat_inverse,
    quat_rotate,
)

# face -> adjacent offset for placement (ego_controls_manager.rs:262-269);
# ONE copy of the face-order truth table, shared with the mesher/picker
from vrv_tpu.game.chunk import FACE_NEIGHBOR as _PLACE_OFFSET

_SPP_CYCLE = {1: 2, 2: 4, 4: 8, 8: 16, 16: 32, 32: 64}  # :100-108


class EgoControlsManager(Manager):
    def __init__(
        self,
        camera: SphericalCamera,
        chunk_querier: ChunkQuerier,
        table: BlockTable,
        cfg: Optional[SimConfig] = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.camera = camera
        self.querier = chunk_querier
        self.table = table
        self.cfg = cfg or SimConfig()
        self.clock = clock
        self.input = UserInputState()
        self.selected_block_id = 3  # :43, quirk Q7
        self._last_broke = clock()
        self._last_placed = clock()

    def _update_selected_block(self, events) -> None:
        key = UserInputState.last_key_pressed(
            events, [str(i) for i in range(1, 10)]
        )
        if key is not None:
            self.selected_block_id = int(key) - 1

    def update(self, data: UpdateData) -> List[object]:
        cfg = self.cfg
        ego = data.entities.get(data.ego_entity_id)
        if ego is None or ego.physics_data is None:
            return []
        physics_data = ego.physics_data.copy()
        events = data.window_events

        self.input.handle_input(events)
        self._update_selected_block(events)

        cam = self.camera
        cam.set_root_position(ego.isometry.translation)
        cam.set_root_rotation(ego.isometry.rotation)
        cam.handle_events(data.extent, events)
        if UserInputState.key_pressed(events, "r"):
            cur = cam.rendering_preferences().samples
            cam.set_rendering_preferences(
                RenderingPreferences(samples=_SPP_CYCLE.get(cur, 1))
            )

        cam_eye, cam_front, cam_right, cam_up = cam.eye_front_right_up()
        changes: List[object] = []

        # Tab: toggle body type (:119-135)
        if UserInputState.key_pressed(events, "tab"):
            physics_data.rigid_body_type = (
                KINEMATIC_VELOCITY
                if physics_data.rigid_body_type == DYNAMIC
                else DYNAMIC
            )
            changes.append(GlobalEntityRemove(data.ego_entity_id))
            changes.append(
                GlobalEntityAdd(
                    data.ego_entity_id,
                    EntityCreationData(
                        physics=physics_data.copy(),
                        mesh=ego.mesh,
                        isometry=ego.isometry.copy(),
                    ),
                )
            )

        cur = self.input.current
        rot = ego.isometry.rotation

        if physics_data.rigid_body_type == KINEMATIC_VELOCITY:
            move, rotate, jump = (
                cfg.move_magnitude_kinematic,
                cfg.rotate_magnitude,
                cfg.jump_magnitude_kinematic,
            )
            linvel = np.zeros(3)
            angvel = np.zeros(3)
            if cur.w:
                linvel += move * np.array([1.0, 0.0, 0.0])
            if cur.s:
                linvel += move * np.array([-1.0, 0.0, 0.0])
            if cur.space:
                linvel += jump * np.array([0.0, 1.0, 0.0])
            if cur.shift:
                linvel += jump * np.array([0.0, -1.0, 0.0])
            if cur.a:
                angvel += rotate * np.array([0.0, -1.0, 0.0])
            if cur.d:
                angvel += rotate * np.array([0.0, 1.0, 0.0])
            changes.append(
                PhysicsSetVelocity(
                    data.ego_entity_id, quat_rotate(rot, linvel), angvel
                )
            )
        elif physics_data.rigid_body_type == DYNAMIC:
            move, rotate, jump = (
                cfg.move_magnitude_dynamic,
                cfg.rotate_magnitude,
                cfg.jump_magnitude_dynamic,
            )
            tx = (move if cur.w else 0.0) + (-move if cur.s else 0.0)
            ty = (jump if cur.space else 0.0) + (-jump if cur.shift else 0.0)
            ta = (-rotate if cur.a else 0.0) + (rotate if cur.d else 0.0)

            current_linvel = quat_rotate(quat_inverse(rot), physics_data.linvel)
            impulse = (
                (np.array([tx, ty, 0.0]) - current_linvel)
                * physics_data.hitbox.mass
                * 0.3
            )
            if ty == 0.0 or not physics_data.grounded:
                impulse[1] = 0.0
            torque = (
                (ta - physics_data.angvel[1])
                * physics_data.hitbox.principal_inertia_y
                * 0.1
            )
            changes.append(
                PhysicsApplyImpulse(
                    data.ego_entity_id,
                    quat_rotate(rot, impulse),
                    np.array([0.0, torque, 0.0]),
                )
            )

        # block picking + manipulation (:231-277)
        uv = screen_to_uv(cur.pos, data.extent)
        aspect = data.extent[0] / data.extent[1]
        direction = uv[0] * cam_right * aspect + uv[1] * cam_up + cam_front
        direction = direction / np.linalg.norm(direction)

        picked = self.querier.trace_to_solid(cam_eye, direction, cfg.pick_radius)
        if picked is not None:
            coords, face = picked
            now = self.clock()
            cooldown = cfg.block_edit_cooldown_ms / 1e3
            if cur.mouse_left_down and (now - self._last_broke) > cooldown:
                changes.append(WorldSetBlock(coords, self.table.air))
                self._last_broke = now
            elif cur.mouse_right_down and (now - self._last_placed) > cooldown:
                changes.append(
                    WorldSetBlock(coords + _PLACE_OFFSET[face], self.selected_block_id)
                )
                self._last_placed = now

        return changes
