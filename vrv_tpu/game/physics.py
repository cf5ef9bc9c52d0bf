"""Voxel-aware rigid-body kinematics.

Replaces the reference's rapier3d pipeline (reference
src/game_system/physics_manager.rs) with a purpose-built integrator: the
only colliders in the game are axis-aligned boxes (the ego cube) against
static voxel terrain, so a swept-AABB-vs-grid solver reproduces the
observable behavior without a general physics engine:

  - gravity (0, -9.81, 0) (physics_manager.rs:192,257); the camera's
    world-up being (0,-1,0) (quirk Q6) is a separate convention — gravity
    numbers are preserved exactly.
  - hover controller for controlled dynamic bodies: shape-cast down 1.0,
    grounded < 0.05, anti-clip lift < 0.025, velocity adjustments
    (physics_manager.rs:163-188, 209-253).
  - rotation locked to Y (rigid bodies built with
    enabled_rotations(false, true, false), physics_manager.rs:102).
  - kinematic velocity-based bodies integrate velocity without collision
    response (rapier semantics); dynamic bodies collide with terrain via
    axis-separated swept AABB clamping.
  - per-step diffs emitted as GlobalEntityUpdate* changes
    (physics_manager.rs:320-361).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from vrv_tpu.config import SimConfig
from vrv_tpu.game.manager import Manager, UpdateData
from vrv_tpu.game.world import (
    DYNAMIC,
    KINEMATIC_VELOCITY,
    GlobalEntityAdd,
    GlobalEntityRemove,
    GlobalEntityUpdateGroundedness,
    GlobalEntityUpdateIsometry,
    GlobalEntityUpdateVelocity,
    Isometry,
    PhysicsApplyImpulse,
    PhysicsSetVelocity,
    quat_from_yaw,
    quat_mul,
)
from vrv_tpu.render.scene import Scene


@dataclasses.dataclass
class _Body:
    body_type: str
    half_extents: np.ndarray
    position: np.ndarray
    rotation: np.ndarray          # quaternion (w,x,y,z); only yaw integrates
    linvel: np.ndarray
    angvel: np.ndarray
    mass: float
    inertia_y: float
    controlled: bool
    grounded: bool
    clipping: bool


class VoxelCollider:
    """AABB-vs-voxel-grid queries against a Scene."""

    def __init__(self, scene: Scene):
        self.scene = scene

    def _solid_in_box(self, lo: np.ndarray, hi: np.ndarray) -> bool:
        """Any solid voxel overlapping the world-space AABB [lo, hi]."""
        # host mirror: this runs per frame per body — reading scene.grid
        # would pull the whole device array through the TPU tunnel
        grid = self.scene.grid_host
        origin = self.scene.origin
        solid = self.scene.table.solid
        c_lo = np.floor(lo - origin).astype(np.int64)
        c_hi = np.floor(hi - origin - 1e-9).astype(np.int64)
        size = np.asarray(grid.shape)
        c_lo_c = np.maximum(c_lo, 0)
        c_hi_c = np.minimum(c_hi, size - 1)
        if (c_lo_c > c_hi_c).any():
            return False
        sub = grid[
            c_lo_c[0]: c_hi_c[0] + 1,
            c_lo_c[1]: c_hi_c[1] + 1,
            c_lo_c[2]: c_hi_c[2] + 1,
        ]
        return bool(solid[sub].any())

    def cast_down(self, position: np.ndarray, half: np.ndarray, max_distance: float):
        """Distance the AABB can move along -y before touching solid terrain.

        Equivalent of the rapier shape cast in physics_manager.rs:163-188.
        Returns (distance, hit). Penetrating placements return 0.
        """
        lo = position - half
        hi = position + half
        origin = self.scene.origin
        grid = self.scene.grid_host
        solid = self.scene.table.solid
        size = np.asarray(grid.shape)

        # columns under the footprint
        x0 = int(np.floor(lo[0] - origin[0]))
        x1 = int(np.floor(hi[0] - origin[0] - 1e-9))
        z0 = int(np.floor(lo[2] - origin[2]))
        z1 = int(np.floor(hi[2] - origin[2] - 1e-9))
        y_bottom = lo[1] - origin[1]

        best = max_distance
        hit = False
        y_hi = int(np.floor(y_bottom))           # first cell below the bottom face
        y_lo = int(np.floor(y_bottom - max_distance))
        for cx in range(max(x0, 0), min(x1, size[0] - 1) + 1):
            for cz in range(max(z0, 0), min(z1, size[2] - 1) + 1):
                for cy in range(min(y_hi, size[1] - 1), max(y_lo, 0) - 1, -1):
                    if solid[grid[cx, cy, cz]]:
                        d = y_bottom - (cy + 1)
                        if d < -1e-6:
                            # already penetrating this column's surface: check
                            # actual overlap before reporting
                            if cy + 1 > y_bottom and self._solid_in_box(lo, hi):
                                return 0.0, True
                        d = max(d, 0.0)
                        if d < best:
                            best = d
                            hit = True
                        break
        return (best, hit) if hit else (max_distance, False)

    def move(self, position: np.ndarray, half: np.ndarray, delta: np.ndarray):
        """Axis-separated swept move with clamping (dynamic bodies).

        Returns (new_position, blocked_mask). The per-axis travel is
        substepped so consecutive tested AABBs overlap across any 1-cell
        wall (substep <= 2*half + 0.5): a destination-only test would let
        a large impulse (|delta| > 2*half + 1) tunnel through thin
        geometry. Typical frame deltas (v*dt ~ 0.17) take one substep, so
        the common path is unchanged.
        """
        pos = position.astype(np.float64).copy()
        blocked = np.zeros(3, bool)
        for axis in range(3):
            d = float(delta[axis])
            if d == 0.0:
                continue
            max_sub = 2.0 * float(half[axis]) + 0.5
            n_sub = max(1, int(np.ceil(abs(d) / max_sub)))
            sub_d = d / n_sub
            for _ in range(n_sub):
                trial = pos.copy()
                trial[axis] += sub_d
                if not self._solid_in_box(trial - half, trial + half):
                    pos = trial
                    continue
                # binary search the largest non-colliding travel
                lo_t, hi_t = 0.0, 1.0
                for _ in range(20):
                    mid = 0.5 * (lo_t + hi_t)
                    trial[axis] = pos[axis] + sub_d * mid
                    if self._solid_in_box(trial - half, trial + half):
                        hi_t = mid
                    else:
                        lo_t = mid
                pos[axis] += sub_d * lo_t
                blocked[axis] = True
                break
        return pos, blocked


class PhysicsManager(Manager):
    """physics_manager.rs:274-363 protocol over the voxel solver."""

    def __init__(self, scene: Scene, cfg: Optional[SimConfig] = None):
        self.cfg = cfg or SimConfig()
        self.collider = VoxelCollider(scene)
        self.bodies: Dict[int, _Body] = {}

    # -- entity lifecycle (physics_manager.rs:74-138) --

    def _add_entity(self, entity_id: int, data) -> None:
        phys = data.physics
        if phys is None:
            return
        self.bodies[entity_id] = _Body(
            body_type=phys.rigid_body_type,
            half_extents=phys.hitbox.half_extents.astype(np.float64),
            position=data.isometry.translation.astype(np.float64).copy(),
            rotation=data.isometry.rotation.astype(np.float64).copy(),
            linvel=phys.linvel.astype(np.float64).copy(),
            angvel=phys.angvel.astype(np.float64).copy(),
            mass=phys.hitbox.mass,
            inertia_y=phys.hitbox.principal_inertia_y,
            controlled=phys.controlled,
            grounded=phys.grounded,
            clipping=False,
        )

    def update(self, data: UpdateData) -> List[object]:
        cfg = self.cfg
        for ch in data.world_changes:
            if isinstance(ch, GlobalEntityAdd):
                self._add_entity(ch.id, ch.data)
            elif isinstance(ch, GlobalEntityRemove):
                self.bodies.pop(ch.id, None)
            elif isinstance(ch, PhysicsSetVelocity):
                b = self.bodies.get(ch.id)
                if b:
                    b.linvel = np.asarray(ch.linvel, np.float64).copy()
                    b.angvel = np.asarray(ch.angvel, np.float64).copy()
            elif isinstance(ch, PhysicsApplyImpulse):
                b = self.bodies.get(ch.id)
                if b and b.body_type == DYNAMIC:
                    b.linvel += np.asarray(ch.impulse, np.float64) / b.mass
                    b.angvel[1] += float(ch.torque_impulse[1]) / b.inertia_y

        # hover controller (physics_manager.rs:190-253)
        for b in self.bodies.values():
            if not (b.controlled and b.body_type == DYNAMIC):
                continue
            dist, clipping = self.collider.cast_down(
                b.position, b.half_extents, cfg.hover_cast_distance
            )
            ground_just_below = dist < cfg.grounded_threshold
            intersecting = dist < cfg.clip_threshold
            b.grounded = ground_just_below
            b.clipping = clipping
            if intersecting:
                if b.linvel[1] < 0.05:
                    b.linvel[1] = -cfg.dt * cfg.gravity_y + (cfg.clip_threshold - dist)
            elif ground_just_below:
                if b.linvel[1] < 0.0:
                    b.linvel[1] = -cfg.dt * cfg.gravity_y

        # integrate
        for b in self.bodies.values():
            if b.body_type == DYNAMIC:
                b.linvel[1] += cfg.gravity_y * cfg.dt
                new_pos, blocked = self.collider.move(
                    b.position, b.half_extents, b.linvel * cfg.dt
                )
                b.position = new_pos
                b.linvel[blocked] = 0.0
            elif b.body_type == KINEMATIC_VELOCITY:
                b.position = b.position + b.linvel * cfg.dt
            else:
                continue
            # rotation locked to Y
            if b.angvel[1] != 0.0:
                b.rotation = quat_mul(quat_from_yaw(b.angvel[1] * cfg.dt), b.rotation)

        # emit diffs (physics_manager.rs:320-361)
        changes: List[object] = []
        for bid, b in self.bodies.items():
            e = data.entities.get(bid)
            if e is None:
                continue
            new_iso = Isometry(b.position.copy(), b.rotation.copy())
            if not (e.isometry == new_iso):
                changes.append(GlobalEntityUpdateIsometry(bid, new_iso))
            if e.physics_data is not None:
                if not (
                    np.array_equal(e.physics_data.linvel, b.linvel)
                    and np.array_equal(e.physics_data.angvel, b.angvel)
                ):
                    changes.append(
                        GlobalEntityUpdateVelocity(bid, b.linvel.copy(), b.angvel.copy())
                    )
                should_be_grounded = b.grounded and not b.clipping
                if e.physics_data.grounded != should_be_grounded:
                    changes.append(GlobalEntityUpdateGroundedness(bid, should_be_grounded))
        return changes
