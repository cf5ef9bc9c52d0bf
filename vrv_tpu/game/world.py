"""GameWorld: entity table, WorldChange event bus, per-frame step.

Mirrors reference src/game_system/game_world.rs: an entity table keyed by
u32 ids, an 8-variant WorldChange event vocabulary (game_world.rs:64-88),
manager fan-out in fixed order (:175-180), change replay into the entity
table (:194-233), then the render kick-off (:262-283).

The render half diverges by design: instead of TLAS rebuild + Vulkan
dispatch, step() calls the jit-compiled frame function on the dense-grid
Scene (render/scene.py).
"""

from __future__ import annotations

import dataclasses
import random
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from vrv_tpu.camera import SphericalCamera
from vrv_tpu.config import RenderConfig, SimConfig
from vrv_tpu.game.manager import Manager, UpdateData
from vrv_tpu.render.scene import Scene


# ---------------------------------------------------------------------------
# math pieces (nalgebra Isometry3 stand-in)
# ---------------------------------------------------------------------------


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_rotate(q, v):
    w, x, y, z = q
    u = np.array([x, y, z], dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    return 2.0 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v + 2.0 * w * np.cross(u, v)


def quat_inverse(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def quat_from_yaw(yaw: float):
    return np.array([np.cos(yaw / 2), 0.0, np.sin(yaw / 2), 0.0])


@dataclasses.dataclass
class Isometry:
    translation: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0, 0.0])
    )

    def copy(self) -> "Isometry":
        return Isometry(self.translation.copy(), self.rotation.copy())

    def __eq__(self, other) -> bool:
        return np.array_equal(self.translation, other.translation) and np.array_equal(
            self.rotation, other.rotation
        )


# ---------------------------------------------------------------------------
# entities + changes (game_world.rs:35-88)
# ---------------------------------------------------------------------------

DYNAMIC = "dynamic"
FIXED = "fixed"
KINEMATIC_VELOCITY = "kinematic_velocity"
KINEMATIC_POSITION = "kinematic_position"


@dataclasses.dataclass
class Hitbox:
    """AABB collider stand-in for rapier's Collider (cuboid half-extents)."""

    half_extents: np.ndarray

    @property
    def mass(self) -> float:
        # rapier default density 1.0 over the cuboid volume
        h = self.half_extents
        return float(8.0 * h[0] * h[1] * h[2])

    @property
    def principal_inertia_y(self) -> float:
        # solid cuboid about the y axis: m * (w^2 + d^2) / 12, w=2hx d=2hz
        h = self.half_extents
        return float(self.mass * ((2 * h[0]) ** 2 + (2 * h[2]) ** 2) / 12.0)


@dataclasses.dataclass
class EntityPhysicsData:
    rigid_body_type: str
    hitbox: Hitbox
    linvel: np.ndarray
    angvel: np.ndarray
    controlled: bool
    grounded: bool

    def copy(self) -> "EntityPhysicsData":
        return EntityPhysicsData(
            self.rigid_body_type, Hitbox(self.hitbox.half_extents.copy()),
            self.linvel.copy(), self.angvel.copy(), self.controlled, self.grounded,
        )


@dataclasses.dataclass
class EntityCreationData:
    physics: Optional[EntityPhysicsData]
    mesh: Optional[dict]           # SoA mesh (utils/geometry.py) or None
    isometry: Isometry


@dataclasses.dataclass
class Entity:
    mesh: Optional[dict]
    isometry: Isometry
    physics_data: Optional[EntityPhysicsData]


# WorldChange variants (game_world.rs:64-88)


@dataclasses.dataclass
class GlobalEntityAdd:
    id: int
    data: EntityCreationData


@dataclasses.dataclass
class GlobalEntityRemove:
    id: int


@dataclasses.dataclass
class GlobalEntityUpdateIsometry:
    id: int
    isometry: Isometry


@dataclasses.dataclass
class GlobalEntityUpdateVelocity:
    id: int
    linvel: np.ndarray
    angvel: np.ndarray


@dataclasses.dataclass
class GlobalEntityUpdateGroundedness:
    id: int
    grounded: bool


@dataclasses.dataclass
class PhysicsSetVelocity:
    id: int
    linvel: np.ndarray
    angvel: np.ndarray


@dataclasses.dataclass
class PhysicsApplyImpulse:
    id: int
    impulse: np.ndarray
    torque_impulse: np.ndarray


@dataclasses.dataclass
class WorldSetBlock:
    global_coords: np.ndarray
    block_id: int


WorldChange = object


# ---------------------------------------------------------------------------
# GameWorld
# ---------------------------------------------------------------------------


class GameWorld:
    """game_world.rs:90-325."""

    def __init__(
        self,
        scene: Scene,
        camera: Optional[SphericalCamera] = None,
        ego_entity_id: int = 0,
        render_cfg: Optional[RenderConfig] = None,
        sim_cfg: Optional[SimConfig] = None,
        extent: Tuple[int, int] = (800, 600),
        clock: Callable[[], float] = time.monotonic,
        streaming: bool = False,
    ):
        from vrv_tpu.game.chunk_manager import ChunkManager, ChunkQuerier
        from vrv_tpu.game.ego import EgoControlsManager
        from vrv_tpu.game.physics import PhysicsManager
        from vrv_tpu.game.scene_manager import SceneManager

        self.scene = scene
        self.camera = camera or SphericalCamera()
        self.ego_entity_id = ego_entity_id
        self.render_cfg = render_cfg or RenderConfig()
        self.sim_cfg = sim_cfg or SimConfig()
        self.extent = extent
        self.clock = clock

        self.entities: Dict[int, Entity] = {}
        self.events_since_last_step: List[object] = []
        self.changes_since_last_step: List[WorldChange] = []
        self.frame: int = 0
        self.last_frame: Optional[np.ndarray] = None
        self.frame_stats: Dict[str, float] = {}
        # optional ('samples' x 'rows') jax.sharding.Mesh: frames render
        # across it via Scene.render_sharded (app --sharded N); radiance
        # (progressive) steps stay single-device
        self.render_mesh = None

        chunk_manager = ChunkManager(scene, generate=streaming)
        self.chunk_querier = ChunkQuerier(scene)
        physics_manager = PhysicsManager(scene, self.sim_cfg)
        ego_manager = EgoControlsManager(
            self.camera, self.chunk_querier, scene.table, self.sim_cfg, clock=clock
        )
        scene_manager = SceneManager(scene)
        # fixed fan-out order (game_world.rs:175-180)
        self.managers: List[Manager] = [
            chunk_manager, physics_manager, ego_manager, scene_manager,
        ]

    # -- entity API (game_world.rs:293-314) --

    def add_entity(self, entity_id: int, data: EntityCreationData) -> None:
        self.entities[entity_id] = Entity(
            mesh=data.mesh, isometry=data.isometry.copy(),
            physics_data=data.physics.copy() if data.physics else None,
        )
        self.changes_since_last_step.append(GlobalEntityAdd(entity_id, data))

    def remove_entity(self, entity_id: int) -> None:
        self.entities.pop(entity_id, None)
        self.changes_since_last_step.append(GlobalEntityRemove(entity_id))

    def handle_event(self, event) -> None:
        self.events_since_last_step.append(event)

    # -- change replay (game_world.rs:194-233) --

    def update_entity_table(self, changes: Sequence[WorldChange]) -> None:
        for ch in changes:
            if isinstance(ch, GlobalEntityAdd):
                self.entities[ch.id] = Entity(
                    mesh=ch.data.mesh,
                    isometry=ch.data.isometry.copy(),
                    physics_data=ch.data.physics.copy() if ch.data.physics else None,
                )
            elif isinstance(ch, GlobalEntityRemove):
                self.entities.pop(ch.id, None)
            elif isinstance(ch, GlobalEntityUpdateIsometry):
                if ch.id in self.entities:
                    self.entities[ch.id].isometry = ch.isometry.copy()
            elif isinstance(ch, GlobalEntityUpdateVelocity):
                e = self.entities.get(ch.id)
                if e and e.physics_data:
                    e.physics_data.linvel = ch.linvel.copy()
                    e.physics_data.angvel = ch.angvel.copy()
            elif isinstance(ch, GlobalEntityUpdateGroundedness):
                e = self.entities.get(ch.id)
                if e and e.physics_data:
                    e.physics_data.grounded = ch.grounded

    def _reserve_entity_id(self) -> int:
        while True:
            i = random.getrandbits(32)
            if i not in self.entities:
                return i

    # -- per-frame step (game_world.rs:235-290) --

    def step(self, render: bool = True, radiance: bool = False,
             converged: int = 0) -> Optional[np.ndarray]:
        """One frame. With radiance=True the render half returns the
        sample-mean linear radiance (H, W, 3) float32 on device instead of
        the packed u8 frame — the input the progressive accumulator needs
        (models/pathtracer.render_progressive semantics, quirk Q2).
        converged=N renders the frame as N accumulated sample passes in a
        single dispatch (Scene.render_converged; pass-axis sharded over
        render_mesh when one is set) — the reference's 128-spp offline
        row (README.md:8-9)."""
        t0 = time.perf_counter()
        new_changes: List[WorldChange] = []
        for manager in self.managers:
            data = UpdateData(
                entities=self.entities,
                window_events=self.events_since_last_step,
                world_changes=self.changes_since_last_step,
                ego_entity_id=self.ego_entity_id,
                extent=self.extent,
                reserve_entity_id=self._reserve_entity_id,
            )
            new_changes.extend(manager.update(data))

        self.events_since_last_step = []
        self.update_entity_table(new_changes)
        self.changes_since_last_step = new_changes

        img = None
        if render:
            eye, front, right, up = self.camera.eye_front_right_up()
            cfg = self.render_cfg.replace(
                samples_per_pixel=self.camera.rendering_preferences().samples
            )
            # the mesh factorization is static but spp is LIVE (the camera
            # cycles it on 'r', quirk Q1) and converged chunks come from
            # the caller — a request the mesh cannot split falls back to
            # the single-device path for that frame instead of crashing
            # the session on the shard-divisibility asserts
            mesh = self.render_mesh
            if mesh is not None:
                if converged:
                    if converged % mesh.devices.size:
                        mesh = None
                elif cfg.samples_per_pixel % mesh.shape["samples"]:
                    mesh = None
            if radiance:
                img = self.scene.render_samples(
                    eye, front, right, up, self.frame, cfg
                ).mean(axis=0)
            elif converged:
                if mesh is not None:
                    img = self.scene.render_converged_sharded(
                        mesh, eye, front, right, up, self.frame,
                        converged, cfg
                    )
                else:
                    img = self.scene.render_converged(
                        eye, front, right, up, self.frame, converged, cfg
                    )
            elif mesh is not None:
                img = self.scene.render_sharded(
                    mesh, eye, front, right, up, self.frame, cfg
                )
            else:
                img = self.scene.render(eye, front, right, up, self.frame, cfg)
            self.last_frame = img
        self.frame += 1
        self.frame_stats = {
            "frame_ms": (time.perf_counter() - t0) * 1e3,
            "frame": self.frame,
        }
        return img
