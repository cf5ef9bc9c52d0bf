"""Cameras.

Mirrors reference src/camera.rs: the `Camera` protocol produces
(eye, front, right, up) vectors consumed by raygen, and `SphericalCamera`
orbits the ego with middle-drag yaw/pitch (clamped +-89 deg) and scroll
zoom (camera.rs:128-188). World-up is (0, -1, 0) — the reference keeps
Vulkan's Y-down convention in world space (camera.rs:85); we preserve it
so all downstream math (gravity sign, worldgen y-falloff, face normals)
matches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Protocol, Tuple

import numpy as np

Vec3 = np.ndarray


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def dir_vecs(worldup: Vec3, pitch: float, yaw: float) -> Tuple[Vec3, Vec3, Vec3]:
    """(front, right, up) from pitch/yaw (camera.rs:22-35)."""
    front = _normalize(
        np.array(
            [
                math.cos(yaw) * math.cos(pitch),
                math.sin(pitch),
                math.sin(yaw) * math.cos(pitch),
            ],
            dtype=np.float64,
        )
    )
    right = _normalize(np.cross(front, worldup))
    up = _normalize(np.cross(right, front))
    return front, right, up


@dataclasses.dataclass
class RenderingPreferences:
    """camera.rs:37-40; unlike the reference (quirk Q1) `samples` is live."""

    samples: int = 1


class Camera(Protocol):
    def eye_front_right_up(self) -> Tuple[Vec3, Vec3, Vec3, Vec3]: ...
    def rendering_preferences(self) -> RenderingPreferences: ...
    def set_rendering_preferences(self, prefs: RenderingPreferences) -> None: ...
    def set_root_position(self, pos) -> None: ...
    def set_root_rotation(self, quat) -> None: ...


def _quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate v by unit quaternion q = (w, x, y, z)."""
    w, x, y, z = q
    u = np.array([x, y, z], dtype=np.float64)
    return 2.0 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v + 2.0 * w * np.cross(u, v)


class SphericalCamera:
    """Orbit camera (camera.rs:56-188)."""

    def __init__(self):
        self.root_pos = np.zeros(3)
        self.root_rot = np.array([1.0, 0.0, 0.0, 0.0])  # identity (w,x,y,z)
        self.worldup = np.array([0.0, -1.0, 0.0])       # camera.rs:85
        self.pitch = 0.0
        self.yaw = 0.0
        self.offset = 5.0                               # camera.rs:64,87
        self.prefs = RenderingPreferences(samples=1)
        self._mouse_down = False
        self._mouse_prev = np.zeros(2)
        self._mouse_curr = np.zeros(2)

    # --- Camera protocol ---

    def eye_front_right_up(self):
        front, right, up = dir_vecs(self.worldup, self.pitch, self.yaw)
        front = _quat_rotate(self.root_rot, front)
        right = _quat_rotate(self.root_rot, right)
        up = _quat_rotate(self.root_rot, up)
        eye = self.root_pos - self.offset * front       # camera.rs:107
        return eye, front, right, up

    def rendering_preferences(self) -> RenderingPreferences:
        return self.prefs

    def set_rendering_preferences(self, prefs: RenderingPreferences) -> None:
        self.prefs = prefs

    def set_root_position(self, pos) -> None:
        self.root_pos = np.asarray(pos, dtype=np.float64)

    def set_root_rotation(self, quat) -> None:
        self.root_rot = np.asarray(quat, dtype=np.float64)

    # --- InteractiveCamera protocol ---

    def update(self) -> None:
        pass

    def handle_events(self, extent, events) -> None:
        """Consume input events (see game/input.py for the event shapes).

        Drag math mirrors camera.rs:146-163; zoom camera.rs:173-183.
        """
        from vrv_tpu.game.input import (
            CursorMoved,
            MouseInput,
            MouseWheel,
            get_normalized_mouse_coords,
        )

        for ev in events:
            if isinstance(ev, MouseInput) and ev.button == "middle":
                if ev.pressed:
                    self._mouse_down = True
                else:
                    self._mouse_down = False
            elif isinstance(ev, CursorMoved):
                self._mouse_prev = self._mouse_curr
                self._mouse_curr = get_normalized_mouse_coords(
                    np.array([ev.x, ev.y], dtype=np.float64), extent
                )
                if self._mouse_down:
                    self.yaw -= (self._mouse_curr[0] - self._mouse_prev[0]) * 2.0
                    self.pitch -= (self._mouse_curr[1] - self._mouse_prev[1]) * 2.0
                    limit = math.radians(89.0)
                    self.pitch = max(-limit, min(limit, self.pitch))
            elif isinstance(ev, MouseWheel):
                self.offset -= 1.0 * ev.lines_y
