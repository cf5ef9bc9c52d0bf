"""Host-side input events + sticky input state.

The reference consumes winit window events (src/handle_user_input.rs).
Headless/TPU-side we define a tiny event vocabulary with the same
semantics so tests can drive the game loop with scripted event streams,
and a real window backend can translate native events 1:1.

`UserInputState` mirrors handle_user_input.rs:5-132: sticky current/
previous keyboard+mouse snapshots and edge-detection helpers.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class KeyInput:
    key: str          # 'w','a','s','d','q','e','up','left','down','right',
    #                   'space','shift','tab','r','1'..'9'
    pressed: bool


@dataclasses.dataclass(frozen=True)
class MouseInput:
    button: str       # 'left' | 'right' | 'middle'
    pressed: bool


@dataclasses.dataclass(frozen=True)
class CursorMoved:
    x: float
    y: float


@dataclasses.dataclass(frozen=True)
class MouseWheel:
    lines_y: float


Event = object


def get_normalized_mouse_coords(e: np.ndarray, extent) -> np.ndarray:
    """utils.rs:211-215: trackball-normalized, centered coords."""
    trackball_radius = float(min(extent[0], extent[1]))
    center = np.array([extent[0] / 2.0, extent[1] / 2.0])
    return (np.asarray(e, dtype=np.float64) - center) / trackball_radius


def screen_to_uv(e, extent) -> np.ndarray:
    """utils.rs:217-221: pixel coords -> [-1, 1]^2."""
    e = np.asarray(e, dtype=np.float64)
    return np.array([2.0 * e[0] / extent[0] - 1.0, 2.0 * e[1] / extent[1] - 1.0])


class _Snapshot:
    """One keyboard/mouse snapshot (handle_user_input.rs:5-24)."""

    KEYS = ("w", "a", "s", "d", "q", "e", "up", "left", "down", "right", "space", "shift")

    def __init__(self):
        for k in self.KEYS:
            setattr(self, k, False)
        self.mouse_left_down = False
        self.mouse_right_down = False
        self.pos = np.zeros(2)

    def copy(self) -> "_Snapshot":
        s = _Snapshot()
        for k in self.KEYS:
            setattr(s, k, getattr(self, k))
        s.mouse_left_down = self.mouse_left_down
        s.mouse_right_down = self.mouse_right_down
        s.pos = self.pos.copy()
        return s


class UserInputState:
    """Sticky input state with previous-frame snapshot (handle_user_input.rs:26-132)."""

    def __init__(self):
        self.current = _Snapshot()
        self.previous = _Snapshot()

    @staticmethod
    def last_key_pressed(events: Sequence[Event], keys: Iterable[str]) -> Optional[str]:
        """Last matching pressed key in the event list (handle_user_input.rs:62-79)."""
        keys = set(keys)
        last = None
        for ev in events:
            if isinstance(ev, KeyInput) and ev.pressed and ev.key in keys:
                last = ev.key
        return last

    @staticmethod
    def key_pressed(events: Sequence[Event], key: str) -> bool:
        """Whether `key` was pressed in the event list (handle_user_input.rs:81-90)."""
        return any(isinstance(ev, KeyInput) and ev.pressed and ev.key == key for ev in events)

    def handle_input(self, events: Sequence[Event]) -> None:
        self.previous = self.current.copy()
        for ev in events:
            if isinstance(ev, KeyInput):
                if ev.key in _Snapshot.KEYS:
                    setattr(self.current, ev.key, ev.pressed)
            elif isinstance(ev, MouseInput):
                if ev.button == "left":
                    self.current.mouse_left_down = ev.pressed
                elif ev.button == "right":
                    self.current.mouse_right_down = ev.pressed
            elif isinstance(ev, CursorMoved):
                self.current.pos = np.array([ev.x, ev.y])
