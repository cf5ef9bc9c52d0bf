"""Window/present backends.

The reference presents through a winit window + Vulkan swapchain
(reference src/main.rs:160-176, interactive_rendering.rs:139-174). Here
presentation is pluggable:

  - HeadlessSink: collects frames / writes PNGs (CI, benchmarking)
  - TkWindow: best-effort interactive window via tkinter (when a display
    is available); translates Tk events into the game/input.py vocabulary

Backends consume the renderer's BGRA u8 buffer (quirk Q3 byte layout).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from vrv_tpu.game.input import CursorMoved, KeyInput, MouseInput, MouseWheel
from vrv_tpu.utils.image import save_png


class HeadlessSink:
    """Offscreen present target; optionally persists every Nth frame."""

    def __init__(self, out_path: Optional[str] = None, every: int = 0):
        self.out_path = out_path
        self.every = every
        self.frames = 0
        self.last: Optional[np.ndarray] = None

    def present(self, img_bgra) -> None:
        self.last = np.asarray(img_bgra)
        self.frames += 1
        if self.out_path and self.every and self.frames % self.every == 0:
            save_png(self.out_path, self.last)

    def poll_events(self) -> List[object]:
        return []

    @property
    def open(self) -> bool:
        return True


_TK_KEYMAP = {
    "w": "w", "a": "a", "s": "s", "d": "d", "q": "q", "e": "e",
    "space": "space", "Shift_L": "shift", "Shift_R": "shift",
    "Tab": "tab", "r": "r",
    "Up": "up", "Down": "down", "Left": "left", "Right": "right",
    **{str(i): str(i) for i in range(1, 10)},
}


class TkWindow:
    """Interactive window backend (requires a display + tkinter)."""

    def __init__(self, width: int, height: int, title: str = "vrv_tpu"):
        import tkinter as tk
        from PIL import Image, ImageTk

        self._tk = tk
        self._ImageTk = ImageTk
        self._Image = Image
        self.root = tk.Tk()
        self.root.title(title)
        self.label = tk.Label(self.root)
        self.label.pack()
        self._events: List[object] = []
        self._open = True
        self.root.protocol("WM_DELETE_WINDOW", self._close)
        self.root.bind("<KeyPress>", lambda e: self._key(e, True))
        self.root.bind("<KeyRelease>", lambda e: self._key(e, False))
        self.root.bind("<Motion>", lambda e: self._events.append(CursorMoved(e.x, e.y)))
        for btn, name in ((1, "left"), (2, "middle"), (3, "right")):
            self.root.bind(
                f"<ButtonPress-{btn}>",
                lambda e, nm=name: self._events.append(MouseInput(nm, True)),
            )
            self.root.bind(
                f"<ButtonRelease-{btn}>",
                lambda e, nm=name: self._events.append(MouseInput(nm, False)),
            )
        self.root.bind(
            "<MouseWheel>",
            lambda e: self._events.append(MouseWheel(e.delta / 120.0)),
        )
        self._photo = None

    def _close(self):
        self._open = False
        self.root.destroy()

    def _key(self, e, pressed: bool):
        key = _TK_KEYMAP.get(e.keysym)
        if key:
            self._events.append(KeyInput(key, pressed))

    def present(self, img_bgra) -> None:
        if not self._open:
            return
        rgb = np.asarray(img_bgra)[..., [2, 1, 0]]
        im = self._Image.fromarray(rgb)
        self._photo = self._ImageTk.PhotoImage(im)
        self.label.configure(image=self._photo)
        self.root.update_idletasks()
        self.root.update()

    def poll_events(self) -> List[object]:
        ev, self._events = self._events, []
        return ev

    @property
    def open(self) -> bool:
        return self._open


def make_backend(width: int, height: int, out_path: Optional[str] = None):
    """Pick TkWindow when a display is available, else HeadlessSink."""
    import os

    if os.environ.get("DISPLAY"):
        try:
            return TkWindow(width, height)
        except Exception:
            pass
    return HeadlessSink(out_path=out_path, every=1 if out_path else 0)
