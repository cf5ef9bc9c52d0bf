"""Framebuffer host handoff + PNG IO.

The reference presents by copying the kernel's u8 BGRA buffer into a
B8G8R8A8_SRGB swapchain image (reference
src/render_system/interactive_rendering.rs:508-528). Headless we convert
BGRA bytes -> RGB PNG; interactive backends can consume the raw BGRA
buffer zero-copy via dlpack.
"""

from __future__ import annotations

import numpy as np


def bgra_to_rgb(img_bgra: np.ndarray) -> np.ndarray:
    return np.asarray(img_bgra)[..., [2, 1, 0]]


def save_png(path: str, img_bgra) -> None:
    from PIL import Image

    Image.fromarray(bgra_to_rgb(np.asarray(img_bgra))).save(path)


def load_png_rgb(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def mse(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pixel MSE on [0,1]-scaled bytes (the parity gate metric)."""
    a = np.asarray(a, np.float64) / 255.0
    b = np.asarray(b, np.float64) / 255.0
    return float(((a - b) ** 2).mean())
