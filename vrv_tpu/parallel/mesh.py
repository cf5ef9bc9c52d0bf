"""Device mesh construction.

Rendering is a 2-axis data-parallel problem:
  - 'samples': Monte-Carlo samples per pixel (merged with a psum — the
    only steady-state collective in the whole renderer)
  - 'rows': image rows (embarrassingly parallel; output stays sharded
    until host gather)
The voxel grid (2 MB at 128^3) and atlases (~350 KB) are replicated per
chip, so after init there is zero inter-chip traffic besides the sample
merge (SURVEY.md section 5, distributed backend).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def pick_mesh_shape(n_devices: int, spp: int, height: int) -> Tuple[int, int]:
    """Factor n_devices into (samples, rows) respecting divisibility."""
    best = (n_devices, 1)
    for rows in range(1, n_devices + 1):
        if n_devices % rows:
            continue
        samples = n_devices // rows
        if spp % samples == 0 and height % rows == 0:
            # prefer the most balanced split with samples >= rows
            if abs(samples - rows) < abs(best[0] - best[1]) and samples >= rows:
                best = (samples, rows)
    if spp % best[0] or height % best[1]:
        # fall back to pure row sharding if possible, else pure samples
        if height % n_devices == 0:
            return (1, n_devices)
        return (n_devices, 1)
    return best


def make_render_mesh(
    n_devices: Optional[int] = None,
    spp: int = 8,
    height: int = 600,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    s, r = pick_mesh_shape(len(devices), spp, height)
    arr = np.asarray(devices).reshape(s, r)
    return Mesh(arr, axis_names=("samples", "rows"))
