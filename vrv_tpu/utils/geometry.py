"""Geometry helpers (reference src/utils.rs).

Mesh constructors return the same SoA layout as game.chunk.gen_mesh:
{"positions": (n,3) f32, "t": (n,) u32, "uv": (n,2) f32} — the TPU-side
analog of Vertex3D {position, t, uv} (reference
src/render_system/vertex.rs:3-12).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from vrv_tpu.game.chunk import FACE_POSITIONS, FACE_UVS


def cuboid(loc, dims) -> Dict[str, np.ndarray]:
    """Axis-aligned cuboid centred at loc with per-face texture ids 0..5
    (utils.rs:88-172). Uses the shared face tables — the reference's
    cuboid vertex/uv layout is identical to the chunk mesher's."""
    loc = np.asarray(loc, dtype=np.float32)
    dims = np.asarray(dims, dtype=np.float32)
    base = loc - 0.5 * dims
    pos = FACE_POSITIONS * dims[None, None, :] + base[None, None, :]   # (6,6,3)
    t = np.repeat(np.arange(6, dtype=np.uint32), 6)
    return {
        "positions": pos.reshape(36, 3),
        "t": t,
        "uv": FACE_UVS.reshape(36, 2).astype(np.float32),
    }


def unitcube() -> Dict[str, np.ndarray]:
    """utils.rs:174-176."""
    return cuboid([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])


def polyline(
    points: Sequence, normals: Sequence, width: Sequence, colors: Sequence
) -> Dict[str, np.ndarray]:
    """Ribbon mesh along a polyline (utils.rs:16-86).

    The reference builds color-only vertices (Vertex3D::new, t=0 uv=color
    packing via new(position, color)); here colors are carried in `uv`-less
    form: we emit t=0 and store color per vertex in a separate key.
    """
    pts = np.asarray(points, dtype=np.float64)
    nrm = np.asarray(normals, dtype=np.float64)
    wid = np.asarray(width, dtype=np.float64)
    col = np.asarray(colors, dtype=np.float32)
    assert len(pts) > 1, "not enough points"
    assert len(pts) == len(nrm) and len(pts) == len(wid) and len(pts) - 1 == len(col)

    dseg = pts[1:] - pts[:-1]
    dpts = [dseg[0]]
    for i in range(1, len(dseg)):
        v = dseg[i - 1] + dseg[i]
        dpts.append(v / np.linalg.norm(v))
    dpts.append(dseg[-1])
    dpts = np.asarray(dpts)

    cross = np.cross(dpts, nrm)
    cross /= np.linalg.norm(cross, axis=1, keepdims=True)
    left = pts - cross * wid[:, None]
    right = pts + cross * wid[:, None]

    positions: List[np.ndarray] = []
    vcolors: List[np.ndarray] = []
    for i in range(len(pts) - 1):
        l0, l1, r0, r1 = left[i], left[i + 1], right[i], right[i + 1]
        for p in (r0, l1, l0, r1, l1, r0):
            positions.append(p)
            vcolors.append(col[i])
    n = len(positions)
    return {
        "positions": np.asarray(positions, dtype=np.float32),
        "t": np.zeros(n, dtype=np.uint32),
        "uv": np.zeros((n, 2), dtype=np.float32),
        "colors": np.asarray(vcolors, dtype=np.float32),
    }


def flat_polyline(points, width: float, color) -> Dict[str, np.ndarray]:
    """utils.rs:7-14."""
    pts = np.asarray(points, dtype=np.float64)
    normals = np.tile(np.array([0.0, 1.0, 0.0]), (len(pts), 1))
    widths = np.full(len(pts), width)
    colors = np.tile(np.asarray(color, dtype=np.float32), (len(pts) - 1, 1))
    return polyline(pts, normals, widths, colors)


def mesh_aabb(mesh: Dict[str, np.ndarray]) -> np.ndarray:
    """Extent (max - min) of a mesh (utils.rs:179-203)."""
    p = mesh["positions"]
    return p.max(axis=0) - p.min(axis=0)
