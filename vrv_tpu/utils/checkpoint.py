"""World/camera checkpointing.

The reference never persists anything (every run regenerates from seed 0,
reference src/game_system/game_world.rs:158) — save/load is an added
capability that the dense-array design makes trivial: the entire world
state is the voxel grid + camera pose + frame counter.
"""

from __future__ import annotations

import numpy as np

from vrv_tpu.config import WorldConfig
from vrv_tpu.render.scene import Scene


def save_world(path: str, scene: Scene, camera=None, frame: int = 0) -> None:
    data = dict(
        grid=np.asarray(scene.grid),
        origin=np.asarray(scene.world_cfg.origin),
        size=np.asarray(scene.world_cfg.size),
        seed=scene.world_cfg.seed,
        frame=frame,
    )
    if camera is not None:
        data.update(
            cam_root_pos=np.asarray(camera.root_pos),
            cam_root_rot=np.asarray(camera.root_rot),
            cam_pitch=camera.pitch,
            cam_yaw=camera.yaw,
            cam_offset=camera.offset,
        )
    np.savez_compressed(path, **data)


def load_world(path: str, table=None, camera=None):
    """Returns (Scene, frame)."""
    with np.load(path) as z:
        cfg = WorldConfig(
            size=tuple(int(x) for x in z["size"]),
            origin=tuple(int(x) for x in z["origin"]),
            seed=int(z["seed"]),
        )
        scene = Scene(cfg, table=table, grid=z["grid"])
        frame = int(z["frame"])
        if camera is not None and "cam_root_pos" in z:
            camera.root_pos = z["cam_root_pos"]
            camera.root_rot = z["cam_root_rot"]
            camera.pitch = float(z["cam_pitch"])
            camera.yaw = float(z["cam_yaw"])
            camera.offset = float(z["cam_offset"])
    return scene, frame
