"""SceneManager: replay entity changes into the render scene.

Mirrors reference src/game_system/scene_manager.rs:22-44. In the TPU
design the voxel world is already the render scene (no upload), so this
manager maintains the renderer-side *entity instance list* (dynamic
meshes such as the ego cube): GlobalEntityAdd/Remove/UpdateIsometry map
to instance add/remove/transform updates.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from vrv_tpu.game.manager import Manager, UpdateData
from vrv_tpu.game.world import (
    GlobalEntityAdd,
    GlobalEntityRemove,
    GlobalEntityUpdateIsometry,
)
from vrv_tpu.render.scene import Scene


class SceneManager(Manager):
    def __init__(self, scene: Scene):
        self.scene = scene
        self.instances: Dict[int, dict] = {}

    def update(self, data: UpdateData) -> List[object]:
        dirty = False
        for ch in data.world_changes:
            if isinstance(ch, GlobalEntityAdd):
                if ch.data.mesh is not None:
                    self.instances[ch.id] = {
                        "mesh": ch.data.mesh,
                        "isometry": ch.data.isometry.copy(),
                    }
                    dirty = True
            elif isinstance(ch, GlobalEntityRemove):
                if self.instances.pop(ch.id, None) is not None:
                    dirty = True
            elif isinstance(ch, GlobalEntityUpdateIsometry):
                if ch.id in self.instances:
                    self.instances[ch.id]["isometry"] = ch.isometry.copy()
                    dirty = True
        if dirty:
            self._upload()
        return []

    def _upload(self) -> None:
        """Rebuild the renderer's instance triangle set (grid-local coords)."""
        from vrv_tpu.ops.instances import transform_mesh
        from vrv_tpu.game.world import Isometry

        meshes = []
        for rec in self.instances.values():
            iso = rec["isometry"]
            local = Isometry(
                iso.translation - self.scene.origin.astype(np.float64),
                iso.rotation,
            )
            meshes.append(transform_mesh(rec["mesh"], local))
        self.scene.set_instances(meshes)
