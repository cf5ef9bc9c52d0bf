"""PathTracer: the flagship end-to-end model of this framework.

Bundles world + materials + light structure + camera into a single object
with a jittable forward step (one frame), mirroring what a user of the
reference gets from GameWorld::step's render half (reference
src/game_system/game_world.rs:262-283) minus the interactive machinery.

Supports the BASELINE.json configs:
  - primary-visibility (1 spp / 1 bounce albedo-ish)
  - diffuse path tracing (4/4)
  - README headline (8/4 at 800x600, progressive accumulation)
  - converged (128 spp)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vrv_tpu.config import RenderConfig, WorldConfig
from vrv_tpu.render.scene import Scene


@dataclasses.dataclass
class CameraPose:
    eye: np.ndarray
    front: np.ndarray
    right: np.ndarray
    up: np.ndarray

    @staticmethod
    def looking(eye, yaw: float = 0.0, pitch: float = 0.0) -> "CameraPose":
        from vrv_tpu.camera import dir_vecs

        front, right, up = dir_vecs(np.array([0.0, -1.0, 0.0]), pitch, yaw)
        return CameraPose(np.asarray(eye, np.float32), front, right, up)

    def arrays(self) -> Tuple[jax.Array, ...]:
        return (
            jnp.asarray(self.eye, jnp.float32),
            jnp.asarray(self.front, jnp.float32),
            jnp.asarray(self.right, jnp.float32),
            jnp.asarray(self.up, jnp.float32),
        )


class PathTracer:
    def __init__(
        self,
        world_cfg: Optional[WorldConfig] = None,
        render_cfg: Optional[RenderConfig] = None,
        grid: Optional[np.ndarray] = None,
    ):
        self.world_cfg = world_cfg or WorldConfig()
        self.render_cfg = render_cfg or RenderConfig()
        self.scene = Scene(self.world_cfg, grid=grid)
        self._accum: Optional[jax.Array] = None
        self._accum_frames = 0

    def render(self, pose: CameraPose, frame: int = 0) -> jax.Array:
        """One frame (H, W, 4) u8 BGRA."""
        img = self.scene.render(pose.eye, pose.front, pose.right, pose.up,
                                frame, self.render_cfg)
        return img

    def render_progressive(self, pose: CameraPose, frame: int) -> jax.Array:
        """Accumulate radiance across frames (the capability reserved by the
        reference's postprocess stub; quirk Q2)."""
        from vrv_tpu.render.megakernel import pack_bgra

        samples = self.scene.render_samples(
            pose.eye, pose.front, pose.right, pose.up, frame, self.render_cfg
        ).mean(axis=0)
        if self._accum is None:
            self._accum = samples
            self._accum_frames = 1
        else:
            self._accum = self._accum + samples
            self._accum_frames += 1
        return pack_bgra(self._accum / self._accum_frames)

    def reset_accumulation(self):
        self._accum = None
        self._accum_frames = 0

    def render_converged(
        self, pose: CameraPose, total_spp: int = 128, frame0: int = 0
    ) -> jax.Array:
        """Converged render (BASELINE config 5: 128 spp) by accumulating
        cfg.samples_per_pixel-sized chunks across frame ids — equivalent in
        distribution to one high-spp pass, without a 100M-ray live set."""
        from vrv_tpu.render.megakernel import pack_bgra

        chunk = self.render_cfg.samples_per_pixel
        n_chunks = max(1, total_spp // chunk)
        acc = None
        for i in range(n_chunks):
            s = self.scene.render_samples(
                pose.eye, pose.front, pose.right, pose.up, frame0 + i, self.render_cfg
            ).sum(axis=0)
            acc = s if acc is None else acc + s
        return pack_bgra(acc / (n_chunks * chunk))
