"""Block definitions + texture atlas.

Mirrors reference src/game_system/block.rs and the texture-upload semantics
of src/render_system/interactive_rendering.rs:

  - blocks.json is parsed into an alphabetically ordered block table
    (the reference uses a BTreeMap, block.rs:57, so ids are glass=0,
    grass=1, lamp=2, mirror=3, soil=4, stone=5, texturetest=6, air=7).
  - Each block contributes 6 faces x 3 channels (reflectivity, emissivity,
    metallicity) of 16x16 RGBA textures; material index
    t = block_idx * 6 + face (block.rs:116-119).
  - Textures are uploaded as R8G8B8A8_SRGB and sampled with the Vulkan
    default sampler — *nearest* filtering, clamp-to-edge
    (interactive_rendering.rs:267, :358) — so sampled texel values are
    sRGB-decoded to linear. We bake that decode into the float atlas.
    The alpha channel is NOT sRGB-decoded (Vulkan sRGB formats decode
    RGB only); reflectivity alpha drives transmissivity
    (pathtrace_shader.rs:753, 767).
  - Per-texture mean emissive power uses *raw byte sums* r+g+b averaged
    over texels (utils.rs:223-235) — not the sRGB-decoded values; this
    feeds the light-importance structure, so we reproduce it exactly.

The atlas is tiny (42 materials x 16x16) and lives in device memory whole.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import List, Tuple

import numpy as np

FACE_LEFT, FACE_RIGHT, FACE_DOWN, FACE_UP, FACE_BACK, FACE_FRONT = range(6)
FACE_NAMES = ("left", "right", "down", "up", "back", "front")

# outward unit normal of each face (left = -x ... front = +z), matching the
# mesh winding in reference chunk.rs:211-275 (see ops/dda.py face frames).
FACE_NORMALS = np.array(
    [
        [-1.0, 0.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, -1.0],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)

DEFAULT_ASSETS_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


def srgb_to_linear_lut() -> np.ndarray:
    """256-entry sRGB-byte -> linear-float LUT (IEC 61966-2-1)."""
    c = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
    return lin.astype(np.float32)


def linear_to_srgb(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)


@dataclasses.dataclass(frozen=True)
class BlockTable:
    """Host-side block definition table (reference block.rs:60-140)."""

    names: Tuple[str, ...]            # alphabetical, excludes air
    solid: np.ndarray                 # (n_blocks+1,) bool, air False
    translucent: np.ndarray           # (n_blocks+1,) bool, air True
    luminescent: np.ndarray           # (n_blocks+1,) bool, air False
    # float32 linear atlas arrays, shape (n_blocks*6, 16, 16, C):
    reflectivity: np.ndarray          # C=4 (rgb linear + raw alpha)
    emissivity: np.ndarray            # C=3 (rgb linear)
    metallicity: np.ndarray           # C=1 (r linear)
    texture_luminances: np.ndarray    # (n_blocks*6,) raw-byte mean power (utils.rs:223)

    @property
    def n_blocks(self) -> int:
        return len(self.names)

    @property
    def air(self) -> int:
        """Air id = number of defined blocks (block.rs:107)."""
        return len(self.names)

    def block_idx(self, name: str) -> int:
        if name == "air":
            return self.air
        return self.names.index(name)

    def material_offset(self, block_idx: int, face: int) -> int:
        """Material texture index (block.rs:116-119)."""
        return block_idx * 6 + face

    def completely_transparent(self, block_idx: int) -> bool:
        return block_idx == self.air

    def is_translucent(self, block_idx: int) -> bool:
        """Air counts as translucent (block.rs:125-127)."""
        return bool(self.translucent[block_idx])

    def is_solid(self, block_idx: int) -> bool:
        return bool(self.solid[block_idx])

    def is_luminescent(self, block_idx: int) -> bool:
        return bool(self.luminescent[block_idx])


def _load_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)


@functools.lru_cache(maxsize=4)
def load_block_table(assets_path: str = DEFAULT_ASSETS_PATH) -> BlockTable:
    with open(os.path.join(assets_path, "blocks.json")) as f:
        spec = json.load(f)["blocks"]

    names = tuple(sorted(spec.keys()))  # BTreeMap iteration order (block.rs:84)
    lut = srgb_to_linear_lut()

    refl: List[np.ndarray] = []
    emis: List[np.ndarray] = []
    metal: List[np.ndarray] = []
    lum: List[float] = []
    solid, translucent, luminescent = [], [], []

    for name in names:
        b = spec[name]
        solid.append(bool(b["solid"]))
        translucent.append(bool(b["translucent"]))
        luminescent.append(bool(b["luminescent"]))
        for face in FACE_NAMES:
            tex = b[face]
            r8 = _load_png(os.path.join(assets_path, tex["reflectivity"]))
            e8 = _load_png(os.path.join(assets_path, tex["emissivity"]))
            m8 = _load_png(os.path.join(assets_path, tex["metallicity"]))
            rf = np.concatenate(
                [lut[r8[..., :3]], r8[..., 3:4].astype(np.float32) / 255.0], axis=-1
            )
            refl.append(rf)
            emis.append(lut[e8[..., :3]])
            metal.append(lut[m8[..., :1]])
            # raw-byte mean power (utils.rs:229-232): sum r+g+b per texel, / n_texels
            lum.append(float(e8[..., :3].astype(np.float64).sum() / (e8.shape[0] * e8.shape[1])))

    n = len(names)
    return BlockTable(
        names=names,
        solid=np.array(solid + [False]),
        translucent=np.array(translucent + [True]),
        luminescent=np.array(luminescent + [False]),
        reflectivity=np.stack(refl).astype(np.float32),
        emissivity=np.stack(emis).astype(np.float32),
        metallicity=np.stack(metal).astype(np.float32),
        texture_luminances=np.array(lum, dtype=np.float32),
    )
