"""Manager protocol (reference src/game_system/manager.rs).

Each system consumes last frame's world changes + window events and emits
new changes; GameWorld fans updates out in a fixed order
(game_world.rs:175-180: chunk, physics, ego, scene).
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Callable, Dict, List, Sequence, Tuple

from vrv_tpu.game.input import Event


@dataclasses.dataclass
class UpdateData:
    """manager.rs:5-13."""

    entities: Dict[int, "Entity"]            # noqa: F821 (world.Entity)
    window_events: Sequence[Event]
    world_changes: Sequence["WorldChange"]   # noqa: F821 (world.WorldChange)
    ego_entity_id: int
    extent: Tuple[int, int]
    reserve_entity_id: Callable[[], int]


class Manager(abc.ABC):
    @abc.abstractmethod
    def update(self, data: UpdateData) -> List["WorldChange"]:  # noqa: F821
        ...
