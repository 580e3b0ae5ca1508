"""Checkpoint / resume (SURVEY.md §5): the reference at best calls
``torch.save(state_dict)`` at best-val; here orbax-checkpoint with explicit
step numbering, latest-step restore, and deterministic resume.

Kept deliberately thin — a Checkpointer owns one directory, saves a pytree
(params + opt state + step + anything picklable as jnp arrays), restores
the latest or a given step.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, *, wait: bool = False) -> None:
        self._mngr.save(
            step, args=self._ocp.args.StandardSave(state)
        )
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore ``step`` (default: latest) into the structure of
        ``state_like`` (a pytree with matching treedef/shapes)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mngr.restore(
            step, args=self._ocp.args.StandardRestore(state_like)
        )

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
