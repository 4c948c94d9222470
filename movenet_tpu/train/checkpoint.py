"""Checkpointing: params + optimizer state + step, with resume.

Improves on the reference, which pickles only the model state dict and
silently restarts optimizer/schedule state on resume (trainer.py:240-262,
455-467).  Layout mirrors the reference's directory convention:

    <model_output_path>/checkpoints/<step-or-epoch>/   (orbax tree)
    <model_output_path>/config.json                    (run config snapshot)

Uses orbax with optional async save so checkpointing overlaps training.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Thin orbax wrapper bound to a run directory."""

    def __init__(self, directory: Path, max_to_keep: Optional[int] = None,
                 async_save: bool = True):
        self.directory = Path(directory).absolute() / "checkpoints"
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state) -> None:
        """Save params/opt_state/step at a step index."""
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, state, step: Optional[int] = None):
        """Restore into an abstract state template (from
        create_train_state); returns the updated TrainState."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}")
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_checkpoint(directory: Path, step: int, state,
                    config=None) -> None:
    """One-shot save (also snapshots config.json like trainer.py:763-764)."""
    mgr = CheckpointManager(directory, async_save=False)
    mgr.save(step, state)
    mgr.wait()
    mgr.close()
    if config is not None:
        config.save(Path(directory) / "config.json")


def restore_checkpoint(directory: Path, state, step: Optional[int] = None):
    mgr = CheckpointManager(directory, async_save=False)
    out = mgr.restore(state, step)
    mgr.close()
    return out
