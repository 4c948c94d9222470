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


def migrate_legacy_block_params(params: dict) -> dict:
    """Convert a pre-stacking parameter tree (per-block ``block_{i}``
    submodules with w_cur / context_proj / residual_proj / skip_proj /
    global_proj leaves) to the current stacked ``blocks_*`` (L, ...)
    layout.  Returns ``params`` unchanged when it is already stacked."""
    if "block_0" not in params:
        return params
    import numpy as np

    out = {k: v for k, v in params.items()
           if not (k.startswith("block_") and k[6:].isdigit())}
    blocks = []
    while f"block_{len(blocks)}" in params:
        blocks.append(params[f"block_{len(blocks)}"])

    def stack(get):
        return np.stack([np.asarray(get(b)) for b in blocks])

    out["blocks_w_cur"] = stack(lambda b: b["w_cur"])
    out["blocks_w_past"] = stack(lambda b: b["w_past"])
    if "context_proj" in blocks[0]:
        out["blocks_ctx_kernel"] = stack(
            lambda b: b["context_proj"]["kernel"])
        out["blocks_ctx_bias"] = stack(
            lambda b: b["context_proj"]["bias"])
    out["blocks_res_kernel"] = stack(
        lambda b: b["residual_proj"]["kernel"])
    out["blocks_res_bias"] = stack(lambda b: b["residual_proj"]["bias"])
    out["blocks_skip_kernel"] = stack(lambda b: b["skip_proj"]["kernel"])
    out["blocks_skip_bias"] = stack(lambda b: b["skip_proj"]["bias"])
    if "global_proj" in blocks[0]:
        out["blocks_global_kernel"] = stack(
            lambda b: b["global_proj"]["kernel"])
    return out


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
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except Exception:
            # Structure-mismatch fallbacks only.  Probe the SAVED tree's
            # top-level param keys from checkpoint metadata first (cheap
            # — no array reads): a transient IO error or corrupt file
            # must re-raise the original error instead of paying a
            # second full unstructured read.  When the metadata ITSELF
            # is unreadable (older orbax writers without tree
            # metadata), fall back to one raw unstructured read to
            # recover the keys — those checkpoints were migratable
            # before the metadata probe existed and must stay so; a
            # transient IO error fails this read too and the original
            # error still propagates.
            raw = None
            saved_keys = self._saved_param_keys(step)
            if saved_keys is None:
                try:
                    raw = self._mgr.restore(step)
                    saved_keys = set(raw["params"].keys())
                except Exception:
                    saved_keys = None
            if saved_keys is not None and "block_0" in saved_keys:
                # pre-round-2 checkpoints store per-block submodules
                # (block_{i}/w_cur, ...).  Restore as-saved, stack the
                # block params into the current layout, and reinitialize
                # the optimizer state (its raveled leaf ORDER followed
                # the old tree and cannot be remapped safely); params +
                # step round-trip exactly.
                logger.warning(
                    "checkpoint at step %s uses the legacy per-block "
                    "parameter layout: migrating params to the stacked "
                    "layout and RESETTING optimizer state", step)
                if raw is None:
                    raw = self._mgr.restore(step)
                # tree.map against the template validates the migrated
                # structure and keeps the template's leaf dtypes
                params = jax.tree.map(
                    lambda t, x: jax.numpy.asarray(x, t.dtype),
                    state.params,
                    migrate_legacy_block_params(raw["params"]))
                return state.replace(params=params,
                                     step=int(raw["step"]))
            template_keys = set(state.params)
            if saved_keys is not None and \
                    template_keys < saved_keys:
                # The saved tree carries leaves the template lacks —
                # e.g. blocks_ctx_kernel/bias written by an audio-only
                # run before the trainer started dropping unused
                # context convs (use_context downgrade).  Drop the
                # extras; optimizer state followed the old leaf set and
                # is reset.
                extra = sorted(saved_keys - template_keys)
                logger.warning(
                    "checkpoint at step %s has parameter leaves the "
                    "current model lacks (%s): dropping them and "
                    "RESETTING optimizer state", step, ", ".join(extra))
                if raw is None:
                    raw = self._mgr.restore(step)
                params = jax.tree.map(
                    lambda t, x: jax.numpy.asarray(x, t.dtype),
                    state.params,
                    {k: raw["params"][k] for k in template_keys})
                return state.replace(params=params,
                                     step=int(raw["step"]))
            raise
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def _saved_param_keys(self, step: int):
        """Top-level key set of the saved ``params`` subtree, read from
        checkpoint METADATA (no array data).  Returns None when the
        metadata is unavailable — callers then re-raise their original
        error rather than guessing."""
        try:
            meta = self._mgr.item_metadata(step)
            tree = getattr(meta, "tree", meta)  # orbax API variants
            return set(tree["params"].keys())
        except Exception:
            return None

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
