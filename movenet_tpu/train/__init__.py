"""Training layer: one functional train loop (no Lightning-vs-custom
split), torch-semantics optimizers and LR schedules, checkpointing."""

from movenet_tpu.train.optim import (
    make_optimizer,
    make_schedule,
    onecycle_schedule,
    cyclic_schedule,
    step_schedule,
    multistep_schedule,
)
from movenet_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_scan_train_step,
    make_eval_step,
)
from movenet_tpu.train.checkpoint import (
    CheckpointManager,
    save_checkpoint,
    restore_checkpoint,
)

__all__ = [
    "make_optimizer",
    "make_schedule",
    "onecycle_schedule",
    "cyclic_schedule",
    "step_schedule",
    "multistep_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_scan_train_step",
    "make_eval_step",
    "CheckpointManager",
    "save_checkpoint",
    "restore_checkpoint",
]
