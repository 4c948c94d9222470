"""Optimizers and LR schedules with torch semantics.

The reference trains with any of {Adam, AdamW, SGD, RMSprop} x
{OneCycleLR(three_phase), CyclicLR, StepLR, MultiStepLR}, schedulers
stepped per optimizer update (pytorch_lightning_trainer.py:128-202,
trainer.py:264-282).  These optax factories reproduce the torch update
rules (L2-into-gradient for Adam/SGD/RMSprop, decoupled decay for
AdamW, eps outside the sqrt for RMSprop) and the torch closed-form LR
curves, so loss trajectories are comparable run-for-run.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
import optax


# --------------------------------------------------------------- schedules
def onecycle_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.45,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    three_phase: bool = True,
):
    """torch.optim.lr_scheduler.OneCycleLR with cosine annealing.

    three_phase=True (the reference's setting,
    pytorch_lightning_trainer.py:154-160): warmup initial->max over
    pct_start, anneal max->initial over the next pct_start, then
    initial->min over the remainder.  Phase boundaries follow torch:
    [pct*T - 1, 2*pct*T - 2, T - 1].
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor

    if three_phase:
        ends = np.array([
            float(pct_start * total_steps) - 1.0,
            float(2 * pct_start * total_steps) - 2.0,
            float(total_steps) - 1.0,
        ])
        start_lrs = np.array([initial_lr, max_lr, initial_lr])
        end_lrs = np.array([max_lr, initial_lr, min_lr])
    else:
        ends = np.array([
            float(pct_start * total_steps) - 1.0,
            float(total_steps) - 1.0,
        ])
        start_lrs = np.array([initial_lr, max_lr])
        end_lrs = np.array([max_lr, min_lr])
    starts = np.concatenate([[0.0], ends[:-1]])

    ends_j = jnp.asarray(ends)
    starts_j = jnp.asarray(starts)
    start_lrs_j = jnp.asarray(start_lrs)
    end_lrs_j = jnp.asarray(end_lrs)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        # first phase whose end_step >= s (torch walks phases in order)
        phase = jnp.sum(s > ends_j)
        phase = jnp.clip(phase, 0, len(ends) - 1)
        lo = starts_j[phase]
        hi = ends_j[phase]
        pct = jnp.where(hi > lo, (s - lo) / (hi - lo), 1.0)
        pct = jnp.clip(pct, 0.0, 1.0)
        a, b = start_lrs_j[phase], end_lrs_j[phase]
        return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    return schedule


def cyclic_schedule(
    base_lr: float,
    max_lr: float,
    step_size_up: int = 2000,
    step_size_down: Optional[int] = None,
    mode: str = "triangular",
    gamma: float = 1.0,
):
    """torch.optim.lr_scheduler.CyclicLR closed form."""
    down = step_size_up if step_size_down is None else step_size_down
    total = float(step_size_up + down)
    ratio = step_size_up / total

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + s / total)
        x = 1.0 + s / total - cycle
        scale = jnp.where(x <= ratio, x / ratio, (x - 1.0) / (ratio - 1.0))
        height = (max_lr - base_lr) * scale
        if mode == "triangular":
            return base_lr + height
        if mode == "triangular2":
            return base_lr + height / (2.0 ** (cycle - 1.0))
        if mode == "exp_range":
            return base_lr + height * (gamma ** s)
        raise ValueError(f"unknown cyclic mode: {mode}")

    return schedule


def step_schedule(initial_lr: float, step_size: int, gamma: float = 0.1):
    """torch StepLR: lr = lr0 * gamma^(floor(s / step_size))."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        return initial_lr * gamma ** jnp.floor(s / step_size)

    return schedule


def multistep_schedule(initial_lr: float, milestones: Sequence[int],
                       gamma: float = 0.1):
    """torch MultiStepLR: lr = lr0 * gamma^(#milestones <= s)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        return initial_lr * gamma ** jnp.sum(s >= ms)

    return schedule


def make_schedule(config, steps_per_epoch: Optional[int] = None):
    """Build the LR schedule named by a TrainingConfig
    (reference mapping: pytorch_lightning_trainer.py:148-185).

    Returns a callable step -> lr (constant if config.scheduler is None).
    """
    name = config.scheduler
    if name is None:
        lr = config.learning_rate
        return lambda step: jnp.asarray(lr, jnp.float32)
    if name == "OneCycleLR":
        if steps_per_epoch is None:
            raise ValueError("OneCycleLR needs steps_per_epoch")
        updates_per_epoch = math.ceil(
            steps_per_epoch / config.accumulation_steps)
        return onecycle_schedule(
            max_lr=config.max_learning_rate,
            total_steps=config.n_epochs * updates_per_epoch,
            pct_start=config.lr_pct_start,
            three_phase=True,
        )
    if name == "CyclicLR":
        return cyclic_schedule(
            base_lr=config.base_learning_rate,
            max_lr=config.max_learning_rate,
            step_size_up=config.scheduler_step_size_up,
            step_size_down=config.scheduler_step_size_down,
            mode=config.scheduler_cyclic_mode,
            gamma=config.scheduler_cyclic_gamma,
        )
    if name == "StepLR":
        return step_schedule(config.learning_rate,
                             config.scheduler_step_size,
                             config.scheduler_step_gamma)
    if name == "MultiStepLR":
        if not config.scheduler_milestones:
            raise ValueError("MultiStepLR needs scheduler_milestones")
        return multistep_schedule(config.learning_rate,
                                  config.scheduler_milestones,
                                  config.scheduler_step_gamma)
    raise ValueError(
        f"scheduler {name} not recognized. Must be one of "
        "[None, 'OneCycleLR', 'CyclicLR', 'StepLR', 'MultiStepLR']")


# -------------------------------------------------------------- optimizers
def make_optimizer(config, steps_per_epoch: Optional[int] = None
                   ) -> optax.GradientTransformation:
    """Optimizer + schedule + grad clipping, torch update semantics.

    Supported names mirror the reference whitelist
    (pytorch_lightning_trainer.py:135-140): Adam, AdamW, SGD, RMSprop.
    Gradient clipping (global L2 norm) is folded in when
    config.gradient_clipping > 0 (Lightning's gradient_clip_val
    semantics; 0 disables).
    """
    schedule = make_schedule(config, steps_per_epoch)
    name = config.optimizer
    wd = config.weight_decay

    if name == "Adam":
        # torch Adam: L2 term added to the gradient before moments
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8),
        )
    elif name == "AdamW":
        core = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd)
    elif name == "SGD":
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(schedule, momentum=config.momentum or None,
                      nesterov=False),
        )
    elif name == "RMSprop":
        # torch RMSprop: eps OUTSIDE the sqrt
        core = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.rmsprop(schedule, decay=0.99, eps=1e-8,
                          eps_in_sqrt=False,
                          momentum=config.momentum or None),
        )
    else:
        raise ValueError(
            f"optimizer {name} not recognized. Must be one of "
            "['Adam', 'AdamW', 'SGD', 'RMSprop']")

    clip = config.gradient_clipping
    if clip and clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), core)
    return core
