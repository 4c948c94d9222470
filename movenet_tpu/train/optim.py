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
from typing import Callable, NamedTuple, Optional, Sequence

import jax
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


def onecycle_momentum_schedule(total_steps: int, pct_start: float = 0.45,
                               base_momentum: float = 0.85,
                               max_momentum: float = 0.95,
                               three_phase: bool = True):
    """torch OneCycleLR momentum cycling (cycle_momentum=True default):
    momentum anneals opposite to the LR — max->base while LR warms up,
    base->max while it anneals, then flat at max."""
    if three_phase:
        ends = np.array([
            float(pct_start * total_steps) - 1.0,
            float(2 * pct_start * total_steps) - 2.0,
            float(total_steps) - 1.0,
        ])
        start_ms = np.array([max_momentum, base_momentum, max_momentum])
        end_ms = np.array([base_momentum, max_momentum, max_momentum])
    else:
        ends = np.array([float(pct_start * total_steps) - 1.0,
                         float(total_steps) - 1.0])
        start_ms = np.array([max_momentum, base_momentum])
        end_ms = np.array([base_momentum, max_momentum])
    starts = np.concatenate([[0.0], ends[:-1]])
    ends_j, starts_j = jnp.asarray(ends), jnp.asarray(starts)
    s_j, e_j = jnp.asarray(start_ms), jnp.asarray(end_ms)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        phase = jnp.clip(jnp.sum(s > ends_j), 0, len(ends) - 1)
        lo, hi = starts_j[phase], ends_j[phase]
        pct = jnp.clip(jnp.where(hi > lo, (s - lo) / (hi - lo), 1.0),
                       0.0, 1.0)
        a, b = s_j[phase], e_j[phase]
        return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    return schedule


def cyclic_momentum_schedule(base_momentum: float = 0.8,
                             max_momentum: float = 0.9,
                             step_size_up: int = 2000,
                             step_size_down: Optional[int] = None,
                             mode: str = "triangular",
                             gamma: float = 1.0):
    """torch CyclicLR momentum cycling: momentum moves inversely to the
    LR between max_momentum and base_momentum."""
    down = step_size_up if step_size_down is None else step_size_down
    total = float(step_size_up + down)
    ratio = step_size_up / total

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + s / total)
        x = 1.0 + s / total - cycle
        scale = jnp.where(x <= ratio, x / ratio, (x - 1.0) / (ratio - 1.0))
        height = (max_momentum - base_momentum) * scale
        if mode == "triangular":
            return max_momentum - height
        if mode == "triangular2":
            return max_momentum - height / (2.0 ** (cycle - 1.0))
        if mode == "exp_range":
            return max_momentum - height * (gamma ** s)
        raise ValueError(f"unknown cyclic mode: {mode}")

    return schedule


def momentum_schedule_for(config, steps_per_epoch: Optional[int] = None):
    """The momentum/beta1 schedule torch would apply, or None.

    OneCycleLR cycles momentum by DEFAULT in torch (the reference never
    disables it, pytorch_lightning_trainer.py:154-160); CyclicLR cycles
    only when scheduler_cycle_momentum is set (config.py:63).
    """
    if config.scheduler == "OneCycleLR":
        updates = math.ceil(
            (steps_per_epoch or 1) / config.accumulation_steps)
        return onecycle_momentum_schedule(
            total_steps=config.n_epochs * updates,
            pct_start=config.lr_pct_start, three_phase=True)
    if config.scheduler == "CyclicLR" and config.scheduler_cycle_momentum:
        return cyclic_momentum_schedule(
            step_size_up=config.scheduler_step_size_up,
            step_size_down=config.scheduler_step_size_down,
            mode=config.scheduler_cyclic_mode,
            gamma=config.scheduler_cyclic_gamma)
    return None


# ------------------------------------------- scheduled-momentum transforms
def _adam_scheduled_b1(lr_fn, b1_fn, b2: float = 0.999, eps: float = 1e-8,
                       decoupled_weight_decay: float = 0.0):
    """torch Adam/AdamW with a time-varying beta1 (OneCycle momentum
    cycling).  Matches torch's bias correction, which uses the CURRENT
    beta1 at each step: bc1 = 1 - b1(t)^t."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        count = state["count"]
        b1 = b1_fn(count)
        lr = lr_fn(count)
        t = (count + 1).astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                          state["nu"], updates)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        new = jax.tree.map(
            lambda m, v: -(lr / bc1) * m / (jnp.sqrt(v / bc2) + eps),
            mu, nu)
        if decoupled_weight_decay and params is not None:
            new = jax.tree.map(
                lambda u, p: u - lr * decoupled_weight_decay * p,
                new, params)
        return new, {"mu": mu, "nu": nu, "count": count + 1}

    return optax.GradientTransformation(init, update)


def _sgd_scheduled_momentum(lr_fn, m_fn):
    """torch SGD with scheduled momentum: buf = m*buf + g."""

    def init(params):
        return {"buf": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        count = state["count"]
        m = m_fn(count)
        lr = lr_fn(count)
        buf = jax.tree.map(lambda b, g: m * b + g, state["buf"], updates)
        new = jax.tree.map(lambda b: -lr * b, buf)
        return new, {"buf": buf, "count": count + 1}

    return optax.GradientTransformation(init, update)


def _rmsprop_scheduled_momentum(lr_fn, m_fn, alpha: float = 0.99,
                                eps: float = 1e-8):
    """torch RMSprop with scheduled momentum."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"sq": zeros, "buf": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        count = state["count"]
        m = m_fn(count)
        lr = lr_fn(count)
        sq = jax.tree.map(lambda s, g: alpha * s + (1 - alpha) * g * g,
                          state["sq"], updates)
        buf = jax.tree.map(lambda b, g, s: m * b + g / (jnp.sqrt(s) + eps),
                           state["buf"], updates, sq)
        new = jax.tree.map(lambda b: -lr * b, buf)
        return new, {"sq": sq, "buf": buf, "count": count + 1}

    return optax.GradientTransformation(init, update)


# -------------------------------------------------------------- optimizers
class FlatGradientTransformation(NamedTuple):
    """optax.GradientTransformation plus the unwrapped `core` that
    operates directly on ONE flat vector.

    The train loop uses `core` to run the whole update flat end-to-end
    (grads taken w.r.t. the raveled vector): the tree<->vector
    conversions otherwise cost ~1 ms/step of tiny-kernel launches.
    `init`/`update` keep the tree-in/tree-out contract for callers that
    have trees (eval tools, tests); both views share the same optimizer
    state (core.init on the flat vector).
    """

    init: Callable
    update: Callable
    core: optax.GradientTransformation


def flatten_transform(
        tx: optax.GradientTransformation) -> FlatGradientTransformation:
    """Run a GradientTransformation over ONE concatenated parameter
    vector instead of the parameter tree.

    The WaveNet tree has ~100 tiny leaves (biases, 64x64 kernels);
    per-leaf optimizer arithmetic becomes hundreds of sub-10us TPU ops
    whose launch overhead dominates the update (~2.7 ms/step measured
    on v5e vs ~0.3 ms flattened).  Element-wise updates (Adam/AdamW/
    SGD/RMSprop, decoupled weight decay) and global-norm clipping are
    exactly the same math on the flat vector, so trajectories are
    unchanged.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return tx.init(flat)

    def update(updates, state, params=None):
        flat_u, unravel = ravel_pytree(updates)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        new_flat, state = tx.update(flat_u, state, flat_p)
        return unravel(new_flat), state

    return FlatGradientTransformation(init, update, tx)


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

    m_sched = momentum_schedule_for(config, steps_per_epoch)
    if m_sched is not None:
        # torch cycles momentum/beta1 along with the LR (OneCycleLR
        # default; CyclicLR when cycle_momentum is set)
        if name == "Adam":
            core = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                _adam_scheduled_b1(schedule, m_sched))
        elif name == "AdamW":
            core = _adam_scheduled_b1(schedule, m_sched,
                                      decoupled_weight_decay=wd)
        elif name == "SGD":
            core = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                _sgd_scheduled_momentum(schedule, m_sched))
        elif name == "RMSprop":
            core = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                _rmsprop_scheduled_momentum(schedule, m_sched))
        else:
            raise ValueError(
                f"optimizer {name} not recognized. Must be one of "
                "['Adam', 'AdamW', 'SGD', 'RMSprop']")
        return _finish(config, core)

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

    return _finish(config, core)


def _finish(config, core: optax.GradientTransformation
            ) -> optax.GradientTransformation:
    """Fold in global-norm clipping and (by default) flatten the whole
    chain to single-vector updates (see flatten_transform)."""
    clip = config.gradient_clipping
    if clip and clip > 0:
        core = optax.chain(optax.clip_by_global_norm(clip), core)
    if getattr(config, "flat_optimizer", True):
        core = flatten_transform(core)
    return core
