"""OneCycle/Cyclic momentum cycling vs torch full-trajectory oracles.

torch's OneCycleLR cycles the optimizer momentum (Adam beta1) by
default; the reference used OneCycleLR without disabling it
(pytorch_lightning_trainer.py:154-160), so matching its loss curves
requires matching this too.  Full parameter trajectories over many
steps are compared against live torch runs."""

import numpy as np
import pytest

import jax.numpy as jnp
import optax

from movenet_tpu.config import ModelConfig, TrainingConfig
from movenet_tpu.train.optim import (
    make_optimizer,
    momentum_schedule_for,
    onecycle_momentum_schedule,
)


def _torch_trajectory(name, w0, grads, lr, wd, total, pct_start,
                      momentum=0.9):
    import torch

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    kwargs = {"lr": lr}
    if wd:
        kwargs["weight_decay"] = wd
    if name in ("SGD", "RMSprop"):
        kwargs["momentum"] = momentum
    opt = getattr(torch.optim, name)([wt], **kwargs)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr * 10, total_steps=total, pct_start=pct_start,
        three_phase=True)
    traj = []
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt.step()
        sched.step()
        traj.append(wt.detach().numpy().copy())
    return traj


def _ours_trajectory(name, w0, grads, lr, wd, total, pct_start,
                     momentum=0.9):
    cfg = TrainingConfig(
        model_config=ModelConfig(),
        optimizer=name, learning_rate=lr, weight_decay=wd,
        momentum=momentum,
        scheduler="OneCycleLR", max_learning_rate=lr * 10,
        lr_pct_start=pct_start, n_epochs=total, accumulation_steps=1,
        gradient_clipping=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    traj = []
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(np.asarray(params["w"]))
    return traj


@pytest.mark.parametrize("name,wd", [
    ("Adam", 0.0), ("Adam", 0.05), ("AdamW", 0.05),
    ("SGD", 0.0), ("RMSprop", 0.0),
])
def test_onecycle_momentum_cycling_matches_torch(name, wd, rng_np):
    total = 40
    w0 = rng_np.standard_normal((6, 4)).astype(np.float32)
    grads = [rng_np.standard_normal((6, 4)).astype(np.float32)
             for _ in range(total)]
    want = _torch_trajectory(name, w0, grads, 1e-3, wd, total, 0.3)
    got = _ours_trajectory(name, w0, grads, 1e-3, wd, total, 0.3)
    for step, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-6,
            err_msg=f"{name} diverged at step {step}")


def test_momentum_schedule_shape():
    sched = onecycle_momentum_schedule(100, pct_start=0.3)
    m0 = float(sched(0))
    m_mid = float(sched(29))        # end of warmup ~ base momentum
    m_end = float(sched(99))
    assert m0 == pytest.approx(0.95, abs=1e-3)
    assert m_mid == pytest.approx(0.85, abs=1e-2)
    assert m_end == pytest.approx(0.95, abs=1e-3)


def test_momentum_schedule_gating():
    cfg = TrainingConfig(scheduler="StepLR")
    assert momentum_schedule_for(cfg, 10) is None
    cfg = TrainingConfig(scheduler="CyclicLR",
                         scheduler_cycle_momentum=False)
    assert momentum_schedule_for(cfg, 10) is None
    cfg = TrainingConfig(scheduler="CyclicLR",
                         scheduler_cycle_momentum=True)
    assert momentum_schedule_for(cfg, 10) is not None
    cfg = TrainingConfig(scheduler="OneCycleLR", n_epochs=2)
    assert momentum_schedule_for(cfg, 10) is not None
