"""LR schedules and optimizer updates vs live torch oracles.

torch is available in the image, so the schedules are checked directly
against torch.optim.lr_scheduler step-for-step, and optimizer update
rules against single torch optimizer steps on identical tensors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from movenet_tpu.config import ModelConfig, TrainingConfig
from movenet_tpu.train.optim import (
    cyclic_schedule,
    make_optimizer,
    make_schedule,
    multistep_schedule,
    onecycle_schedule,
    step_schedule,
)


def _torch_lrs(make_sched, steps, lr0=0.1):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = make_sched(opt)
    lrs = []
    for _ in range(steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


def test_onecycle_three_phase_matches_torch():
    import torch

    total = 120
    got = np.array([
        float(onecycle_schedule(0.003, total, pct_start=0.45,
                                three_phase=True)(s))
        for s in range(total)
    ])
    want = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.OneCycleLR(
            o, max_lr=0.003, total_steps=total, pct_start=0.45,
            three_phase=True),
        total)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


@pytest.mark.parametrize("mode,gamma", [
    ("triangular", 1.0), ("triangular2", 1.0), ("exp_range", 0.999)])
def test_cyclic_matches_torch(mode, gamma):
    import torch

    steps = 150
    got = np.array([
        float(cyclic_schedule(3e-4, 3e-3, step_size_up=20,
                              step_size_down=30, mode=mode,
                              gamma=gamma)(s))
        for s in range(steps)
    ])
    want = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.CyclicLR(
            o, base_lr=3e-4, max_lr=3e-3, step_size_up=20,
            step_size_down=30, mode=mode, gamma=gamma,
            cycle_momentum=False),
        steps)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_step_and_multistep_match_torch():
    import torch

    steps = 50
    got = np.array([float(step_schedule(0.1, 10, 0.5)(s))
                    for s in range(steps)])
    want = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=10,
                                                  gamma=0.5), steps)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got = np.array([float(multistep_schedule(0.1, [12, 30, 31], 0.3)(s))
                    for s in range(steps)])
    want = _torch_lrs(
        lambda o: torch.optim.lr_scheduler.MultiStepLR(
            o, milestones=[12, 30, 31], gamma=0.3), steps)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("name,kwargs", [
    ("Adam", {}),
    ("AdamW", {"weight_decay": 0.1}),
    ("Adam", {"weight_decay": 0.1}),
    ("SGD", {"momentum": 0.9}),
    ("RMSprop", {"momentum": 0.9}),
])
def test_optimizer_updates_match_torch(name, kwargs, rng_np):
    import torch

    w0 = rng_np.standard_normal((5, 3)).astype(np.float32)
    grads = [rng_np.standard_normal((5, 3)).astype(np.float32)
             for _ in range(4)]
    lr = 0.01
    wd = kwargs.get("weight_decay", 0.0)
    mom = kwargs.get("momentum", 0.0)

    # --- torch ---
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt_kwargs = {"lr": lr}
    if wd:
        topt_kwargs["weight_decay"] = wd
    if name in ("SGD", "RMSprop") and mom:
        topt_kwargs["momentum"] = mom
    topt = getattr(torch.optim, name)([wt], **topt_kwargs)
    for g in grads:
        topt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        topt.step()
    want = wt.detach().numpy()

    # --- ours ---
    cfg = TrainingConfig(
        model_config=ModelConfig(),
        optimizer=name, learning_rate=lr, weight_decay=wd,
        momentum=mom, scheduler=None, gradient_clipping=0.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    got = np.asarray(params["w"])

    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_gradient_clipping_folded_in():
    cfg = TrainingConfig(optimizer="SGD", learning_rate=1.0,
                         momentum=0.0, scheduler=None,
                         gradient_clipping=1.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros(4)}
    state = tx.init(params)
    big = {"w": jnp.full(4, 100.0)}
    updates, _ = tx.update(big, state, params)
    # clipped to global norm 1 then scaled by lr=1
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(updates["w"])), 1.0, rtol=1e-5)


def test_make_schedule_dispatch():
    cfg = TrainingConfig(scheduler=None, learning_rate=0.5)
    assert float(make_schedule(cfg)(123)) == 0.5
    cfg = TrainingConfig(scheduler="OneCycleLR", n_epochs=2,
                         accumulation_steps=2, max_learning_rate=0.003)
    sched = make_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) > 0
    with pytest.raises(ValueError):
        make_schedule(TrainingConfig(scheduler="Nope"))
