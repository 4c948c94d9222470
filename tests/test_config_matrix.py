"""Config-combination smoke matrix: every optimizer/scheduler pair and
the experiment-shaped configs run one real train step end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import ModelConfig, TrainingConfig
from movenet_tpu.models.wavenet import make_wavenet
from movenet_tpu.train import create_train_state, make_optimizer, \
    make_train_step
from movenet_tpu.train.optim import make_schedule
from movenet_tpu.train.loop import Batch


def _one_step(cfg, video=False, accum=1, t=512):
    model = make_wavenet(cfg.model_config)
    rng = np.random.default_rng(0)
    b = cfg.batch_size * accum
    codes = rng.integers(0, cfg.model_config.input_channels,
                         size=(b, t)).astype(np.int32)
    vid = None
    if video:
        f = t // 100
        vid = rng.standard_normal((b, f, 16, 16, 1)).astype(np.float32)
    if accum > 1:
        codes = codes.reshape(accum, cfg.batch_size, t)
        vid = None if vid is None else vid.reshape(
            accum, cfg.batch_size, *vid.shape[1:])
    batch = Batch(codes=codes, video=vid)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    sched = make_schedule(cfg, steps_per_epoch=4)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0),
                               batch, lr_schedule=sched)
    step = jax.jit(make_train_step(model, cfg))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"])), (cfg.optimizer, cfg.scheduler)
    return float(m["loss"])


_MODEL = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                     residual_channels=16, skip_channels=16,
                     compute_dtype="float32", max_audio_frames=512,
                     max_video_frames=5)


@pytest.mark.parametrize("opt", ["Adam", "AdamW", "SGD", "RMSprop"])
@pytest.mark.parametrize("sched", [None, "OneCycleLR", "CyclicLR",
                                   "StepLR", "MultiStepLR"])
def test_optimizer_scheduler_matrix(opt, sched):
    cfg = TrainingConfig(
        model_config=_MODEL, optimizer=opt, learning_rate=1e-3,
        scheduler=sched, n_epochs=2, batch_size=2,
        scheduler_milestones=[2, 5] if sched == "MultiStepLR" else None,
        scheduler_cycle_momentum=(sched == "CyclicLR"),
        gradient_clipping=1.0)
    _one_step(cfg)


def test_accumulation_with_schedule_and_clip():
    cfg = TrainingConfig(
        model_config=_MODEL, optimizer="AdamW", learning_rate=3e-4,
        scheduler="OneCycleLR", n_epochs=2, batch_size=2,
        accumulation_steps=3, gradient_clipping=10.0)
    _one_step(cfg, accum=3)


def test_video_conditioned_step():
    model = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                        residual_channels=16, skip_channels=16,
                        compute_dtype="float32", max_audio_frames=500,
                        max_video_frames=5)
    cfg = TrainingConfig(model_config=model, optimizer="Adam",
                         learning_rate=1e-3, scheduler=None,
                         batch_size=2)
    _one_step(cfg, video=True, t=500)
