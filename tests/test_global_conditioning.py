"""Global (dance-category) conditioning — the capability the reference
planned but never built (wavenet.py:73).  Covers model semantics, all
sampler paths, and the data-layer label flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import ModelConfig
from movenet_tpu.models.sampler import fast_generate, incremental_logits
from movenet_tpu.models.wavenet import WaveNet, make_wavenet
from movenet_tpu.ops.pallas.ar_sampler import pallas_generate


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32", global_classes=4)
    model = make_wavenet(cfg)
    codes = jnp.zeros((2, 64), jnp.int32)
    labels = jnp.asarray([0, 1], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes, None, labels,
                           method=WaveNet.init_all)
    return model, variables


def test_labels_change_the_output(setup, rng_np):
    model, variables = setup
    codes = jnp.asarray(rng_np.integers(0, 32, size=(1, 64)), jnp.int32)
    a = model.apply(variables, codes, None, jnp.asarray([0]),
                    output_unnormalized=False)
    b = model.apply(variables, codes, None, jnp.asarray([2]),
                    output_unnormalized=False)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5
    # omitting labels (no conditioning) also differs from any class
    c = model.apply(variables, codes, output_unnormalized=False)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-5


def test_incremental_matches_parallel_with_labels(setup, rng_np):
    model, variables = setup
    codes = jnp.asarray(rng_np.integers(0, 32, size=(2, 64)), jnp.int32)
    labels = jnp.asarray([1, 3], jnp.int32)
    gv = model.apply(variables, labels, method=WaveNet.embed_global)
    parallel = model.apply(variables, codes, None, gv,
                           method=WaveNet.backbone)
    inc = incremental_logits(model, variables, codes, labels=labels)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(parallel),
                               rtol=1e-4, atol=1e-5)


def test_pallas_matches_scan_with_labels(setup, rng_np):
    model, variables = setup
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(2, rf)), jnp.int32)
    labels = jnp.asarray([0, 3], jnp.int32)
    n = rf + 96
    want = np.asarray(fast_generate(model, variables, prompt, n,
                                    temperature=0.0, labels=labels))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, labels=labels,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)
    # and conditioning actually steers generation
    other = np.asarray(fast_generate(model, variables, prompt, n,
                                     temperature=0.0,
                                     labels=jnp.asarray([1, 1])))
    assert (want != other).any()


def test_loader_emits_labels(tmp_path):
    from movenet_tpu.data import get_dataloader, make_synthetic_dataset

    root = tmp_path / "ds"
    make_synthetic_dataset(root, categories=["alpha", "beta"],
                           clips_per_category=2, duration_s=0.5,
                           audio_fps=2000, video_fps=4, seed=1)
    loader = get_dataloader(root, input_channels=32, batch_size=2,
                            train=True, use_video=False, shuffle=False,
                            num_workers=1, max_audio_frames=1000,
                            max_video_frames=4)
    batch = next(iter(loader.epoch(0)))
    assert batch.labels.shape == (2,)
    assert set(loader.context_to_id.values()) == {0, 1}
    # unshuffled: first two clips are category alpha -> label 0
    np.testing.assert_array_equal(batch.labels, [0, 0])


def test_train_step_with_global_conditioning(setup, rng_np):
    from movenet_tpu.config import TrainingConfig
    from movenet_tpu.train import create_train_state, make_optimizer, \
        make_train_step
    from movenet_tpu.train.loop import Batch

    model, variables = setup
    cfg = TrainingConfig(
        model_config=ModelConfig(
            layer_size=3, stack_size=2, input_channels=32,
            residual_channels=16, skip_channels=16,
            compute_dtype="float32", global_classes=4),
        optimizer="Adam", learning_rate=1e-3, scheduler=None)
    codes = np.asarray(rng_np.integers(0, 32, size=(2, 64)), np.int32)
    batch = Batch(codes=codes, labels=np.asarray([0, 2], np.int32))
    state = create_train_state(model, cfg, make_optimizer(cfg),
                               jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # the global projection receives gradient
    assert "blocks_global_kernel" in state.params
    g = state.params["blocks_global_kernel"][0]
