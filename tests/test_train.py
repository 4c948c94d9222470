"""Train-loop behavior: sine-wave overfit (the reference's golden test,
tests/test_model.py:41-112, with real assertions added), gradient
accumulation equivalence, and checkpoint save/restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import ModelConfig, TrainingConfig
from movenet_tpu.models import WaveNet, fast_generate
from movenet_tpu.models.wavenet import make_wavenet
from movenet_tpu.ops import mu_law_decode, mu_law_encode
from movenet_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from movenet_tpu.train.loop import Batch


def _sine64(t=1024, batch=4):
    wave = jnp.asarray(np.sin(np.arange(0, t / 10.0, 0.1)),
                       dtype=jnp.float32)[:t]
    q = mu_law_encode(wave, 64)
    return jnp.tile(q[None, :], (batch, 1))


def _cfg(**kw):
    model = kw.pop("model", None) or ModelConfig(
        layer_size=6, stack_size=1, input_channels=64,
        residual_channels=24, skip_channels=24,
        compute_dtype="float32")
    defaults = dict(optimizer="Adam", learning_rate=3e-3, scheduler=None,
                    gradient_clipping=0.0, accumulation_steps=1)
    defaults.update(kw)
    return TrainingConfig(model_config=model, **defaults)


def test_sine_overfit_and_generate():
    """Teacher-forced overfit on the sine fixture, then greedy
    generation continues the waveform — the end-to-end golden test."""
    config = _cfg()
    model = make_wavenet(config.model_config)
    rf = model.receptive_fields
    codes = _sine64(1024)

    tx = make_optimizer(config)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0),
                               Batch(codes=codes))
    train_step = jax.jit(make_train_step(model, config))

    losses = []
    for _ in range(350):
        state, metrics = train_step(state, Batch(codes=codes))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.2, (losses[0], losses[-1])
    assert float(metrics["accuracy"]) > 0.5, metrics
    assert int(state.step) == 350

    # greedy continuation must track the true wave
    n = rf + 200
    gen = fast_generate(model, {"params": state.params}, codes[:1, :rf],
                        n, temperature=0.0)
    out = np.asarray(mu_law_decode(gen[0, rf:], 64))
    tgt = np.asarray(mu_law_decode(codes[0, rf:n], 64))
    assert np.abs(out - tgt).mean() < 0.15


def test_grad_accumulation_equals_big_batch():
    """A=2 microbatches of B=2 must produce the same update as one B=4
    batch (same params, mean-of-gradients linearity of CE mean...
    note: mean over examples is identical since microbatches are equal
    sized)."""
    codes = _sine64(256)

    cfg1 = _cfg(accumulation_steps=1, optimizer="SGD", momentum=0.0,
                learning_rate=0.1)
    cfg2 = _cfg(accumulation_steps=2, optimizer="SGD", momentum=0.0,
                learning_rate=0.1)
    model = make_wavenet(cfg1.model_config)

    state1 = create_train_state(model, cfg1, make_optimizer(cfg1),
                                jax.random.PRNGKey(1), Batch(codes=codes))
    state2 = state1.replace(tx=make_optimizer(cfg2))

    big = Batch(codes=codes)                            # (4, T)
    micro = Batch(codes=codes.reshape(2, 2, -1))        # (2, 2, T)

    s1, m1 = jax.jit(make_train_step(model, cfg1))(state1, big)
    s2, m2 = jax.jit(make_train_step(model, cfg2))(state2, micro)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s1.params, s2.params)


def test_parity_vs_clean_loss_differ():
    codes = _sine64(256)
    cfg_p = _cfg()
    cfg_c = _cfg(model=ModelConfig(
        layer_size=6, stack_size=1, input_channels=64,
        residual_channels=24, skip_channels=24,
        compute_dtype="float32", parity_softmax_output=False))
    model = make_wavenet(cfg_p.model_config)
    state = create_train_state(model, cfg_p, make_optimizer(cfg_p),
                               jax.random.PRNGKey(0), Batch(codes=codes))
    m_p = make_eval_step(model, cfg_p)(state, Batch(codes=codes))
    m_c = make_eval_step(model, cfg_c)(state, Batch(codes=codes))
    # CE-on-softmax compresses the logit range; losses must differ
    assert abs(float(m_p["loss"]) - float(m_c["loss"])) > 1e-4
    # at init, CE-on-softmax sits near log(C) and slightly above clean CE
    assert float(m_p["loss"]) == pytest.approx(np.log(64), rel=0.05)


def test_checkpoint_roundtrip(tmp_path):
    config = _cfg()
    model = make_wavenet(config.model_config)
    codes = _sine64(256)
    tx = make_optimizer(config)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0),
                               Batch(codes=codes))
    step_fn = jax.jit(make_train_step(model, config))
    for _ in range(3):
        state, _ = step_fn(state, Batch(codes=codes))

    save_checkpoint(tmp_path / "run", 3, state, config=config)
    assert (tmp_path / "run" / "config.json").exists()

    fresh = create_train_state(model, config, tx, jax.random.PRNGKey(9),
                               Batch(codes=codes))
    restored = restore_checkpoint(tmp_path / "run", fresh)
    assert int(restored.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, state.params)

    # training continues identically from the restored state
    s_a, m_a = step_fn(state, Batch(codes=codes))
    s_b, m_b = step_fn(restored, Batch(codes=codes))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)


def test_legacy_checkpoint_migration(tmp_path):
    """A pre-round-2 checkpoint (per-block block_{i} submodules) must
    restore into the current stacked layout: params bit-identical,
    step preserved, optimizer state reinitialized with a warning."""
    import orbax.checkpoint as ocp

    from movenet_tpu.models.wavenet import block_param_view
    from movenet_tpu.train.checkpoint import (
        CheckpointManager,
        migrate_legacy_block_params,
    )

    config = _cfg()
    model = make_wavenet(config.model_config)
    codes = _sine64(256)
    tx = make_optimizer(config)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0),
                               Batch(codes=codes))
    step_fn = jax.jit(make_train_step(model, config))
    state, _ = step_fn(state, Batch(codes=codes))

    # write a checkpoint in the OLD layout (block_{i} submodules), the
    # exact inverse of block_param_view over the trained params
    legacy = jax.tree.map(
        np.asarray, {k: v for k, v in state.params.items()
                     if not k.startswith("blocks_")})
    n_layers = state.params["blocks_w_cur"].shape[0]
    for i in range(n_layers):
        legacy[f"block_{i}"] = jax.tree.map(
            np.asarray, block_param_view(state.params, i))
    ckpt_dir = tmp_path / "legacy_run" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    mgr = ocp.CheckpointManager(ckpt_dir)
    mgr.save(7, args=ocp.args.StandardSave(
        {"params": legacy,
         "opt_state": {"legacy": np.zeros(3, np.float32)},
         "step": np.asarray(int(state.step))}))
    mgr.wait_until_finished()
    mgr.close()

    fresh = create_train_state(model, config, tx, jax.random.PRNGKey(9),
                               Batch(codes=codes))
    restored = CheckpointManager(tmp_path / "legacy_run").restore(fresh)
    assert int(restored.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, state.params)

    # the pure converter round-trips too
    migrated = migrate_legacy_block_params(legacy)
    assert "block_0" not in migrated
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        migrated, jax.tree.map(np.asarray, dict(state.params)))


def test_checkpoint_with_extra_ctx_leaves_restores(tmp_path):
    """A checkpoint saved before the trainer started dropping unused
    context convs (audio-only run, stacked layout WITH blocks_ctx_*)
    must still resume into today's downgraded template: the extra
    leaves are dropped with a warning, params/step round-trip,
    optimizer state resets (round-3 ADVICE item 1)."""
    import orbax.checkpoint as ocp

    from movenet_tpu.train.checkpoint import CheckpointManager

    config = _cfg(model=ModelConfig(
        layer_size=6, stack_size=1, input_channels=64,
        residual_channels=24, skip_channels=24,
        compute_dtype="float32", use_context=False))
    model = make_wavenet(config.model_config)
    codes = _sine64(256)
    tx = make_optimizer(config)
    state = create_train_state(model, config, tx, jax.random.PRNGKey(0),
                               Batch(codes=codes))
    step_fn = jax.jit(make_train_step(model, config))
    state, _ = step_fn(state, Batch(codes=codes))

    saved = dict(jax.tree.map(np.asarray, dict(state.params)))
    assert "blocks_ctx_kernel" not in saved  # template lacks context
    r = config.model_config.residual_channels
    n_layers = saved["blocks_w_cur"].shape[0]
    saved["blocks_ctx_kernel"] = np.ones((n_layers, 1, 2 * r),
                                         np.float32)
    saved["blocks_ctx_bias"] = np.zeros((n_layers, 2 * r), np.float32)

    ckpt_dir = tmp_path / "ctx_run" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    mgr = ocp.CheckpointManager(ckpt_dir)
    mgr.save(5, args=ocp.args.StandardSave(
        {"params": saved,
         "opt_state": {"stale": np.zeros(3, np.float32)},
         "step": np.asarray(int(state.step))}))
    mgr.wait_until_finished()
    mgr.close()

    fresh = create_train_state(model, config, tx, jax.random.PRNGKey(9),
                               Batch(codes=codes))
    restored = CheckpointManager(tmp_path / "ctx_run").restore(fresh)
    assert int(restored.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, state.params)

    # a genuinely corrupt/missing-leaf checkpoint must still raise
    # (the fallback is scoped to known layout mismatches)
    broken = dict(saved)
    del broken["blocks_ctx_kernel"], broken["blocks_w_cur"]
    ckpt_dir2 = tmp_path / "broken_run" / "checkpoints"
    ckpt_dir2.mkdir(parents=True)
    mgr2 = ocp.CheckpointManager(ckpt_dir2)
    mgr2.save(1, args=ocp.args.StandardSave(
        {"params": broken,
         "opt_state": {"stale": np.zeros(3, np.float32)},
         "step": np.asarray(0)}))
    mgr2.wait_until_finished()
    mgr2.close()
    with pytest.raises(Exception):
        CheckpointManager(tmp_path / "broken_run").restore(fresh)
