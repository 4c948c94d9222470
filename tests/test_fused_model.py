"""Fused-trunk training forward (models/fused.py) vs the flax model:
values and full parameter gradients (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import ModelConfig
from movenet_tpu.models.fused import fused_train_logits, supports_fused
from movenet_tpu.models.wavenet import WaveNet, make_wavenet


@pytest.mark.parametrize("video,glob,strategy",
                         [(False, False, None), (True, True, None),
                          (False, False, "replay")])
def test_fused_trunk_matches_flax(video, glob, strategy, rng_np):
    cfg = ModelConfig(
        layer_size=3, stack_size=2, input_channels=64,
        residual_channels=16, skip_channels=16, compute_dtype="float32",
        global_classes=3 if glob else 0, fused_strategy=strategy,
        max_audio_frames=16000, max_video_frames=16)
    model = make_wavenet(cfg)
    t = 16000 if video else 1024
    assert supports_fused(model, t)
    codes = jnp.asarray(rng_np.integers(0, 64, size=(2, t)), jnp.int32)
    vid = None
    if video:
        vid = jnp.asarray(rng_np.standard_normal((2, 16, 16, 16, 1)),
                          jnp.float32)
    labels = jnp.asarray([0, 2], jnp.int32) if glob else None
    variables = model.init(jax.random.PRNGKey(0), codes, vid, labels,
                           method=WaveNet.init_all)

    want = model.apply(variables, codes, vid, labels,
                       method=WaveNet.train_logits)
    got = fused_train_logits(model, variables["params"], codes, vid,
                             labels, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss_f(p):
        return jnp.mean(jnp.square(fused_train_logits(
            model, p, codes, vid, labels, interpret=True)))

    def loss_u(p):
        return jnp.mean(jnp.square(model.apply(
            {"params": p}, codes, vid, labels,
            method=WaveNet.train_logits)))

    gf = jax.grad(loss_f)(variables["params"])
    gu = jax.grad(loss_u)(variables["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        gf, gu)


@pytest.mark.parametrize("merge_head", [False, True])
@pytest.mark.parametrize("video", [False, True])
def test_fused_train_loss_matches_unfused(video, merge_head, rng_np):
    """The fully-kernelized loss (merged trunk+head/CE kernel) equals
    the unfused loss and gradients exactly."""
    from movenet_tpu.models.fused import fused_train_loss

    cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=64,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32", global_classes=3,
                      max_audio_frames=12800, max_video_frames=128)
    model = make_wavenet(cfg)
    t = 12800 if video else 1024
    codes = jnp.asarray(rng_np.integers(0, 64, size=(2, t)), jnp.int32)
    vid = jnp.asarray(rng_np.standard_normal((2, 128, 64, 64, 1)),
                      jnp.float32) if video else None
    labels = jnp.asarray([0, 2], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes, vid, labels,
                           method=WaveNet.init_all)
    rf = model.receptive_fields

    def unfused(p):
        lg = model.apply({"params": p}, codes, vid, labels,
                         method=WaveNet.train_logits)
        pr = jax.nn.softmax(lg, -1)
        tgt = codes[:, rf:][..., None]
        return (jax.nn.logsumexp(pr, -1, keepdims=True)
                - jnp.take_along_axis(pr, tgt, -1)).mean()

    def fused(p):
        loss, _ = fused_train_loss(model, p, codes, vid, labels,
                                   parity=True, interpret=True,
                                   merge_head=merge_head)
        return loss

    np.testing.assert_allclose(float(fused(variables["params"])),
                               float(unfused(variables["params"])),
                               rtol=1e-6)
    gf = jax.grad(fused)(variables["params"])
    gu = jax.grad(unfused)(variables["params"])

    def close(a, b):
        # the two paths sum ~1e5 f32 terms in different orders with
        # heavy cancellation, so the smallest gradient elements carry
        # up to ~1% of each leaf's max magnitude in jitter (a float64
        # arbiter puts BOTH paths at f32-noise distance from truth);
        # compare at 1% of leaf scale instead of a flat atol
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.max(np.abs(b))) + 1e-12
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-2 * scale)
        # ...but a per-element scale gate is blind to SYSTEMATIC bias
        # (the packed-head episode: ~1e-3 relative gradient offsets
        # that pass one-step checks yet diverge training).  Elementwise
        # jitter is zero-mean, so the per-leaf MEAN of the difference
        # must sit far below the per-element tolerance.
        bias = abs(float(np.mean(a - b)))
        assert bias <= 2e-4 * scale + 1e-10, \
            f"systematic gradient bias {bias:.3e} vs scale {scale:.3e}"

    jax.tree.map(close, gf, gu)


def test_codes_pack_np_matches_device_pack(rng_np):
    """Host (numpy) pack must be bit-identical to the in-device pack —
    the loader ships it straight into the fused kernels."""
    from movenet_tpu.models.fused import _codes_pack, codes_pack_np

    codes = rng_np.integers(0, 64, size=(3, 40))
    dev = np.asarray(_codes_pack(jnp.asarray(codes, jnp.int32),
                                 with_targets=True))
    host = codes_pack_np(codes)
    assert host.dtype == np.int32  # s16 inputs pay a retiling copy
    np.testing.assert_array_equal(dev, host)


def test_fused_train_loss_accepts_host_pack(rng_np):
    from movenet_tpu.models.fused import codes_pack_np, fused_train_loss

    mc = ModelConfig(layer_size=2, stack_size=2, input_channels=16,
                     residual_channels=8, skip_channels=8,
                     compute_dtype="float32", max_audio_frames=1024,
                     max_video_frames=1)
    model = make_wavenet(mc)
    codes = rng_np.integers(0, 16, size=(2, 1024))
    cj = jnp.asarray(codes, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), cj)["params"]
    l0, a0 = fused_train_loss(model, params, cj, interpret=True)
    l1, a1 = fused_train_loss(
        model, params, cj, interpret=True,
        codes_pack=jnp.asarray(codes_pack_np(codes)))
    assert float(l0) == float(l1) and float(a0) == float(a1)
