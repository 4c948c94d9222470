"""Cached-sampler correctness: the incremental ring-buffer computation
must reproduce the parallel forward pass exactly, and fast generation
must agree with the reference's O(T*RF) windowed algorithm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.models.wavenet import WaveNet
from movenet_tpu.models.sampler import (
    fast_generate,
    incremental_logits,
    naive_generate,
)


def _model(layer=3, stack=2, c=16, r=8, s=8, video=False):
    m = WaveNet(layer_size=layer, stack_size=stack, input_channels=c,
                residual_channels=r, skip_channels=s,
                compute_dtype=jnp.float32)
    codes = jnp.zeros((2, 64), jnp.int32)
    if video:
        vid = jnp.zeros((2, 160, 8, 8, 1))
        v = m.init(jax.random.PRNGKey(0), codes, vid,
                   method=WaveNet.init_all)
    else:
        v = m.init(jax.random.PRNGKey(0), codes)
    return m, v


@pytest.mark.parametrize("layer,stack", [(3, 2), (2, 3), (4, 1)])
def test_incremental_equals_parallel_forward(layer, stack, rng_np):
    model, variables = _model(layer=layer, stack=stack)
    t = 64
    codes = jnp.asarray(rng_np.integers(0, 16, size=(2, t)), jnp.int32)

    parallel = model.apply(variables, codes, None, method=WaveNet.backbone)
    inc = incremental_logits(model, variables, codes)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(parallel),
                               rtol=1e-4, atol=1e-5)


def test_incremental_equals_parallel_with_video(rng_np):
    model, variables = _model(video=True)
    t = 64
    codes = jnp.asarray(rng_np.integers(0, 16, size=(2, t)), jnp.int32)
    video = jnp.asarray(rng_np.standard_normal((2, 160, 8, 8, 1)),
                        jnp.float32)

    ctx = model.apply(variables, video, method=WaveNet.encode_video)
    parallel = model.apply(variables, codes, ctx[:, :t],
                           method=WaveNet.backbone)
    inc = incremental_logits(model, variables, codes, video=video)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(parallel),
                               rtol=1e-4, atol=1e-5)


def test_fast_matches_naive_greedy(rng_np):
    model, variables = _model()
    rf = model.receptive_fields
    n = rf + 40
    prompt = jnp.asarray(rng_np.integers(0, 16, size=(2, rf)), jnp.int32)

    fast = fast_generate(model, variables, prompt, n, temperature=0.0)
    naive = naive_generate(model, variables, prompt, n, temperature=0.0)
    assert fast.shape == naive.shape == (2, n)
    # prompt region passes through untouched
    np.testing.assert_array_equal(np.asarray(fast[:, :rf]),
                                  np.asarray(prompt))
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(naive))


def test_fast_generate_stochastic_is_reproducible(rng_np):
    model, variables = _model()
    rf = model.receptive_fields
    n = rf + 16
    prompt = jnp.asarray(rng_np.integers(0, 16, size=(1, rf)), jnp.int32)
    key = jax.random.PRNGKey(7)

    a = fast_generate(model, variables, prompt, n, temperature=1.0, rng=key)
    b = fast_generate(model, variables, prompt, n, temperature=1.0, rng=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fast_generate(model, variables, prompt, n, temperature=1.0,
                      rng=jax.random.PRNGKey(8))
    assert (np.asarray(a) != np.asarray(c)).any()


def test_parity_vs_clean_sampling_differ(rng_np):
    # the double-softmax parity path (reference wavenet.py:227-233) is a
    # different distribution from clean softmax(logits/T) sampling
    model, variables = _model()
    rf = model.receptive_fields
    n = rf + 32
    prompt = jnp.asarray(rng_np.integers(0, 16, size=(1, rf)), jnp.int32)
    key = jax.random.PRNGKey(3)
    par = fast_generate(model, variables, prompt, n, temperature=0.5,
                        rng=key, parity_sampling=True)
    cln = fast_generate(model, variables, prompt, n, temperature=0.5,
                        rng=key, parity_sampling=False)
    assert (np.asarray(par) != np.asarray(cln)).any()
