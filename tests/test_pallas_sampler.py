"""Pallas AR sampler kernel correctness (interpret mode on CPU; the
same kernel is verified compiled-on-TPU by bench.py and the verify
drive — greedy output is bit-identical to the scan sampler there too)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from movenet_tpu.config import ModelConfig
from movenet_tpu.models.sampler import fast_generate
from movenet_tpu.models.wavenet import make_wavenet
from movenet_tpu.ops.pallas.ar_sampler import (
    pallas_generate,
    stack_sampler_params,
)


def _model(layer=3, stack=2, c=32, r=16, s=16):
    cfg = ModelConfig(layer_size=layer, stack_size=stack,
                      input_channels=c, residual_channels=r,
                      skip_channels=s, compute_dtype="float32")
    model = make_wavenet(cfg)
    prompt = jnp.zeros((1, model.receptive_fields), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), prompt)
    return model, variables


@pytest.mark.parametrize("layer,stack", [(3, 2), (4, 1)])
def test_pallas_greedy_matches_scan_sampler(layer, stack, rng_np):
    model, variables = _model(layer=layer, stack=stack)
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)), jnp.int32)
    n = rf + 160

    want = np.asarray(fast_generate(model, variables, prompt, n,
                                    temperature=0.0))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_batched_matches_scan_sampler(rng_np):
    model, variables = _model()
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(4, rf)), jnp.int32)
    n = rf + 96
    want = np.asarray(fast_generate(model, variables, prompt, n,
                                    temperature=0.0))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_video_conditioned_matches_scan_sampler(rng_np):
    import jax
    from movenet_tpu.models.wavenet import WaveNet as WN

    from movenet_tpu.config import ModelConfig
    from movenet_tpu.models.wavenet import make_wavenet

    cfg = ModelConfig(layer_size=3, stack_size=1, input_channels=32,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32",
                      max_audio_frames=1000, max_video_frames=1)
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(2, rf)), jnp.int32)
    video = jnp.asarray(rng_np.standard_normal((2, 1, 16, 16, 1)),
                        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), prompt, video,
                           method=WN.init_all)
    n = rf + 80
    want = np.asarray(fast_generate(model, variables, prompt, n,
                                    temperature=0.0, video=video))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, video=video,
                                     interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_rejects_bad_batches_and_short_n(rng_np):
    model, variables = _model()
    rf = model.receptive_fields
    with pytest.raises(ValueError):
        pallas_generate(model, variables,
                        jnp.zeros((3, rf), jnp.int32), rf + 10,
                        interpret=True)
    with pytest.raises(ValueError):
        pallas_generate(model, variables,
                        jnp.zeros((1, rf), jnp.int32), rf,
                        interpret=True)


def test_stacked_params_shapes():
    model, variables = _model(layer=3, stack=2, c=32, r=16, s=16)
    sp = stack_sampler_params(model, variables)
    n_layers = len(model.dilations)
    assert sp["w_fg"].shape == (n_layers, 32, 32)   # [cur; past]
    assert sp["b_fg"].shape == (n_layers, 32)       # zeros w/o context
    assert sp["w_out"].shape == (n_layers, 16, 32)
    assert sp["b_out"].shape == (n_layers, 32)
    assert sp["front_cur"].shape == (32, 16)


def test_pallas_fast_mode_matches_exact(rng_np):
    """fast=True reassociates fp math (one dependent matmul per layer),
    so it is not bit-equal by construction; with a sharpened head the
    greedy decisions have margin and the trajectories must coincide."""
    model, variables = _model()
    p = variables["params"]
    p = dict(p)
    p["head2"] = dict(p["head2"],
                      kernel=jnp.asarray(p["head2"]["kernel"]) * 10.0)
    variables = {"params": p}
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)), jnp.int32)
    n = rf + 160
    exact = np.asarray(pallas_generate(model, variables, prompt, n,
                                       temperature=0.0, interpret=True))
    fast = np.asarray(pallas_generate(model, variables, prompt, n,
                                      temperature=0.0, interpret=True,
                                      fast=True))
    np.testing.assert_array_equal(fast, exact)


def test_pallas_fast_mode_video(rng_np):
    from movenet_tpu.models.wavenet import WaveNet as WN

    cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32",
                      max_audio_frames=1000, max_video_frames=1)
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)), jnp.int32)
    video = jnp.asarray(rng_np.standard_normal((1, 1, 64, 64, 1)),
                        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), prompt, video,
                           method=WN.init_all)
    p = dict(variables["params"])
    p["head2"] = dict(p["head2"],
                      kernel=jnp.asarray(p["head2"]["kernel"]) * 10.0)
    variables = {"params": p}
    n = rf + 128
    exact = np.asarray(pallas_generate(model, variables, prompt, n,
                                       temperature=0.0, video=video,
                                       interpret=True))
    fast = np.asarray(pallas_generate(model, variables, prompt, n,
                                      temperature=0.0, video=video,
                                      interpret=True, fast=True))
    np.testing.assert_array_equal(fast, exact)


def test_pallas_speculative_matches_exact_random(rng_np):
    """Miss-dominated regime (random weights): output must be
    bit-identical to the exact kernel anyway."""
    model, variables = _model()
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)), jnp.int32)
    n = rf + 161  # odd count: exercises the final-sample hit guard
    want = np.asarray(pallas_generate(model, variables, prompt, n,
                                      temperature=0.0, interpret=True))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, interpret=True,
                                     speculative=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_speculative_matches_exact_trained(rng_np):
    """Hit-rich regime: a sine-overfit model whose greedy continuation
    the prompt 2-gram table predicts well — exercises the spec ring
    commits and double emission, which must stay bit-identical."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 200
    want = np.asarray(pallas_generate(model, trained, prompt, n,
                                      temperature=0.0, interpret=True))
    got = np.asarray(pallas_generate(model, trained, prompt, n,
                                     temperature=0.0, interpret=True,
                                     speculative=True))
    np.testing.assert_array_equal(got, want)


@functools.lru_cache(maxsize=2)
def _trained_sine(layer=3, stack=2, c=32, r=16, s=16, steps=150):
    # cached: seven tests share the identical deterministic overfit —
    # train it once per process (params are immutable jax arrays)
    from movenet_tpu.utils.fixtures import sine_wave, train_overfit

    return train_overfit(sine_wave(), c=c, layer=layer, stack=stack,
                         r=r, s=s, steps=steps)


def test_pallas_speculative_adaptive_guesser_beats_frozen():
    """The learned 2-gram side table (round-3 VERDICT item 7) must (a)
    keep the output bit-identical to the exact kernel — the guess only
    ever changes the hit RATE — and (b) hit at least as often as the
    frozen prompt table: the RF-length prompt covers a fraction of one
    sine period, so most continuation transitions are unseen at start
    and only the adaptive table can learn them."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 200
    want = np.asarray(pallas_generate(model, trained, prompt, n,
                                      temperature=0.0, interpret=True))
    got_f, hits_f = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        speculative=True, spec_adaptive=False, return_stats=True)
    got_a, hits_a = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        speculative=True, spec_adaptive=True, return_stats=True)
    np.testing.assert_array_equal(np.asarray(got_f), want)
    np.testing.assert_array_equal(np.asarray(got_a), want)
    # measured (deterministic seeds): frozen 12 hits, adaptive
    # (3-gram default) 89 over 200 samples — the online table is the
    # difference between speculation being a no-op and a ~1.8x win
    assert int(hits_a) > int(hits_f)
    # hits are committed pairs: 2*hits + misses == 200 samples
    assert 0 <= int(hits_a) <= 100


def test_pallas_speculative_order3_beats_order2():
    """The learned 3-gram pair table (round 4) must (a) keep the
    output bit-identical — for ANY guess source the kernel only
    commits on argmax agreement — and (b) out-hit the 2-gram on a
    quasi-periodic signal: the same code occurs on both the rising and
    the falling edge of the sine, so the 2-gram's single successor row
    is wrong half the time while the (x_{t-1}, x_t) pair
    disambiguates the direction.  Measured (deterministic seeds, 400
    samples): order 2 = 90 hits (1.29x), order 3 = 177 (1.79x)."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 400
    want = np.asarray(pallas_generate(model, trained, prompt, n,
                                      temperature=0.0, interpret=True))
    got2, hits2 = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        speculative=True, spec_order=2, return_stats=True)
    got3, hits3 = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        speculative=True, spec_order=3, return_stats=True)
    np.testing.assert_array_equal(np.asarray(got2), want)
    np.testing.assert_array_equal(np.asarray(got3), want)
    assert int(hits3) > int(hits2)


def test_pallas_spec_order_validation():
    model, variables = _model()
    rf = model.receptive_fields
    with pytest.raises(ValueError, match="spec_order"):
        pallas_generate(model, variables,
                        jnp.zeros((1, rf), jnp.int32), rf + 8,
                        temperature=0.0, interpret=True,
                        speculative=True, spec_order=4)
    with pytest.raises(ValueError, match="spec_depth"):
        pallas_generate(model, variables,
                        jnp.zeros((1, rf), jnp.int32), rf + 8,
                        temperature=0.0, interpret=True,
                        speculative=True, spec_depth=3)


def test_pallas_speculative_depth2_fast_matches_fast():
    """Depth-2 on the packed fast wavefront (serve's default kernel
    variant): output must bit-match the non-speculative fast kernel,
    and the second hop must out-commit depth 1."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 400
    want = np.asarray(pallas_generate(model, trained, prompt, n,
                                      temperature=0.0, interpret=True,
                                      fast=True))
    got1, hits1 = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        fast=True, speculative=True, spec_depth=1, return_stats=True)
    got2, hits2 = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        fast=True, speculative=True, spec_depth=2, return_stats=True)
    np.testing.assert_array_equal(np.asarray(got1), want)
    np.testing.assert_array_equal(np.asarray(got2), want)
    assert int(hits2) > int(hits1)


def test_pallas_speculative_depth2_matches_exact_trained():
    """Depth-2 speculation (flag-gated, default depth 1) runs a THIRD
    chain skewed two layers and commits up to three samples per
    iteration when both guesses agree with the real argmax chain.
    Output must stay bit-identical for any guess pair, and on the
    predictable sine fixture the second hop must raise the multiplier
    (measured: 1.79x depth-1 -> 2.14x depth-2 over 400 samples)."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 400
    want = np.asarray(pallas_generate(model, trained, prompt, n,
                                      temperature=0.0, interpret=True))
    got1, hits1 = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        speculative=True, spec_depth=1, return_stats=True)
    got2, hits2 = pallas_generate(
        model, trained, prompt, n, temperature=0.0, interpret=True,
        speculative=True, spec_depth=2, return_stats=True)
    np.testing.assert_array_equal(np.asarray(got1), want)
    np.testing.assert_array_equal(np.asarray(got2), want)
    # hits count COMMITTED speculative samples; with two hops a single
    # iteration can commit two of them
    assert int(hits2) > int(hits1)
    assert 0 <= int(hits2) <= (2 * 400) // 3 + 1


def test_pallas_speculative_depth2_odd_tail(rng_np):
    """Random weights (miss-rich) + an n that can land the final
    sample on either speculative hop: the t+1/t+2 boundary guards must
    never emit past n_samples."""
    model, variables = _model()
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)),
                         jnp.int32)
    for extra in (161, 129, 130):
        n = rf + extra
        want = np.asarray(pallas_generate(model, variables, prompt, n,
                                          temperature=0.0,
                                          interpret=True))
        got = np.asarray(pallas_generate(
            model, variables, prompt, n, temperature=0.0,
            interpret=True, speculative=True, spec_depth=2))
        np.testing.assert_array_equal(got, want)


def test_pallas_speculative_depth2_sampled(rng_np):
    """Sampled depth-2: positional Gumbel keys by absolute position,
    so the three-at-a-time wavefront still reproduces the standard
    kernel's stream bit-exactly."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 161
    kw = dict(temperature=0.3, seed=7, interpret=True)
    want = np.asarray(pallas_generate(model, trained, prompt, n, **kw))
    got, _ = pallas_generate(model, trained, prompt, n,
                             speculative=True, spec_depth=2,
                             return_stats=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pallas_return_stats_requires_speculative():
    model, variables = _model()
    rf = model.receptive_fields
    with pytest.raises(ValueError, match="return_stats"):
        pallas_generate(model, variables,
                        jnp.zeros((1, rf), jnp.int32), rf + 8,
                        temperature=0.0, interpret=True,
                        return_stats=True)


def test_positional_gumbel_statistics():
    """The counter-based Gumbel source must actually be Gumbel(0,1):
    mean ~ Euler-Mascheroni (0.5772), var ~ pi^2/6 (1.6449), and
    positions/seeds must decorrelate (bit-level hash quality is
    lowbias32's job; this guards wiring mistakes like reused
    indices)."""
    import jax.numpy as jnp

    from movenet_tpu.ops.pallas.ar_sampler import _positional_gumbel

    draws = np.stack([
        np.asarray(_positional_gumbel(jnp.int32(7), jnp.int32(t),
                                      4, 256))
        for t in range(100)])                     # (100, 4, 256)
    flat = draws.reshape(-1)
    assert abs(flat.mean() - 0.5772) < 0.02
    assert abs(flat.var() - 1.6449) < 0.06
    # different positions give different noise
    assert not np.array_equal(draws[0], draws[1])
    # different seeds give different noise at the same position
    other = np.asarray(_positional_gumbel(jnp.int32(8), jnp.int32(0),
                                          4, 256))
    assert not np.array_equal(draws[0], other)
    # deterministic: same (seed, t) -> same noise
    again = np.asarray(_positional_gumbel(jnp.int32(7), jnp.int32(0),
                                          4, 256))
    np.testing.assert_array_equal(draws[0], again)


def test_pallas_speculative_rejects_unsupported(rng_np):
    model, variables = _model()
    rf = model.receptive_fields
    p2 = jnp.asarray(rng_np.integers(0, 32, size=(2, rf)), jnp.int32)
    with pytest.raises(ValueError, match="speculative"):
        pallas_generate(model, variables, p2, rf + 8, temperature=0.0,
                        interpret=True, speculative=True)
    p1 = p2[:1]
    video = jnp.zeros((1, 1, 16, 16, 1), jnp.float32)
    with pytest.raises(ValueError, match="speculative"):
        pallas_generate(model, variables, p1, rf + 8, temperature=0.0,
                        video=video, interpret=True, speculative=True)


@pytest.mark.parametrize("parity,fast", [(True, False), (False, False),
                                         (True, True)])
def test_pallas_speculative_sampled_matches_standard(parity, fast,
                                                     rng_np):
    """Round 4: speculation extends to temperature sampling.  Both
    kernels draw POSITIONAL Gumbel noise keyed on (seed, position), so
    the speculative kernel reproduces the standard kernel's sampled
    stream bit-exactly even though it evaluates two positions per
    iteration (a commit requires the SAMPLED next code to equal the
    guess)."""
    model, variables = _model()
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)),
                         jnp.int32)
    n = rf + 120
    kw = dict(temperature=0.9, seed=11, parity_sampling=parity,
              fast=fast, interpret=True)
    want = np.asarray(pallas_generate(model, variables, prompt, n,
                                      **kw))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     speculative=True, **kw))
    np.testing.assert_array_equal(got, want)
    # determinism: same seed -> same stream
    again = np.asarray(pallas_generate(model, variables, prompt, n,
                                       speculative=True, **kw))
    np.testing.assert_array_equal(again, got)


def test_pallas_speculative_sampled_trained_hits():
    """On the trained sine model at a mild temperature, sampled
    speculation must stay bit-identical AND still commit some guesses
    (the model is confident, so P[sample == mode] stays high)."""
    model, trained, codes = _trained_sine()
    rf = model.receptive_fields
    prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    n = rf + 200
    kw = dict(temperature=0.5, seed=3, interpret=True)
    want = np.asarray(pallas_generate(model, trained, prompt, n, **kw))
    got, hits = pallas_generate(model, trained, prompt, n,
                                speculative=True, return_stats=True,
                                **kw)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(hits) > 0


@pytest.mark.parametrize("trained", [False, True])
def test_pallas_speculative_fast_matches_fast(trained, rng_np):
    """fast+speculative must be bit-identical to the fast kernel (both
    fp-reassociated the same way), in both miss- and hit-rich
    regimes."""
    if trained:
        import optax

        from movenet_tpu.data.preprocess import mu_law_encode_np

        cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                          residual_channels=16, skip_channels=16,
                          compute_dtype="float32")
        model = make_wavenet(cfg)
        rf = model.receptive_fields
        wave = np.sin(np.arange(0, 60, 0.15))
        codes = mu_law_encode_np(wave, 32)
        cj = jnp.asarray(np.tile(codes[None], (2, 1)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), cj)["params"]
        tx = optax.adam(5e-3)
        opt = tx.init(params)

        def loss_fn(p):
            logits = model.apply({"params": p}, cj,
                                 method=model.train_logits)
            tgt = cj[:, rf:]
            nll = jax.nn.logsumexp(logits, -1) - jnp.take_along_axis(
                logits, tgt[..., None], -1)[..., 0]
            return nll.mean()

        step = jax.jit(lambda p, o: (lambda g: tx.update(g, o, p))(
            jax.grad(loss_fn)(p)))
        for _ in range(120):
            updates, opt = step(params, opt)
            params = optax.apply_updates(params, updates)
        variables = {"params": params}
        prompt = jnp.asarray(codes[None, :rf], jnp.int32)
    else:
        model, variables = _model()
        rf = model.receptive_fields
        prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)),
                             jnp.int32)
    n = rf + 150
    want = np.asarray(pallas_generate(model, variables, prompt, n,
                                      temperature=0.0, interpret=True,
                                      fast=True))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, interpret=True,
                                     fast=True, speculative=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_speculative_with_global_labels(rng_np):
    """Global (category) conditioning folds into the per-layer fg bias
    rows; the speculative kernel must carry it identically."""
    cfg = ModelConfig(layer_size=3, stack_size=2, input_channels=32,
                      residual_channels=16, skip_channels=16,
                      compute_dtype="float32", global_classes=4)
    model = make_wavenet(cfg)
    rf = model.receptive_fields
    prompt = jnp.asarray(rng_np.integers(0, 32, size=(1, rf)), jnp.int32)
    labels = jnp.asarray([2], jnp.int32)
    from movenet_tpu.models.wavenet import WaveNet
    variables = model.init(jax.random.PRNGKey(1), prompt, None, labels,
                           method=WaveNet.init_all)
    n = rf + 96
    want = np.asarray(pallas_generate(model, variables, prompt, n,
                                      temperature=0.0, labels=labels,
                                      interpret=True))
    got = np.asarray(pallas_generate(model, variables, prompt, n,
                                     temperature=0.0, labels=labels,
                                     interpret=True, speculative=True))
    np.testing.assert_array_equal(got, want)
