"""Golden tests for core numerics: mu-law codec, normalization,
one-hot, resampler, receptive-field math.

Oracles are independent implementations: closed-form float64 numpy for
mu-law/normalization, and a torch re-statement of torchaudio's published
sinc_interp_hann algorithm for the resampler (torch is an allowed test
dependency; torchaudio itself is not installed in this image)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from movenet_tpu.ops import (
    mu_law_encode,
    mu_law_decode,
    normalize_audio,
    one_hot_encode_audio,
    receptive_field,
    resample,
    resample_to_length,
    wavenet_dilations,
)


# ---------------------------------------------------------------- mu-law
def _mulaw_encode_oracle(x, qc):
    mu = qc - 1.0
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return ((y + 1) / 2 * mu + 0.5).astype(np.int64)


def _mulaw_decode_oracle(q, qc):
    mu = qc - 1.0
    y = q.astype(np.float64) / mu * 2 - 1.0
    return np.sign(y) * (np.exp(np.abs(y) * np.log1p(mu)) - 1.0) / mu


@pytest.mark.parametrize("qc", [16, 64, 128, 256])
def test_mulaw_encode_matches_oracle(qc):
    x = np.linspace(-1, 1, 4097).astype(np.float32)
    got = np.asarray(mu_law_encode(jnp.asarray(x), qc))
    want = _mulaw_encode_oracle(x.astype(np.float64), qc)
    # float32-vs-float64 boundary effects may move a code by at most 1
    # at quantization-bin edges; require exactness away from edges.
    diff = np.abs(got.astype(np.int64) - want)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_mulaw_encode_known_values():
    # endpoints and zero are exact by construction
    x = jnp.asarray([-1.0, 0.0, 1.0], dtype=jnp.float32)
    got = np.asarray(mu_law_encode(x, 256))
    # x=0 -> ((0+1)/2*255 + 0.5) = 128.0 -> code 128 (torchaudio identical)
    np.testing.assert_array_equal(got, [0, 128, 255])


@pytest.mark.parametrize("qc", [16, 256])
def test_mulaw_roundtrip(qc):
    q = np.arange(qc)
    dec = np.asarray(mu_law_decode(jnp.asarray(q), qc))
    want = _mulaw_decode_oracle(q, qc)
    np.testing.assert_allclose(dec, want, rtol=1e-5, atol=1e-6)
    # re-encoding the decoded values is the identity
    q2 = np.asarray(mu_law_encode(jnp.asarray(dec), qc))
    np.testing.assert_array_equal(q2, q)


def test_mulaw_sine_matches_reference_fixture():
    # the reference's sine fixture values (tests/test_model.py:20-27)
    wave = np.sin(np.arange(0, 400, 0.1))
    got = np.asarray(mu_law_encode(jnp.asarray(wave, jnp.float32), 256))
    want = _mulaw_encode_oracle(wave, 256)
    assert (got == want).mean() > 0.999


# ------------------------------------------------------------- normalize
def test_normalize_audio_minmax():
    x = jnp.asarray([1.0, 2.0, 5.0])
    got = np.asarray(normalize_audio(x))
    np.testing.assert_allclose(got, [-1.0, -0.5, 1.0], atol=1e-6)


def test_normalize_audio_zero_guard():
    # all-zero signal returned unchanged (dataset.py:267-269)
    x = jnp.zeros(10)
    np.testing.assert_array_equal(np.asarray(normalize_audio(x)), 0.0)


def test_one_hot_encode_audio_shape_and_validity():
    x = jnp.asarray(np.sin(np.linspace(0, 7, 100)), dtype=jnp.float32)
    oh = np.asarray(one_hot_encode_audio(x, 64))
    assert oh.shape == (64, 100)
    np.testing.assert_array_equal(oh.sum(axis=0), 1.0)


# ------------------------------------------------------------- resampler
def _torchaudio_resample_oracle(x, orig_freq, new_freq,
                                lowpass_filter_width=6, rolloff=0.99):
    """Direct torch restatement of torchaudio.functional.resample
    (sinc_interp_hann): build the (new, 1, K) polyphase kernel and apply
    a strided conv1d — the published algorithm, independent of our
    gather-based formulation."""
    import torch

    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    base = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base)
    idx = torch.arange(-width, width + orig, dtype=torch.float64)[None] \
        / orig
    t = torch.arange(0, -new, -1, dtype=torch.float64)[:, None] / new + idx
    t = (t * base).clamp_(-lowpass_filter_width, lowpass_filter_width)
    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t = t * math.pi
    kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                          t.sin() / t)
    kernels = kernels * window * (base / orig)

    wav = torch.as_tensor(np.asarray(x), dtype=torch.float64)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    n, length = wav.shape
    wav = torch.nn.functional.pad(wav, (width, width + orig))
    out = torch.nn.functional.conv1d(wav[:, None], kernels[:, None],
                                     stride=orig)
    out = out.transpose(1, 2).reshape(n, -1)
    target = int(math.ceil(new * length / orig))
    out = out[..., :target]
    return (out[0] if squeeze else out).numpy()


@pytest.mark.parametrize("orig,new", [
    (441, 160),      # 44.1k -> 16k family
    (480, 160),      # 48k -> 16k
    (160, 441),      # upsample
    (44100, 16000),
])
def test_resample_matches_torchaudio_algorithm(orig, new, rng_np):
    x = rng_np.standard_normal(orig * 3).astype(np.float32)
    got = np.asarray(resample(jnp.asarray(x), orig, new))
    want = _torchaudio_resample_oracle(x, orig, new)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=2e-4, atol=2e-5)


def test_resample_awkward_gcd(rng_np):
    # coprime rates: torchaudio's materialized kernel would be enormous;
    # the gather formulation must still agree with the direct algorithm
    x = rng_np.standard_normal(1001).astype(np.float32)
    got = np.asarray(resample(jnp.asarray(x), 1001, 320))
    want = _torchaudio_resample_oracle(x, 1001, 320)
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=2e-4, atol=2e-5)


def test_resample_to_length_reference_semantics(rng_np):
    # dataset.py:253-262: resample(x, orig_freq=len(x), new_freq=160000)
    # → output length exactly 160000; use a scaled-down variant here
    x = rng_np.standard_normal(4410).astype(np.float32)
    out = np.asarray(resample_to_length(jnp.asarray(x), 1600))
    assert out.shape == (1600,)
    want = _torchaudio_resample_oracle(x, 4410, 1600)[:1600]
    np.testing.assert_allclose(out, want.astype(np.float32),
                               rtol=2e-4, atol=2e-5)


def test_resample_identity():
    x = jnp.asarray(np.linspace(-1, 1, 64), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(resample(x, 160, 160)),
                                  np.asarray(x))


# ------------------------------------------------------ receptive fields
@pytest.mark.parametrize("layer,stack,rf", [
    (3, 3, 24),      # experiments/00-02
    (2, 2, 8),       # experiments/03
    (14, 1, 16384),  # experiments/04
    (10, 3, 3072),   # reference test config
])
def test_receptive_field_values(layer, stack, rf):
    assert receptive_field(layer, stack) == rf
    dil = wavenet_dilations(layer, stack)
    assert len(dil) == layer * stack
    assert sum(dil) + stack == rf
