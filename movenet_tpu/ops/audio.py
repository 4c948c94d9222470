"""Audio preprocessing: normalization, quantization, one-hot encoding.

These reproduce the reference's host-side per-example transforms
(dataset.py:265-289) as pure JAX functions so they run fused on device
as part of the input pipeline instead of per-example on dataloader
workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from movenet_tpu.ops.mulaw import mu_law_encode


def normalize_audio(audio: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize a waveform to [-1, 1].

    Matches dataset.py:265-275 including the all-zero guard: a signal
    summing to exactly 0 is returned unchanged (the reference's TODO-noted
    behavior).
    """
    min_val = jnp.min(audio)
    max_val = jnp.max(audio)
    rng = max_val - min_val
    safe = jnp.where(rng == 0, 1.0, rng)
    normed = (audio - min_val) / safe * 2.0 - 1.0
    return jnp.where(jnp.sum(audio) == 0, audio, normed)


def quantize_audio(audio: jnp.ndarray, input_channels: int,
                   normalize: bool = True) -> jnp.ndarray:
    """Normalize (optionally) then mu-law quantize to int codes."""
    if normalize:
        audio = normalize_audio(audio)
    return mu_law_encode(audio, input_channels)


def one_hot_encode_audio(audio: jnp.ndarray, input_channels: int,
                         normalize: bool = True) -> jnp.ndarray:
    """Waveform → one-hot (channels, frames) float32.

    Equivalent to dataset.py:278-289 (normalize → mu_law → scatter).

    Args:
      audio: (frames,) or (1, frames) waveform in [-1, 1].
    Returns:
      (input_channels, frames) one-hot float32.
    """
    audio = audio.reshape(-1)
    q = quantize_audio(audio, input_channels, normalize=normalize)
    return jax.nn.one_hot(q, input_channels, axis=0, dtype=jnp.float32)
