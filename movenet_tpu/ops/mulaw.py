"""Mu-law companding codec.

Bit-compatible with the torchaudio semantics the reference relies on
(reference call sites: dataset.py:284 encode, trainer.py:472-490 and
callbacks.py:66-77 decode, tests/test_model.py:22,71).

The closed forms, for ``mu = quantization_channels - 1``:

    encode:  y  = sign(x) * log1p(mu*|x|) / log1p(mu)
             q  = floor((y + 1) / 2 * mu + 0.5)          (int64)
    decode:  y  = q / mu * 2 - 1
             x  = sign(y) * (exp(|y| * log1p(mu)) - 1) / mu

Note the encoder does NOT clamp its input; out-of-range inputs produce
out-of-range codes exactly as the upstream implementation does.
"""

from __future__ import annotations

import jax.numpy as jnp


def mu_law_encode(x: jnp.ndarray, quantization_channels: int = 256
                  ) -> jnp.ndarray:
    """Quantize a [-1, 1] float signal to integer mu-law codes.

    Args:
      x: float array, any shape, nominally in [-1, 1].
      quantization_channels: number of discrete output levels (Q).

    Returns:
      int32 array of codes in [0, Q-1] for in-range inputs.
    """
    mu = float(quantization_channels - 1)
    x = x.astype(jnp.float32)
    y = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
    # int cast truncates toward zero, matching the upstream `.to(int64)`;
    # y+1 >= 0 for in-range inputs so truncation == floor there.
    return ((y + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decode(q: jnp.ndarray, quantization_channels: int = 256
                  ) -> jnp.ndarray:
    """Expand integer mu-law codes back to [-1, 1] floats."""
    mu = float(quantization_channels - 1)
    y = q.astype(jnp.float32) / mu * 2.0 - 1.0
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(mu))) / mu
