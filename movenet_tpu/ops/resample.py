"""Sinc-interpolation audio resampler (torchaudio-compatible semantics).

The reference resamples every clip's audio to exactly 160,000 samples
with ``torchaudio.functional.resample(x, orig_freq=len(x), new_freq=160000)``
(dataset.py:253-262) and resamples generated audio back to the original
rate with librosa (trainer.py:545-563, callbacks.py:87-114).  Both are
windowed-sinc lowpass interpolators; this module implements the same
math as torchaudio's ``sinc_interp_hann`` method:

    gcd-reduce (orig, new);  base = min(orig, new) * rolloff
    t(m, i)   = (i/orig - m/new) * base          (input i, output m)
    weight    = sinc(pi*t) * cos(t*pi/(2*width_p))^2 * base/orig,  |t| < width_p
                0 otherwise   (width_p = lowpass_filter_width)

Rather than materializing torchaudio's (new/gcd, 2*w + orig/gcd) strided
conv kernel — whose size blows up when gcd(orig, new) is small — we
precompute, on the host in float64, a dense (T_out, D) tap-weight matrix
and matching (T_out, D) gather indices, where D ≈ 2*w+1 is the true tap
support per output sample.  On device the op is then a static gather +
row-wise dot: bandwidth-friendly, shape-static, and identical in exact
arithmetic to the torchaudio formulation (summation order differs, so
float32 results agree to ~1e-6 relative, which the golden tests pin).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resample_plan(orig_freq: int, new_freq: int, length: int,
                   lowpass_filter_width: int, rolloff: float):
    """Precompute gather indices and tap weights for a fixed-size resample.

    Returns (indices (T_out, D) int32, weights (T_out, D) float32, T_out).
    Out-of-range indices are clamped with zero weights (zero-pad
    semantics, matching torchaudio's explicit padding).
    """
    if orig_freq <= 0 or new_freq <= 0:
        raise ValueError("frequencies must be positive")
    g = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // g
    new = int(new_freq) // g

    base = min(orig, new) * rolloff
    # tap half-width in input samples
    width = int(math.ceil(lowpass_filter_width * orig / base))
    D = 2 * width + 2  # static support bound per output sample

    t_out = int(math.ceil(new * length / orig))

    m = np.arange(t_out, dtype=np.int64)
    j, p = m // new, m % new
    # exact output time in input-sample units: tau = j*orig + p*orig/new
    frac = p.astype(np.float64) * orig / new          # in [0, orig)
    d0 = (p * orig) // new - width                     # int64, first tap
    r = np.arange(D, dtype=np.int64)
    idx = j[:, None] * orig + d0[:, None] + r[None, :]  # (T_out, D)

    # t in "lowpass widths": ((i - tau)/orig) * base
    i_rel = (d0[:, None] + r[None, :]).astype(np.float64) - frac[:, None]
    t = i_rel / orig * base
    inside = np.abs(t) < lowpass_filter_width
    t_c = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t_c * np.pi / lowpass_filter_width / 2.0) ** 2
    tp = t_c * np.pi
    sinc = np.where(tp == 0, 1.0, np.sin(tp) / np.where(tp == 0, 1.0, tp))
    scale = base / orig
    w = np.where(inside, sinc * window * scale, 0.0)

    valid = (idx >= 0) & (idx < length)
    w = np.where(valid, w, 0.0)
    idx = np.clip(idx, 0, length - 1)

    return (idx.astype(np.int32), w.astype(np.float32), t_out)


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99
             ) -> jnp.ndarray:
    """Resample the last axis of ``x`` from orig_freq to new_freq.

    Matches ``torchaudio.functional.resample`` (sinc_interp_hann) output
    length ``ceil(new/orig * T)`` and filter response.
    """
    length = x.shape[-1]
    idx, w, t_out = _resample_plan(
        int(orig_freq), int(new_freq), int(length),
        int(lowpass_filter_width), float(rolloff),
    )
    if int(orig_freq) == int(new_freq):
        return x
    idx_j = jnp.asarray(idx)
    w_j = jnp.asarray(w, dtype=x.dtype if x.dtype == jnp.float64
                      else jnp.float32)
    gathered = jnp.take(x, idx_j, axis=-1)      # (..., T_out, D)
    return jnp.einsum("...td,td->...t", gathered.astype(w_j.dtype), w_j)


def resample_to_length(x: jnp.ndarray, target_length: int,
                       **kwargs) -> jnp.ndarray:
    """Resample a waveform so its last axis has exactly ``target_length``.

    Reproduces the reference's unusual call pattern
    ``resample(x, orig_freq=len(x), new_freq=160000)`` (dataset.py:259),
    including the defensive truncation at dataset.py:260-261.
    """
    out = resample(x, int(x.shape[-1]), int(target_length), **kwargs)
    return out[..., :target_length]
