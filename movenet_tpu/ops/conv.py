"""Causal convolution primitives in matmul form.

TPU-first design note: the reference implements its WaveNet with
``nn.Conv1d`` kernels of size 2 (modules.py:15-46).  A size-2 dilated
causal convolution is exactly

    y[t] = W_cur @ x[t] + W_past @ x[t - d]

i.e. two dense (C_out, C_in) matmuls over the time axis plus a time
shift.  Expressing it this way (rather than as a conv) keeps all FLOPs
on the MXU as large batched GEMMs, makes the shift a free pad/slice for
XLA to fuse, and gives every layer the same static full-length shape —
unlike the reference's shrinking "valid" convolutions which produce a
different tensor length per layer.

Equivalence to the reference's valid-conv pipeline: zero-left-padding
only contaminates outputs whose receptive field overlaps the pad, i.e.
the first (RF - 1) positions.  Slicing the final full-length output to
its last ``T - RF + 1`` positions therefore yields bit-identical values
to the reference's shrinking pipeline (verified in
tests/test_reference_semantics.py against a direct numpy oracle).

Internal activation layout is (batch, time, channels): channels in the
TPU lane dimension, time in sublanes.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def wavenet_dilations(layer_size: int, stack_size: int) -> List[int]:
    """Dilation schedule ``2^0..2^(L-1)`` repeated ``S`` times
    (reference: modules.py:112-117)."""
    return [2 ** l for _ in range(stack_size) for l in range(layer_size)]


def receptive_field(layer_size: int, stack_size: int) -> int:
    """Receptive field in samples: ``sum(dilations) + stack_size``
    (reference: wavenet.py:125-134).

    Examples: L=3,S=3 -> 24; L=2,S=2 -> 8; L=14,S=1 -> 16384;
    L=10,S=3 -> 3072.
    """
    return sum(wavenet_dilations(layer_size, stack_size)) + stack_size


def compute_output_size(time_steps: int, layer_size: int, stack_size: int
                        ) -> int:
    """Valid output length ``T - RF + 1`` with the reference's validation
    (wavenet.py:136-147)."""
    out = time_steps - receptive_field(layer_size, stack_size) + 1
    if out < 1:
        raise ValueError(
            "input time steps must be larger than the number of receptive "
            f"fields. Number of input timesteps = {time_steps}, "
            f"receptive fields = {receptive_field(layer_size, stack_size)}"
        )
    return out


def causal_pad_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Shift (batch, time, channels) right by ``shift`` along time,
    zero-filling: ``y[:, t] = x[:, t - shift]`` with ``y[:, :shift] = 0``."""
    if shift == 0:
        return x
    return jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, : x.shape[1], :]


def dilated_causal_matmul(
    x: jnp.ndarray,
    w_cur: jnp.ndarray,
    w_past: jnp.ndarray,
    dilation: int,
    preferred_dtype=jnp.float32,
) -> jnp.ndarray:
    """Size-2 dilated causal conv as two MXU matmuls.

    Args:
      x: (batch, time, c_in) activations.
      w_cur: (c_in, c_out) tap for x[t].
      w_past: (c_in, c_out) tap for x[t - dilation].
      dilation: causal lag of the past tap.

    Returns:
      (batch, time, c_out), full length (left zero-pad semantics).
    """
    cur = jnp.einsum("btc,co->bto", x, w_cur,
                     preferred_element_type=preferred_dtype)
    past = jnp.einsum("btc,co->bto", causal_pad_shift(x, dilation), w_past,
                      preferred_element_type=preferred_dtype)
    return cur + past


def upsample_kernel_size(in_size: int, out_size: int, stride: int = 1,
                         padding: int = 0, output_padding: int = 0,
                         dilation: int = 1) -> int:
    """Transposed-conv kernel size that maps in_size -> out_size
    (reference: wavenet.py:34-47, same closed form)."""
    x = out_size - 1 - output_padding - (in_size - 1) * stride + 2 * padding
    return int(x / dilation + 1)
