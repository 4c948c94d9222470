"""Array type aliases (reference: movenet/types.py:1-5).

The reference used torchtyping's TensorType annotations; here the
aliases document shapes for tooling and humans (jax arrays carry no
named axes).
"""

from __future__ import annotations

import jax

# (batch, time) int32 mu-law codes — the canonical audio representation
AudioCodes = jax.Array
# (batch, channels, time) float — one-hot/probability mass audio
# (the reference's AudioTensor layout)
AudioTensor = jax.Array
# (batch, frames, height, width, channels) float video
VideoTensor = jax.Array
# (batch, time, residual_channels) float local-conditioning features
ContextFeatures = jax.Array

__all__ = ["AudioCodes", "AudioTensor", "VideoTensor",
           "ContextFeatures"]
