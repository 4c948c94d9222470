"""Core numeric ops: mu-law codec, audio preprocessing, resampling,
and the matmul-form causal convolution primitives."""

from movenet_tpu.ops.mulaw import mu_law_encode, mu_law_decode
from movenet_tpu.ops.audio import (
    normalize_audio,
    one_hot_encode_audio,
    quantize_audio,
)
from movenet_tpu.ops.resample import resample, resample_to_length
from movenet_tpu.ops.conv import (
    causal_pad_shift,
    dilated_causal_matmul,
    receptive_field,
    wavenet_dilations,
)

__all__ = [
    "mu_law_encode",
    "mu_law_decode",
    "normalize_audio",
    "one_hot_encode_audio",
    "quantize_audio",
    "resample",
    "resample_to_length",
    "causal_pad_shift",
    "dilated_causal_matmul",
    "receptive_field",
    "wavenet_dilations",
]
