"""Model layer: video-conditioned WaveNet and autoregressive samplers."""

from movenet_tpu.models.wavenet import WaveNet, VideoEncoder
from movenet_tpu.models.sampler import fast_generate, naive_generate

__all__ = ["WaveNet", "VideoEncoder", "fast_generate", "naive_generate"]
