"""movenet_tpu — a TPU-native dance-video→music framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
cosmicBboy/movenet (video-conditioned WaveNet trained on Kinetics dance
clips): data pipeline, model, trainer, distributed execution, fast
autoregressive sampling, checkpointing and observability.

Design stance (see README.md):
  * the compute path is pure matmuls + elementwise ops (MXU-friendly);
    dilated causal convolutions are expressed as shifted matmuls rather
    than conv kernels,
  * one canonical config module, one functional train loop,
  * SPMD parallelism via ``jax.sharding.Mesh`` (data parallel + optional
    sequence parallel), not process-spawn DDP,
  * autoregressive generation uses cached per-layer ring buffers
    (fast-wavenet) inside an on-device ``lax.scan`` / Pallas kernel —
    O(1) work per generated sample.
"""

__version__ = "0.1.0"

from movenet_tpu.config import ModelConfig, TrainingConfig

MAX_AUDIO_FRAMES = 160_000  # 10 s @ 16 kHz (reference: wavenet.py:27)
MAX_VIDEO_FRAMES = 160      # 16 fps video frames  (reference: wavenet.py:28)
VIDEO_FRAME_SIZE = (64, 64)  # H, W after resize   (reference: wavenet.py:29)
UPSAMPLE_STRIDE = 10        # per transposed-conv upsample stage (wavenet.py:31)

__all__ = [
    "ModelConfig",
    "TrainingConfig",
    "MAX_AUDIO_FRAMES",
    "MAX_VIDEO_FRAMES",
    "VIDEO_FRAME_SIZE",
    "UPSAMPLE_STRIDE",
    "__version__",
]
