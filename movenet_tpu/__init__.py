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
    "make_wavenet",
    "mu_law_encode",
    "mu_law_decode",
    "fast_generate",
    "__version__",
]

# Lazy re-exports of the main user-facing entry points (the factory +
# codec + sampler a reference user reaches for first; reference surface:
# movenet/wavenet.py MoveNet + mu-law utils).  Resolved on first access
# so `import movenet_tpu` stays light (no flax/optax import cost).
_LAZY = {
    "make_wavenet": ("movenet_tpu.models.wavenet", "make_wavenet"),
    "mu_law_encode": ("movenet_tpu.ops.mulaw", "mu_law_encode"),
    "mu_law_decode": ("movenet_tpu.ops.mulaw", "mu_law_decode"),
    "fast_generate": ("movenet_tpu.models.sampler", "fast_generate"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module 'movenet_tpu' has no attribute {name!r}") from None
    import importlib

    val = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = val  # cache for subsequent lookups
    return val
