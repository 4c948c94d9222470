"""Data layer: Kinetics-style dataset index, pluggable clip decoders,
host-side preprocessing, and a prefetching loader."""

from movenet_tpu.data.dataset import (
    ClipIndex,
    Example,
    RawClip,
    kinetics_index,
)
from movenet_tpu.data.preprocess import (
    preprocess_audio,
    preprocess_video,
    uniform_temporal_subsample,
)
from movenet_tpu.data.pipeline import DataLoader, get_dataloader
from movenet_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "ClipIndex",
    "Example",
    "RawClip",
    "kinetics_index",
    "preprocess_audio",
    "preprocess_video",
    "uniform_temporal_subsample",
    "DataLoader",
    "get_dataloader",
    "make_synthetic_dataset",
]
