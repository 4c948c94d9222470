"""Observability and export utilities."""

from movenet_tpu.utils.observability import (
    JsonlWriter,
    MultiWriter,
    make_writer,
)
from movenet_tpu.utils.samples import export_samples, write_wav

__all__ = [
    "JsonlWriter",
    "MultiWriter",
    "make_writer",
    "export_samples",
    "write_wav",
]
