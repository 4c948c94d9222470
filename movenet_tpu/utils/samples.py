"""Generated-sample export: mu-law decode, resample back to the clip's
original rate, write WAV files.

Reference behavior (trainer.py:469-607, callbacks.py:60-134): at
checkpoint/logging epochs, decode the teacher-forced predictions and
the free-running generations, librosa-resample them back to the
original audio rate, duplicate mono to stereo, and save wav artifacts.
Here the resample is the same sinc kernel used everywhere else and the
WAV writer is the stdlib ``wave`` module (no torchaudio/librosa
dependency).
"""

from __future__ import annotations

import logging
import wave
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from movenet_tpu.data.preprocess import mu_law_decode_np, resample_np

logger = logging.getLogger(__name__)


def write_wav(path: Path, audio: np.ndarray, sample_rate: int,
              stereo: bool = True) -> Path:
    """Write a [-1, 1] float waveform as 16-bit PCM WAV."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    audio = np.asarray(audio, np.float32).reshape(-1)
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    if stereo:
        pcm = np.repeat(pcm[:, None], 2, axis=1).reshape(-1)
    with wave.open(str(path), "wb") as fh:
        fh.setnchannels(2 if stereo else 1)
        fh.setsampwidth(2)
        fh.setframerate(int(sample_rate))
        fh.writeframes(pcm.tobytes())
    return path


def export_samples(
    out_dir: Path,
    epoch: int,
    split: str,
    codes: Dict[str, np.ndarray],
    input_channels: int,
    model_rate: int = 16_000,
    target_rate: Optional[int] = None,
) -> Dict[str, list]:
    """Decode and write one batch of sample kinds.

    Args:
      codes: mapping kind -> (B, T) int mu-law codes; conventional kinds
        are "original", "predicted", "generated" (the reference's W&B
        table columns, callbacks.py:14-22).
      model_rate: the model-space rate (MAX_AUDIO_FRAMES / 10 s = 16 kHz).
      target_rate: original clip rate to resample back to (None: keep
        model rate).
    Returns: kind -> list of written paths.
    """
    out = Path(out_dir) / f"epoch_{epoch:04d}" / split
    written: Dict[str, list] = {}
    for kind, batch in codes.items():
        batch = np.asarray(batch)
        paths = []
        for i, row in enumerate(batch):
            audio = mu_law_decode_np(row, input_channels)
            rate = model_rate
            if target_rate and target_rate != model_rate:
                audio = resample_np(audio, model_rate, target_rate)
                rate = target_rate
            paths.append(
                write_wav(out / f"{kind}_{i:02d}.wav", audio, rate))
        written[kind] = paths
    logger.info("exported %s samples to %s",
                {k: len(v) for k, v in written.items()}, out)
    return written
