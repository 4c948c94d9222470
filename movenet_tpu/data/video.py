"""Media-file decoding backends.

The reference decodes mp4s with torchvision.io/PyAV (FFmpeg underneath,
dataset.py:168).  Codecs are an environment property, so decode is
dispatched across backends in priority order:

  1. the native C++ loader (movenet_tpu/native, ctypes-bound) when the
     shared library has been built — threaded decode + preprocess off
     the Python GIL;
  2. the ``ffmpeg``/``ffprobe`` CLI when present on PATH — frames piped
     as rawvideo rgb24, audio as f32le PCM;
  3. otherwise a clear error naming the missing capability (the packed
     ``.npz`` clip format in data/dataset.py always works and is what
     tests/benchmarks use).
"""

from __future__ import annotations

import json
import logging
import shutil
import subprocess
from pathlib import Path

import numpy as np

from movenet_tpu.data.dataset import RawClip

logger = logging.getLogger(__name__)


def _have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None and \
        shutil.which("ffprobe") is not None


def _probe(fp: Path) -> dict:
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-print_format", "json",
         "-show_streams", str(fp)],
        capture_output=True, check=True)
    return json.loads(out.stdout)


def _decode_ffmpeg_cli(fp: Path) -> RawClip:
    info = _probe(fp)
    vstream = next((s for s in info["streams"]
                    if s["codec_type"] == "video"), None)
    astream = next((s for s in info["streams"]
                    if s["codec_type"] == "audio"), None)

    video = None
    video_fps = 0.0
    if vstream is not None:
        w, h = int(vstream["width"]), int(vstream["height"])
        num, den = vstream.get("avg_frame_rate", "0/1").split("/")
        video_fps = float(num) / float(den) if float(den) else 0.0
        raw = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", str(fp), "-f", "rawvideo",
             "-pix_fmt", "rgb24", "-"],
            capture_output=True, check=True).stdout
        n = len(raw) // (w * h * 3)
        video = np.frombuffer(
            raw[: n * w * h * 3], dtype=np.uint8).reshape(n, h, w, 3)

    audio = None
    audio_fps = 0.0
    if astream is not None:
        audio_fps = float(astream.get("sample_rate", 0))
        ch = int(astream.get("channels", 1))
        raw = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", str(fp), "-f", "f32le",
             "-acodec", "pcm_f32le", "-"],
            capture_output=True, check=True).stdout
        pcm = np.frombuffer(raw, dtype=np.float32)
        if ch > 1:
            pcm = pcm[: (len(pcm) // ch) * ch].reshape(-1, ch).T
        audio = pcm

    return RawClip(
        video=video,
        audio=audio,
        info={
            "video_fps": video_fps,
            "audio_fps": audio_fps,
            "video_orig_dim": 0 if video is None else int(video.shape[0]),
            "audio_orig_dim": 0 if audio is None else int(audio.shape[-1]),
        },
    )


def decode_media_file(fp: Path) -> RawClip:
    # container decode goes through ffmpeg when present; the native C++
    # library accelerates the per-clip PREPROCESS hot loop
    # (movenet_tpu/native/io_loader.cpp), not the codec itself
    if _have_ffmpeg():
        return _decode_ffmpeg_cli(fp)
    raise RuntimeError(
        f"cannot decode {fp}: no ffmpeg/ffprobe on PATH. Repack clips as "
        ".npz (see movenet_tpu.data.synthetic) or install ffmpeg.")
