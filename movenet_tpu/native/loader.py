"""ctypes binding for the native C++ preprocess/IO library.

Functions release the GIL for their entire duration (ctypes foreign
calls), so the Python-side thread pool in data/pipeline.py gets true
multi-core preprocessing when the library is built
(``python -m movenet_tpu.native.build``).  All call sites degrade to
the numpy implementations when it is absent.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "movenet_io.so"
_lib: Optional[ctypes.CDLL] = None
_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    if lib.mn_api_version() != 1:
        return None
    lib.mn_preprocess_video.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p,
    ]
    lib.mn_preprocess_video.restype = ctypes.c_int
    lib.mn_preprocess_audio.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.mn_preprocess_audio.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_video(video: np.ndarray, num_frames: int,
                     frame_hw=(64, 64)) -> np.ndarray:
    """(F, H, W, 1|3) uint8 -> (num_frames, oh, ow, 1) float32."""
    lib = _load()
    assert lib is not None
    video = np.ascontiguousarray(video, dtype=np.uint8)
    f, h, w, c = video.shape
    oh, ow = frame_hw
    out = np.empty((num_frames, oh, ow), np.float32)
    rc = lib.mn_preprocess_video(
        video.ctypes.data, f, h, w, c, num_frames, oh, ow,
        out.ctypes.data)
    if rc != 0:
        raise ValueError(f"native video preprocess failed (rc={rc}) for "
                         f"shape {video.shape}")
    return out[..., None]


def preprocess_audio(audio: np.ndarray, input_channels: int,
                     normalize: bool, target_frames: int) -> np.ndarray:
    """(S,) or (ch, S) float32 -> (target_frames,) int32 mu-law codes."""
    lib = _load()
    assert lib is not None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    ch, s = audio.shape
    out = np.empty(target_frames, np.int32)
    rc = lib.mn_preprocess_audio(
        audio.ctypes.data, ch, s, target_frames, int(input_channels),
        int(bool(normalize)), out.ctypes.data)
    if rc != 0:
        raise ValueError(f"native audio preprocess failed (rc={rc})")
    return out


def decode(fp):  # pragma: no cover
    """Media decode is delegated to ffmpeg/packed formats for now; the
    native library accelerates preprocessing (the actual hot loop)."""
    raise NotImplementedError
