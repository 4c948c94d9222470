"""ctypes binding for the native C++ clip loader (stub until built).

The shared library (movenet_io.so) provides threaded file decode and
fused grayscale/resize/subsample preprocessing off the Python GIL.
``available()`` gates all call sites so the pure-Python path is used
when the library has not been compiled.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

_LIB_PATH = Path(__file__).parent / "movenet_io.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and _LIB_PATH.exists():
        _lib = ctypes.CDLL(str(_LIB_PATH))
    return _lib


def available() -> bool:
    return _load() is not None


def decode(fp):  # pragma: no cover - requires built library
    raise NotImplementedError(
        "native decode binding lands with the C++ loader build")
