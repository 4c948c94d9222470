"""Build the native IO library:  python -m movenet_tpu.native.build"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SRCS = [HERE / "io_loader.cpp", HERE / "pipeline.cpp"]
OUT = HERE / "movenet_io.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-ffast-math", "-pthread",
        *[str(s) for s in SRCS], "-o", str(OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
