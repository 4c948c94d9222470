"""Structured profiling (the reference had only ad-hoc wall-time logs,
SURVEY §5.1: trainer.py:169-176, dataset.py:335).

* ``trace(logdir)``: context manager around ``jax.profiler`` — produces
  a TensorBoard-viewable trace of XLA ops, host callbacks, and transfer
  activity for any code region (train steps, generation, input
  pipeline).
* ``annotate(name)``: TraceAnnotation for host-side spans so loader /
  preprocess time shows up alongside device work.
* ``Stopwatch``: tiny named wall-time aggregator for coarse phase
  timing when a full trace is overkill.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    logdir = str(Path(logdir))
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side span annotation visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Accumulate named wall-time spans: ``with sw("decode"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(1, self.counts[k])}
            for k in self.totals
        }
