"""Profiling & tracing utilities.

The reference's only profiling is wall-clock epoch timing and `end='\\r'`
progress prints (trainer.py:396-399,702-712; SURVEY.md §5). Here:

  * `profile_trace(logdir)` — context manager around `jax.profiler` traces
    (XPlane; view with TensorBoard or xprof) covering device compute,
    transfers and host callbacks;
  * `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper so trainer
    phases (scene build, branch exec, terminal) show up in the timeline;
  * `StepTimer` — lightweight steady-state step timing with warmup discard,
    used by bench.py-style measurements.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Collects per-step wall times; reports mean/median excluding warmup."""

    def __init__(self, warmup: int = 3):
        self._warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    @property
    def steps(self) -> int:
        return max(0, len(self._times) - self._warmup)

    def mean(self) -> float:
        xs = self._times[self._warmup :]
        return sum(xs) / len(xs) if xs else float("nan")

    def median(self) -> float:
        xs = sorted(self._times[self._warmup :])
        if not xs:
            return float("nan")
        return xs[len(xs) // 2]
