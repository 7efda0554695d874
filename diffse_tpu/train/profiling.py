"""Tracing / profiling instrumentation.

The reference's only speed instrument is the hand-rolled RTF hook
(sgmse/model.py:834-838, replicated by ScoreModel.enhance(timeit=True)).
TPU-native additions (SURVEY.md §5 "Tracing / profiling"):

  - :func:`trace` — context manager around ``jax.profiler`` emitting an
    XPlane trace viewable in TensorBoard / xprof,
  - :class:`StageTimer` — lightweight named wall-clock stage timers with
    device synchronization, for utterances/sec/chip and RTF reporting,
  - :func:`rtf` — real-time-factor helper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock stage timing with device sync.

    Usage:
        timer = StageTimer()
        with timer.stage("stft"):
            ...
        print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        yield
        if sync:
            try:
                (jax.device_put(0.0) + 0).block_until_ready()
            except Exception:
                pass
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1e3:.1f}ms avg x{n}")
        return "\n".join(lines)


def rtf(wall_seconds: float, audio_seconds: float) -> float:
    """Real-time factor: processing seconds per second of audio (< 1 is faster
    than real time; the reference reports this, model.py:836)."""
    return wall_seconds / audio_seconds
