"""Profiling hooks: XLA trace capture + per-step timing.

The reference's only performance instrumentation is a wall-clock print
and tqdm rates (`/root/reference/kernel_train.py:20,294-296,358`).
Here the analogue is first-class (SURVEY.md §5.1):

* ``trace(dir)`` — context manager around ``jax.profiler`` capturing a
  TensorBoard-loadable XLA trace (HLO timeline, fusion boundaries, HBM
  usage) of whatever runs inside it.
* ``annotate(name)`` — ``TraceAnnotation`` wrapper so host-side phases
  (data loading, checkpointing) show up on the trace alongside device
  work.
* ``StepTimer`` — low-overhead EMA of step latency; never forces a
  device sync itself (the caller decides when to read back).
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "start_trace", "stop_trace", "annotate", "StepTimer"]


def start_trace(log_dir: str) -> None:
    """Imperative form of :func:`trace` for loop-driven capture windows."""
    import jax

    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace into ``log_dir`` (view in
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (host annotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Exponential-moving-average step timer.

    ``tick()`` each step; ``ema_ms``/``last_ms`` report latency. Does not
    synchronize the device — pair with an explicit readback (see
    bench.py) when exact per-step numbers are needed.
    """

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: float | None = None
        self.last_ms: float | None = None
        self._t: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._t is not None:
            self.last_ms = (now - self._t) * 1e3
            self.ema_ms = (
                self.last_ms
                if self.ema_ms is None
                else self.alpha * self.last_ms + (1 - self.alpha) * self.ema_ms
            )
        self._t = now
