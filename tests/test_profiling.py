"""Profiler hooks: trace capture produces artifacts; StepTimer EMA."""

import glob
import os

from kccotgan_tpu.utils import StepTimer, annotate, trace


def test_trace_captures(tmp_path):
    import jax.numpy as jnp

    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("tiny-matmul"):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"


def test_step_timer():
    t = StepTimer(alpha=0.5)
    assert t.ema_ms is None
    t.tick()
    assert t.ema_ms is None  # first tick only arms the timer
    t.tick()
    first = t.ema_ms
    assert first is not None and first >= 0
    t.tick()
    assert t.last_ms is not None and t.ema_ms is not None
