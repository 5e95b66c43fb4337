"""Observability utilities: metrics logging, throughput, profiling, viz."""

from .logging import MetricsLogger, Throughput, write_run_notes
from .profiling import StepTimer, annotate, trace
from .viz import (
    display_frames,
    samples_to_video,
    save_low_d,
    save_video_gif,
    video_grid,
)

__all__ = [
    "MetricsLogger",
    "Throughput",
    "write_run_notes",
    "trace",
    "annotate",
    "StepTimer",
    "save_low_d",
    "display_frames",
    "video_grid",
    "samples_to_video",
    "save_video_gif",
]
