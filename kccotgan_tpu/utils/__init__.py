"""Observability utilities: metrics logging, throughput, profiling."""

from .logging import MetricsLogger, Throughput, write_run_notes

__all__ = ["MetricsLogger", "Throughput", "write_run_notes"]
