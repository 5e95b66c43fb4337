"""Typed configuration + per-dataset presets."""

from .config import ModelConfig, TrainConfig, config_from_dict
from .presets import PRESETS, get_preset

__all__ = ["ModelConfig", "TrainConfig", "config_from_dict", "PRESETS", "get_preset"]
