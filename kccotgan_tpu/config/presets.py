"""Per-dataset presets matching the driver BASELINE.json configs."""

from __future__ import annotations

from .config import ModelConfig, TrainConfig

__all__ = ["PRESETS", "get_preset"]


def _mmnist_small() -> TrainConfig:
    """Config #1: MMNIST 64x64, 10 ctx + 10 pred, batch 8, CPU-runnable."""
    return TrainConfig(
        dname="mmnist",
        batch_size=8,
        total_time_steps=20,
        int_time_steps=10,
        model=ModelConfig(n_channels=1),
    )


def _mmnist_full() -> TrainConfig:
    """Config #2: MMNIST batch 32, full Sinkhorn L and pM on."""
    return TrainConfig(
        dname="mmnist",
        batch_size=32,
        total_time_steps=20,
        int_time_steps=10,
        sinkhorn_l=100,
        reg_penalty=1.0,
        model=ModelConfig(n_channels=1),
    )


def _mazes() -> TrainConfig:
    """Config #3: GQN Mazes 64x64 RGB, longer context."""
    return TrainConfig(
        dname="mazes",
        batch_size=8,
        total_time_steps=15,
        int_time_steps=5,
        model=ModelConfig(n_channels=3),
    )


def _bair() -> TrainConfig:
    """Config #4: BAIR Push Small robot-pushing videos."""
    return TrainConfig(
        dname="robot_push",
        batch_size=8,
        total_time_steps=15,
        int_time_steps=5,
        model=ModelConfig(n_channels=3),
    )


def _mmnist_long() -> TrainConfig:
    """Config #5: long-horizon MMNIST (20+ predicted frames, large batch)
    stressing Sinkhorn cost-matrix memory."""
    return TrainConfig(
        dname="mmnist",
        batch_size=32,
        total_time_steps=30,
        int_time_steps=5,
        model=ModelConfig(n_channels=1),
    )


def _reference_defaults() -> TrainConfig:
    """The reference CLI's own defaults (`kernel_train.py:374-409`),
    with its effective Sinkhorn hyperparameters."""
    return TrainConfig(
        dname="robot_push",
        batch_size=2,
        total_time_steps=15,
        int_time_steps=5,
        model=ModelConfig(n_channels=3),
    )


def _synthetic_demo() -> TrainConfig:
    """Flagship-geometry run on the built-in bouncing-blob fixture
    (`data/synthetic.py`) — trains and samples with zero downloads.
    Used to produce the committed qualitative rollout artifacts
    (artifacts/): the reference's published deliverable is rollout
    gifs (`/root/reference/README.md:9-16`)."""
    return TrainConfig(
        dname="synthetic",
        batch_size=32,
        total_time_steps=20,
        int_time_steps=10,
        sinkhorn_l=100,
        model=ModelConfig(n_channels=1),
    )


PRESETS = {
    "mmnist_small": _mmnist_small,
    "mmnist_full": _mmnist_full,
    "mazes": _mazes,
    "robot_push": _bair,
    "mmnist_long": _mmnist_long,
    "reference_defaults": _reference_defaults,
    "synthetic_demo": _synthetic_demo,
}


def get_preset(name: str) -> TrainConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]()
