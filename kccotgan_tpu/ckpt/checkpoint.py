"""Orbax checkpointing of the FULL train state.

The reference saves only model weights every 10k iters and its restore
path crashes on an undefined name, never restoring optimizer state or
step (`kernel_train.py:156-165,331-338` — quirk ledger #4).  Here the
complete ``TrainState`` (4 param trees, BN stats, 4 Adam states, step,
RNG key) round-trips through Orbax, giving exact resume.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import jax
import orbax.checkpoint as ocp

if TYPE_CHECKING:  # annotation-only: a runtime import would be circular
    # (train.loop imports ckpt for the async writer)
    from ..train.state import TrainState

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "CheckpointWriter",
]


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int | None = None) -> None:
    mgr = _manager(ckpt_dir)
    step = int(state.step) if step is None else step
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


class CheckpointWriter:
    """Async checkpointing for the training loop.

    Holds ONE CheckpointManager for the run (``save_checkpoint`` opens
    and fsyncs per call — correct for one-shot use, wasteful per-step)
    and lets Orbax write in the background: ``save`` enqueues and
    returns, overlapping the serialization/IO with subsequent training
    steps; ``close`` drains.
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self._mgr = _manager(ckpt_dir, max_to_keep)

    def save(self, state: TrainState, step: int | None = None) -> None:
        step = int(jax.device_get(state.step)) if step is None else step
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, template: TrainState, step: int | None = None) -> TrainState:
    """Restore into the structure of ``template`` (a freshly-created
    state with the same config)."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored
