"""Data-parallel training over a device mesh.

Two modes (SURVEY.md section 2.9 table "Cross-batch Sinkhorn"):

* **Global-batch (exact, default)** — the mixed Sinkhorn divergence is a
  global-batch quantity (the cost matrix couples all B samples).  The
  unmodified train step is jitted with the batch sharded over the
  ``"data"`` axis and the state replicated; GSPMD inserts the
  all-gather where the ``[B, B]`` Gram/cost matrices form and the
  gradient all-reduce automatically — exact parity with single-device
  semantics at any mesh size, collectives riding ICI.

* **Local-shard (throughput)** — ``shard_map`` over the data axis: each
  device solves Sinkhorn on its LOCAL shard and gradients are
  ``pmean``-reduced (classic pmap-style DP).  Changes the objective to
  the mean of per-shard divergences; documented semantics tradeoff for
  very large global batches.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import TrainConfig
from ..train.state import GanModules, TrainState
from ..train.steps import build_train_step
from .mesh import DATA_AXIS, batch_sharding, replicated_sharding

__all__ = ["build_sharded_train_step", "replicate_state", "shard_batch"]


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    return jax.device_put(state, replicated_sharding(mesh))


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))


def build_sharded_train_step(
    cfg: TrainConfig, mods: GanModules, mesh: Mesh
) -> Callable:
    """``train_step(state, global_batch) -> (state, metrics)`` over the mesh.

    The global batch must be divisible by the mesh size.  Mode selected
    by ``cfg.global_batch_sinkhorn`` (True = exact GSPMD mode).
    """
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    if cfg.global_batch_sinkhorn:
        if mesh.size > 1 and getattr(mods, "kernel_impl", "scan") == "pallas":
            # The exact mode relies on XLA's SPMD partitioner slicing the
            # recurrence across the batch axis; a Mosaic custom call is
            # opaque to it (best case it replicates the whole [B,T,...]
            # stack onto every device).  The batch-parallel Pallas engine
            # composes with the LOCAL shard_map mode below instead; here
            # we keep the scan engine, which GSPMD partitions exactly.
            import dataclasses
            import logging

            logging.getLogger(__name__).warning(
                "kernel_impl=pallas does not partition under the exact "
                "global-batch GSPMD mode (%d devices); using the scan "
                "engine for this program. The Pallas engine is used for "
                "single-device and shard_map (global_batch_sinkhorn="
                "False) training.",
                mesh.size,
            )
            mods = GanModules(dataclasses.replace(cfg, kernel_impl="scan"))
        step = build_train_step(cfg, mods, jit=False)
        return jax.jit(
            step,
            in_shardings=(repl, bsh),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if cfg.donate_buffers else (),
        )

    step = build_train_step(cfg, mods, jit=False, axis_name=DATA_AXIS)
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(
        sharded,
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if cfg.donate_buffers else (),
    )
