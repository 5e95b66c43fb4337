"""Sequence-parallel TRAINING: gradients + optimizer under a "seq" mesh.

Round-2 closed the forward pass (time_sharded_encode/decode are
bit-exact); this module makes the time-sharded path TRAINABLE end to
end, which is what sequence parallelism exists for — training horizons
whose ConvLSTM activation stacks exceed one chip's HBM (SURVEY.md §2.9
/ §5.7; the reference has no distributed execution at all).

Design (hybrid shard_map + GSPMD):

* the generator recurrences — the O(T) activation giants — run inside
  ``shard_map`` as ring-relay scans (``time_sharded_encode/decode``),
  injected into the SHARED ``train.steps.gan_forward`` via its
  ``encode``/``decode`` hooks, so loss semantics are literally the same
  code as the single-chip step;
* everything around them (context/future concat, Gaussian smoothing
  over global time, both discriminators, the mixed Sinkhorn + pM) runs
  as plain ops on time-sharded global arrays — GSPMD partitions the
  per-frame convs over the seq axis and inserts the exact collectives
  where time couples (temporal smoothing halos, the discriminators'
  LSTM scans, the [B,B] cost matrices — all small: [B,T,J] and [B,B]);
* gradients flow through ``shard_map``/``ppermute``/``psum`` (all
  reverse-differentiable; the relay ring transposes to the reverse
  ring), and the four Adam updates run on the replicated state exactly
  as in ``build_train_step``.

Divisibility contract: ``total_time_steps`` and ``pred_time_steps``
must both divide by the seq-mesh size.

Exactness vs the unsharded step (params, opt state, metrics — grads
included) is pinned on an 8-device CPU mesh in tests/test_seqpar.py.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..train.state import GanModules, TrainState
from ..train.steps import build_train_step
from .seqmodel import time_sharded_decode, time_sharded_encode
from .seqpar import SEQ_AXIS

__all__ = ["build_seq_train_step", "seq_batch_sharding", "seq_replicated"]


def seq_batch_sharding(mesh: Mesh, *, axis_name: str = SEQ_AXIS) -> NamedSharding:
    """Film-strip batch ``[B, H, T, W, C]`` sharded along time — and
    along batch too when the mesh has a ``data`` axis (2-D data x seq,
    `data_seq_mesh`)."""
    da = "data" if "data" in mesh.axis_names else None
    return NamedSharding(mesh, P(da, None, axis_name))


def seq_replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def build_seq_train_step(
    cfg: TrainConfig,
    mods: GanModules,
    mesh: Mesh,
    *,
    axis_name: str = SEQ_AXIS,
    compile_only: bool = False,
) -> Callable[[TrainState, jax.Array], tuple[TrainState, dict]]:
    """``train_step(state, batch) -> (state, metrics)`` with the time
    axis of every generator activation sharded over ``axis_name``.

    ``state`` must be replicated over the mesh and ``batch`` sharded
    with ``seq_batch_sharding`` (film-strip time axis 2).

    ``compile_only`` skips the XLA:CPU-execution-wedge validations
    below — for tooling that only LOWERS/COMPILES the program on a
    virtual CPU mesh (comms accounting, HLO reports); the wedges are
    runtime rendezvous races, compilation is always safe.
    """
    s = mesh.shape[axis_name]
    if cfg.total_time_steps % s or cfg.pred_time_steps % s:
        raise ValueError(
            f"seq mesh size {s} must divide total_time_steps "
            f"({cfg.total_time_steps}) and pred_time_steps "
            f"({cfg.pred_time_steps})"
        )
    needs_dropout = cfg.model.dropout > 0.0 or cfg.model.rnn_dropout > 0.0
    if (
        not compile_only
        and needs_dropout
        and "data" in mesh.axis_names
        and jax.default_backend() == "cpu"
    ):
        # Same XLA:CPU rendezvous wedge class as bf16 below, measured
        # deterministic in isolation (r5): the per-data-shard dropout
        # key fold (`seqmodel._shard_rngs` axis_index) adds a collective
        # family to the 2-D program that races the ring-relay ppermutes
        # on the forced-host mesh.  1-D seq x dropout is exact and
        # pinned (test_seqpar.py); the 2-D combination is TPU-only.
        # Semantics note: under a data axis the dropout masks are
        # per-shard independent (like the per-shard DP mode,
        # train/steps.py) — distributionally equivalent to, but not
        # bit-equal with, the unsharded step.
        raise ValueError(
            "sequence parallelism with dropout on a 2-D (data x seq) "
            "mesh is TPU-only: the XLA:CPU collective rendezvous "
            "deadlocks on the virtual-device mesh.  Drop the data axis "
            "(seq-only mesh) or disable dropout for CPU-mesh runs."
        )
    if (
        not compile_only
        and cfg.compute_dtype == "bfloat16"
        and jax.default_backend() == "cpu"
    ):
        # XLA:CPU wedges on this combination: the bf16 convs force
        # GSPMD resharding collectives whose rendezvous races the
        # manual ring-relay ppermutes on the forced-host mesh
        # (rendezvous.cc 40s hard abort — see constrain_loss_inputs
        # below for the f32-safe form).  On TPU the program compiles
        # and runs; fail fast with a clear error instead of the wedge.
        raise ValueError(
            "sequence parallelism with compute_dtype='bfloat16' is "
            "TPU-only: the XLA:CPU collective rendezvous deadlocks on "
            "the virtual-device mesh.  Use compute_dtype='float32' for "
            "CPU-mesh runs/tests, or run on TPU devices."
        )
    # 2-D data x seq mesh: batch rows are additionally sharded over the
    # data axis inside the same shard_map (the recurrence is
    # embarrassingly parallel over batch), gradients all-reduce over
    # BOTH axes via the replicated out_shardings, and the global-batch
    # Sinkhorn's [B, B] coupling is restored by GSPMD feature
    # all-gathers over the data axis (same collectives the pure-DP
    # program pins in tests/test_comms.py).
    data_axis = "data" if "data" in mesh.axis_names else None
    if data_axis is not None and cfg.batch_size % mesh.shape[data_axis]:
        raise ValueError(
            f"data mesh size {mesh.shape[data_axis]} must divide "
            f"batch_size ({cfg.batch_size})"
        )
    # The ring-relay wrappers slice/shard batch-major pyramids; under
    # cfg.time_major use the batch-major layout twins (same params).
    sp_encoder, sp_decoder = mods.generator_modules(time_major=False)

    def encode(params, video, rngs):
        return time_sharded_encode(
            sp_encoder, {"params": params}, video, mesh,
            training=True, axis_name=axis_name, data_axis=data_axis,
            rngs=rngs,
        )

    def decode(params, pyramid, z, rngs):
        return time_sharded_decode(
            sp_decoder, {"params": params}, pyramid, z, mesh,
            training=True, axis_name=axis_name, data_axis=data_axis,
            rngs=rngs,
        )

    repl_sharding = seq_replicated(mesh)

    def constrain_loss_inputs(xs):
        # Replicate the Sinkhorn/pM inputs (global [B,*] feature stacks
        # and smoothed videos) before the [B, B] cost Grams.  The exact
        # global-batch divergence needs every row on every device
        # anyway; stating it as an explicit all-gather-to-replicated
        # stops GSPMD from instead partitioning the cost dot_generals
        # with collective-permute reshards.  That permute-free form is
        # required on the forced-host CPU test mesh: XLA:CPU's permute
        # rendezvous deadlocks when a second, data-independent permute
        # family (the GSPMD reshards) races the manual ring-relay
        # ppermutes (rendezvous.cc 40s abort, observed 2-devices-at-
        # op-97 / 6-at-op-1).  On TPU it is the same bytes on ICI.
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, repl_sharding),
            xs,
        )

    step = build_train_step(
        cfg, mods, jit=False, encode=encode, decode=decode,
        constrain_loss_inputs=constrain_loss_inputs,
    )
    repl = seq_replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, seq_batch_sharding(mesh, axis_name=axis_name)),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if cfg.donate_buffers else (),
    )
