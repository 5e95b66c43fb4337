"""Pin the collective set of the compiled data-parallel train step.

The 8-device global-batch GSPMD program must communicate exactly two
ways (SURVEY §2.9 comms accounting; the scaling-book recipe for pure
data parallelism with a batch-coupled loss):

  * all-gather  — the global-batch Sinkhorn couples every shard, so the
    per-shard discriminator feature rows are gathered to the full
    [B_global, ...] matrices before the cost matmuls;
  * all-reduce  — gradients of the replicated parameters.

No all-to-all / reduce-scatter should appear (no resharding: batch in,
replicated params).  collective-permute appears only in the seq-parallel
program (ring relay), not here.  GSPMD collective insertion is backend-
independent, so compiling for the virtual 8-CPU mesh pins the real
8-chip program's traffic (tools/comms_report.py prices the flagship
shape; artifacts/comms_flagship_8dev.json is the checked-in report).
"""

import jax
import jax.numpy as jnp

from kccotgan_tpu.config import ModelConfig, TrainConfig
from kccotgan_tpu.data import bouncing_blobs
from kccotgan_tpu.parallel import (
    build_sharded_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from kccotgan_tpu.parallel.comms import collect_collectives, comms_summary
from kccotgan_tpu.train import GanModules, create_train_state


def _tiny_cfg(**kw) -> TrainConfig:
    base = dict(
        dname="synthetic",
        batch_size=8,
        compute_dtype="float32",
        total_time_steps=5,
        int_time_steps=3,
        sinkhorn_l=5,
        donate_buffers=False,
        global_batch_sinkhorn=True,
        num_devices=8,
        model=ModelConfig(
            x_height=16, x_width=16, n_channels=1,
            g_filter_size=2, d_filter_size=2,
            g_state_size=3, d_state_size=3,
            z_channels=4, z_height=1, z_width=1,
        ),
    )
    base.update(kw)
    return TrainConfig(**base)


def _compiled_hlo(cfg):
    mesh = make_mesh(8)
    mods = GanModules(cfg)
    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    batch = shard_batch(
        jnp.array(bouncing_blobs(cfg.batch_size, cfg.total_time_steps, 16, 16)),
        mesh,
    )
    step = build_sharded_train_step(cfg, mods, mesh)
    text = step.lower(state, batch).compile().as_text()
    return text if isinstance(text, str) else "\n".join(text)


def test_dp_program_collective_set():
    ops = collect_collectives(_compiled_hlo(_tiny_cfg()))
    kinds = {o["op"] for o in ops}
    # Both expected families present...
    assert "all-gather" in kinds, kinds
    assert "all-reduce" in kinds, kinds
    # ...and nothing else: pure DP never reshards or ring-relays.
    assert kinds <= {"all-gather", "all-reduce"}, kinds

    # The feature all-gathers rebuild the GLOBAL batch dim (8 here):
    # at least one gathered operand must lead with [8, ...].
    gathered = [
        s for o in ops if o["op"] == "all-gather" for s in o["shapes"]
    ]
    assert any(s.split("[")[1].startswith("8,") for s in gathered), gathered


def test_seq_program_collective_set():
    """The 2-D (data x seq) program adds exactly one collective family
    over pure DP: collective-permute — the ring relay handing the
    ConvLSTM (h, c) carries between time shards.  Grad all-reduces and
    the loss-input gathers are still present; nothing else appears."""
    from kccotgan_tpu.parallel import (
        build_seq_train_step, data_seq_mesh, seq_batch_sharding,
        seq_replicated,
    )

    cfg = _tiny_cfg(
        batch_size=4,
        total_time_steps=8,
        int_time_steps=4,  # pred = 4: both divide the seq size (4)
        num_devices=2,
        seq_devices=4,
    )
    mesh = data_seq_mesh(2, 4)
    mods = GanModules(cfg)
    state = jax.device_put(
        create_train_state(cfg, jax.random.PRNGKey(0)), seq_replicated(mesh)
    )
    batch = jax.device_put(
        jnp.array(bouncing_blobs(cfg.batch_size, cfg.total_time_steps, 16, 16)),
        seq_batch_sharding(mesh),
    )
    text = (
        build_seq_train_step(cfg, mods, mesh)
        .lower(state, batch).compile().as_text()
    )
    if not isinstance(text, str):
        text = "\n".join(text)
    kinds = {o["op"] for o in collect_collectives(text)}
    assert "collective-permute" in kinds, kinds  # the ring relay
    assert "all-reduce" in kinds, kinds          # replicated-param grads
    assert kinds <= {"all-gather", "all-reduce", "collective-permute"}, kinds


def test_comms_summary_prices_ops():
    summary = comms_summary(_compiled_hlo(_tiny_cfg()), 8)
    assert summary["collective_count"] > 0
    assert summary["total_bytes"] > 0
    assert summary["est_ici_us_per_step"] > 0
    per_kind = summary["per_kind"]
    # All-reduce moves ~2x its payload on a ring; all-gather ~1x.  The
    # pricing must reflect that asymmetry for equal byte counts.
    ar = per_kind["all-reduce"]
    ag = per_kind["all-gather"]
    assert ar["ici_us"] / ar["bytes"] > ag["ici_us"] / ag["bytes"]


def test_collect_collectives_parser():
    hlo = """
  %ag = f32[8,16] all-gather(f32[1,16] %x), replica_groups={}
  %ar.1 = (f32[4], bf16[2,2]) all-reduce-start(f32[4] %a, bf16[2,2] %b)
  %cp = f32[2] collective-permute(f32[2] %y)
  %noise = f32[2] add(f32[2] %y, f32[2] %y)
"""
    ops = collect_collectives(hlo)
    assert [o["op"] for o in ops] == [
        "all-gather", "all-reduce", "collective-permute",
    ]
    assert ops[0]["bytes"] == 8 * 16 * 4
    assert ops[1]["bytes"] == 4 * 4 + 2 * 2 * 2
