#!/usr/bin/env python
"""Multi-chip comms accounting for the GSPMD data-parallel train step.

Compiles the 8-device global-batch sharded training step on a VIRTUAL
CPU mesh (the same trick the test suite and `__graft_entry__.
dryrun_multichip` use — GSPMD partitioning and collective insertion are
backend-independent), walks the optimized HLO, and reports every
collective: op kind, tensor shape(s), bytes, and an ICI-time estimate
for a v5e ring.

This is the only multi-chip perf signal available on a 1-chip bench rig
(round-2 VERDICT "missing #3"): it answers *what the 8-chip flagship
program actually communicates per step* — the feature all-gathers the
global-batch Sinkhorn inserts and the gradient all-reduces for the
replicated parameters.

Compile time is graph-bound, not shape-bound, so the default is the
REAL flagship shape (MMNIST-64, B=32, T=20, L=100).

Usage: python tools/comms_report.py [--devices 8] [--batch 32] ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Ring-collective cost model (How to Scale Your Model, §collectives):
# over an N-device ring, an all-gather producing V bytes moves
# V*(N-1)/N per link; an all-reduce of V bytes moves 2*V*(N-1)/N
# (reduce-scatter + all-gather).  Parsing + pricing live in the
# library so tests can pin the collective set of the compiled program.
from kccotgan_tpu.parallel.comms import (  # noqa: E402
    ICI_LINK_GBPS,
    collect_collectives,
    ici_time_us,
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch", type=int, default=32, help="GLOBAL batch")
    p.add_argument("--time-steps", type=int, default=20)
    p.add_argument("--context", type=int, default=10)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--sinkhorn-l", type=int, default=100)
    p.add_argument("--solver", default="scan", choices=["scan", "pallas", "auto"],
                   help="scan by default: the Pallas kernel falls back to "
                        "interpret mode on CPU and bloats compile time")
    p.add_argument("--local", action="store_true",
                   help="report the per-shard (shard_map+pmean) mode instead")
    p.add_argument("--seq", type=int, default=1,
                   help="seq-mesh size: >1 reports the sequence-parallel "
                        "program (2-D data x seq when devices > seq) — "
                        "ring-relay ppermutes + grad all-reduces + loss-"
                        "input gathers.  total/pred time steps must "
                        "divide by it")
    args = p.parse_args()

    # Virtual device mesh BEFORE backend init (never point this CPU
    # compile at .jax_cache — see tests/conftest.py).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import bouncing_blobs
    from kccotgan_tpu.parallel import (
        build_sharded_train_step, make_mesh, replicate_state, shard_batch,
    )
    from kccotgan_tpu.train import GanModules, create_train_state

    cfg = TrainConfig(
        dname="mmnist",
        batch_size=args.batch,
        total_time_steps=args.time_steps,
        int_time_steps=args.context,
        sinkhorn_l=args.sinkhorn_l,
        sinkhorn_solver=args.solver,
        donate_buffers=False,
        global_batch_sinkhorn=not args.local,
        num_devices=args.devices,
        seq_devices=args.seq,
        model=ModelConfig(
            x_height=args.height, x_width=args.width, n_channels=args.channels
        ),
    )
    mods = GanModules(cfg)
    data = jnp.array(bouncing_blobs(
        args.batch, args.time_steps, args.height, args.width,
        channels=args.channels, seed=0,
    ))
    if args.seq > 1:
        from kccotgan_tpu.parallel import (
            build_seq_train_step, data_seq_mesh, seq_batch_sharding,
            seq_mesh, seq_replicated,
        )

        n_data = args.devices // args.seq
        mesh = (
            data_seq_mesh(n_data, args.seq) if n_data > 1
            else seq_mesh(args.seq)
        )
        state = jax.device_put(
            create_train_state(cfg, jax.random.PRNGKey(0)),
            seq_replicated(mesh),
        )
        batch = jax.device_put(data, seq_batch_sharding(mesh))
        # compile_only: this tool never EXECUTES the program, so the
        # XLA:CPU runtime-rendezvous validations don't apply
        step = build_seq_train_step(cfg, mods, mesh, compile_only=True)
    else:
        mesh = make_mesh(args.devices)
        state = replicate_state(
            create_train_state(cfg, jax.random.PRNGKey(0)), mesh
        )
        batch = shard_batch(data, mesh)
        step = build_sharded_train_step(cfg, mods, mesh)
    compiled = step.lower(state, batch).compile()
    text = compiled.as_text()
    if not isinstance(text, str):
        text = "\n".join(text)

    ops = collect_collectives(text)
    n = args.devices
    per_kind: dict[str, dict] = {}
    for o in ops:
        o["ici_us"] = round(ici_time_us(o["op"], o["bytes"], n), 2)
        k = per_kind.setdefault(o["op"], {"count": 0, "bytes": 0, "ici_us": 0.0})
        k["count"] += 1
        k["bytes"] += o["bytes"]
        k["ici_us"] = round(k["ici_us"] + o["ici_us"], 2)

    total_bytes = sum(o["bytes"] for o in ops)
    total_us = round(sum(o["ici_us"] for o in ops), 2)
    if args.seq > 1:
        mode = (
            f"seq-parallel {args.devices // args.seq}x{args.seq} data x seq"
            if args.devices > args.seq else f"seq-parallel 1-D x{args.seq}"
        )
    elif args.local:
        mode = "local-shard (pmean)"
    else:
        mode = "global-batch GSPMD"
    print(
        f"# comms[{mode}] {n}-dev mesh, B={args.batch} T={args.time_steps} "
        f"{args.height}x{args.width}x{args.channels}: {len(ops)} collectives, "
        f"{total_bytes/1e6:.2f} MB, ~{total_us:.0f} us ICI "
        f"(ring model, {ICI_LINK_GBPS:.0f} GB/s one-way/link)",
        file=sys.stderr,
    )
    for o in sorted(ops, key=lambda x: -x["bytes"])[:20]:
        print(
            f"#  {o['bytes']/1e6:9.3f} MB  {o['op']:19s} {','.join(o['shapes'])[:90]}"
            f"  ~{o['ici_us']:.1f} us",
            file=sys.stderr,
        )
    print(json.dumps({
        "mode": mode,
        "devices": n,
        "batch": args.batch,
        "time_steps": args.time_steps,
        "collective_count": len(ops),
        "total_bytes": total_bytes,
        "est_ici_us_per_step": total_us,
        "per_kind": per_kind,
        "ops": sorted(ops, key=lambda x: -x["bytes"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
