#!/usr/bin/env python
"""AOT-lower flagship training programs for the TPU platform on a CPU host.

Pallas kernels lower to Mosaic MLIR at *lowering* time, not at backend
compile time — so `jax.export(..., platforms=['tpu'])` on a CPU-only
machine catches the whole class of "unsupported Mosaic op" failures
(in-kernel pads, 5-D blocks, reshape constraints, index-map forms)
without touching a TPU.  The remaining on-device risk is the
Mosaic->binary step (layout inference, VMEM fit), which only the real
chip can check.

This is the pre-flight we run before queueing anything on the (shared,
slow-to-reacquire) TPU tunnel: a config that fails here would waste a
tunnel slot.

Usage:
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/lower_tpu.py \
      [--config default|mazes_rgb|long_horizon] [--kernel-impl pallas] \
      [--solver auto] [--dtype bfloat16]

(The env overrides matter: the axon sitecustomize registers the remote
TPU backend in EVERY python process when PALLAS_AXON_POOL_IPS is set,
and hangs at import while the tunnel is down.)
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="default",
                   choices=["default", "mazes_rgb", "long_horizon"])
    p.add_argument("--kernel-impl", default="pallas",
                   choices=["scan", "pallas", "auto"])
    p.add_argument("--solver", default="pallas",
                   choices=["auto", "scan", "pallas"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax
    import jax.export
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        print("# warning: expected a CPU-only host (set JAX_PLATFORMS=cpu "
              "PALLAS_AXON_POOL_IPS=)", file=sys.stderr)

    sys.path.insert(0, ".")
    from bench import BENCH_CONFIGS

    import kccotgan_tpu.models.pallas_convlstm as pallas_convlstm
    import kccotgan_tpu.models.pallas_lstm as pallas_lstm
    import kccotgan_tpu.ot.pallas_sinkhorn as pallas_sinkhorn
    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import bouncing_blobs
    from kccotgan_tpu.train import (
        GanModules,
        build_train_step,
        create_train_state,
    )

    shape = BENCH_CONFIGS[args.config]
    cfg = TrainConfig(
        dname="mmnist",
        batch_size=shape["batch"],
        total_time_steps=shape["time_steps"],
        int_time_steps=shape["context"],
        sinkhorn_l=100,
        sinkhorn_solver=args.solver,
        compute_dtype=args.dtype,
        kernel_impl=args.kernel_impl,
        model=ModelConfig(x_height=64, x_width=64,
                          n_channels=shape["channels"]),
    )

    t0 = time.time()
    mods = GanModules(cfg)
    # Param init runs eagerly on the CPU backend — leave the kernels in
    # interpret mode for it (slow but correct), then force the real
    # Mosaic lowering for the export below.
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = build_train_step(cfg, mods)
    batch = jnp.array(
        bouncing_blobs(shape["batch"], shape["time_steps"], 64, 64,
                       channels=shape["channels"], seed=0)
    )
    print(f"# setup {time.time() - t0:.0f}s", file=sys.stderr)

    pallas_convlstm._interpret = lambda: False
    pallas_lstm._interpret = lambda: False
    if hasattr(pallas_sinkhorn, "_interpret"):
        pallas_sinkhorn._interpret = lambda: False

    t0 = time.time()
    exported = jax.export.export(step_fn, platforms=["tpu"])(state, batch)
    n = len(exported.mlir_module())
    print(
        f"OK config={args.config} kernel_impl={args.kernel_impl} "
        f"solver={args.solver} dtype={args.dtype}: full train step lowered "
        f"for TPU ({n} MLIR bytes, {time.time() - t0:.0f}s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
