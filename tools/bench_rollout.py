#!/usr/bin/env python
"""Inference (autoregressive rollout) benchmark on the real TPU.

The serving path: encode a context clip once, then generate
``pred_time_steps`` frames autoregressively with the O(T) carried-state
rollout (`train/rollout.py`; the reference re-encodes the growing clip
per frame — O(T^2), `/root/reference/kernel_train.py:339-356`).

Measures, with the chained-sync harness (`utils/timing.py` — naive
block_until_ready is unreliable under the axon tunnel):

* batch throughput: full rollout at serving batch, generated frames/sec
* interactive latency: B=1 rollout wall time per clip

Emits one JSON line per measured config.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,32",
                   help="comma list of batch sizes to measure")
    p.add_argument("--time-steps", type=int, default=20)
    p.add_argument("--context", type=int, default=10)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import bouncing_blobs
    from kccotgan_tpu.train import GanModules, create_train_state
    from kccotgan_tpu.train.rollout import build_rollout
    from kccotgan_tpu.utils.timing import sync_floor, time_chained

    floor = None
    for batch in [int(b) for b in args.batches.split(",")]:
        cfg = TrainConfig(
            dname="mmnist",
            batch_size=batch,
            total_time_steps=args.time_steps,
            int_time_steps=args.context,
            compute_dtype=args.dtype,
            model=ModelConfig(
                x_height=64, x_width=64, n_channels=args.channels
            ),
        )
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        rollout = build_rollout(cfg, mods)
        context = jnp.array(
            bouncing_blobs(batch, args.context, 64, 64,
                           channels=args.channels, seed=0)
        )
        rng = jax.random.PRNGKey(7)

        # Chain through the context so call i+1 depends on call i.
        def chained(state, context, rng, s):
            return rollout(state, context + s, rng)

        if floor is None:
            floor = sync_floor()
            print(f"# sync floor: {floor * 1e3:.1f} ms", file=sys.stderr)
        dt = time_chained(
            chained, state, context, rng, iters=args.reps, floor=floor
        )
        pred = cfg.pred_time_steps
        print(
            json.dumps(
                {
                    "metric": "rollout",
                    "batch": batch,
                    "context_frames": args.context,
                    "generated_frames": pred,
                    "ms_per_rollout": round(dt * 1e3, 2),
                    "generated_frames_per_sec": round(batch * pred / dt, 1),
                    "ms_per_frame_b1": round(dt * 1e3 / pred, 3)
                    if batch == 1 else None,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
