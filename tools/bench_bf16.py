#!/usr/bin/env python
"""bf16-vs-f32 training-parity run on the real TPU (PARITY.md evidence).

Trains the flagship MMNIST-64 configuration twice from the same init
and data stream — compute_dtype float32 vs bfloat16 (MXU conv/matmul
inputs only; params, gate math, Sinkhorn all stay f32) — and records
both loss curves.  The decision rule: flip the bf16 default only if the
curves track within run-to-run noise.

Emits one JSON line with both curves and summary stats.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--time-steps", type=int, default=20)
    p.add_argument("--context", type=int, default=10)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--init-seed", type=int, default=0,
                   help="param-init PRNG seed (vary for a same-dtype "
                        "run-to-run noise baseline)")
    p.add_argument("--dtypes", default="float32,bfloat16",
                   help="comma-separated compute dtypes to run")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import ArrayDataset, bouncing_blobs
    from kccotgan_tpu.train import GanModules, build_train_step, create_train_state

    data = bouncing_blobs(max(4 * args.batch, 128), args.time_steps, 64, 64, seed=0)

    curves = {}
    times = {}
    for dtype in args.dtypes.split(","):
        cfg = TrainConfig(
            dname="mmnist",
            batch_size=args.batch,
            total_time_steps=args.time_steps,
            int_time_steps=args.context,
            sinkhorn_l=100,
            compute_dtype=dtype,
            model=ModelConfig(x_height=64, x_width=64, n_channels=1),
        )
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(args.init_seed))
        step_fn = build_train_step(cfg, mods)
        ds = ArrayDataset(np.asarray(data), args.batch, seed=1)
        curve = []
        it = ds.repeat(10_000)
        t0 = None
        for i in range(args.steps):
            batch = jnp.array(next(it))
            state, metrics = step_fn(state, batch)
            if i == 0:
                float(metrics["sinkhorn_loss"])  # sync past compile
                t0 = time.perf_counter()
            if (i + 1) % args.log_every == 0:
                # keep the scalar ON DEVICE inside the timed loop (a
                # float() here costs one ~30 ms RPC readback per step
                # on the axon tunnel); fetch after the final sync.
                curve.append(metrics["sinkhorn_loss"])
        float(curve[-1])  # true sync: chain runs through state
        dt = (time.perf_counter() - t0) / (args.steps - 1)
        curve = [round(float(v), 5) for v in curve]
        curves[dtype] = curve
        times[dtype] = round(dt * 1e3, 2)
        print(f"# {dtype}: {dt*1e3:.1f} ms/step, final loss {curve[-1]}", file=sys.stderr)

    out = {
        "steps": args.steps,
        "log_every": args.log_every,
        "init_seed": args.init_seed,
        "ms_per_step": times,
        "final_loss": {k: float(v[-1]) for k, v in curves.items()},
        "tail_mean_loss": {
            k: round(float(np.array(v)[-max(len(v) // 2, 1):].mean()), 5)
            for k, v in curves.items()
        },
        "curves": curves,
    }
    if len(curves) == 2:
        a, b = (np.array(v) for v in curves.values())
        out["max_abs_curve_gap"] = round(float(np.max(np.abs(a - b))), 5)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
