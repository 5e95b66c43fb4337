#!/usr/bin/env python
"""Sinkhorn solver sweep: fused Pallas kernel vs XLA scan on the real TPU.

Times the full mixed causal-Sinkhorn divergence (3 solves — the exact
call the training step makes) forward and forward+grad across batch
sizes and iteration counts, to locate the regime where keeping the
``[3, B, B]`` cost stack + duals resident in VMEM beats XLA's scan
(which streams duals through HBM between fused sub-kernels).

Emits one JSON line per configuration to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="32,128,256")
    p.add_argument("--iters", type=str, default="100,500")
    p.add_argument("--time-steps", type=int, default=20)
    p.add_argument("--feat", type=int, default=4096, help="per-frame features (64*64*1)")
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--no-cache", action="store_true")
    args = p.parse_args()

    if not args.no_cache:
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
        )
    import jax

    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from kccotgan_tpu.ot import compute_sinkhorn_loss
    from kccotgan_tpu.utils import timing

    floor = timing.sync_floor()

    key = jax.random.PRNGKey(0)
    t, f = args.time_steps, args.feat
    sc = 1.0 / 15.0

    for b in (int(x) for x in args.batches.split(",")):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        fr = jax.random.uniform(k1, (b, t, f), jnp.float32)
        ff = jax.random.uniform(k2, (b, t, f), jnp.float32)
        h_f = jax.random.normal(k3, (b, t, 8), jnp.float32)
        m_r = jax.random.normal(k4, (b, t, 8), jnp.float32)
        h_r = h_f + 0.1
        m_f = m_r + 0.1

        for num_iters in (int(x) for x in args.iters.split(",")):
            for solver in ("scan", "pallas"):

                def loss_fn(fr_, ff_):
                    return compute_sinkhorn_loss(
                        fr_, ff_, sc, h_f, m_r, h_r, m_f,
                        video=False, num_iters=num_iters, solver=solver,
                    )

                # Chained-sync timing (utils/timing.py): unchained
                # loops misread / can wedge the axon data plane.
                fwd = jax.jit(lambda fr_, ff_, ss: loss_fn(fr_ + ss, ff_))
                vgrad = jax.value_and_grad(loss_fn, argnums=(0, 1))
                grad = jax.jit(lambda fr_, ff_, ss: vgrad(fr_ + ss, ff_))

                v = fwd(fr, ff, jnp.float32(0.0))  # loss for the report row
                fwd_ms = timing.time_chained(
                    fwd, fr, ff, iters=args.reps, floor=floor
                ) * 1e3
                grad_ms = timing.time_chained(
                    grad, fr, ff, iters=args.reps, floor=floor
                ) * 1e3

                print(
                    json.dumps(
                        {
                            "solver": solver,
                            "B": b,
                            "L": num_iters,
                            "fwd_ms": round(fwd_ms, 3),
                            "fwd_grad_ms": round(grad_ms, 3),
                            "loss": round(float(v), 6),
                        }
                    ),
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
