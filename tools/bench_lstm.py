#!/usr/bin/env python
"""Per-layer LSTM recurrence bench: lax.scan vs fused Pallas kernel.

Times the full LSTM layer (hoisted input projection + recurrence) at
the flagship discriminator shapes (B=32, T=20, d_filter_size=8 — conv
features 8*8*128 into lstm1), forward and forward+grad, for both
kernel_impl settings.  The hoisted projection is identical across
impls, so deltas isolate the recurrence engine.

Usage: python tools/bench_lstm.py [--batch 32] [--impl scan,pallas]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from kccotgan_tpu.models.layers import LSTM  # noqa: E402
from kccotgan_tpu.utils import timing  # noqa: E402

# (name, T, feat_in, units, activation) — flagship discriminator stack
LAYERS = [
    ("lstm1", 20, 8 * 8 * 128, 64, "tanh"),
    ("lstm2", 20, 64, 32, "tanh"),
    ("lstm3", 20, 32, 8, "sigmoid"),
]


def bench(fn, *args, iters=20, floor=None):
    # fn takes a trailing chain scalar; see utils/timing.py for why
    # (axon block_until_ready returns early; unchained loops misread).
    return timing.time_chained(fn, *args, iters=iters, floor=floor) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--impl", default="scan,pallas")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layers", default="",
                    help="comma-separated subset of layer names")
    args = ap.parse_args()
    impls = args.impl.split(",")
    layers = [
        L for L in LAYERS
        if not args.layers or L[0] in args.layers.split(",")
    ]

    print(f"backend={jax.default_backend()} B={args.batch} "
          f"compute_dtype={args.dtype}")
    header = f"{'layer':6} " + "  ".join(
        f"{i + s:>14}" for i in impls for s in ("_fwd_ms", "_grad_ms")
    )
    print(header)
    floor = timing.sync_floor()

    for name, t, feat, u, act in layers:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (args.batch, t, feat), jnp.float32
        )
        cols = []
        for impl in impls:
            layer = LSTM(
                units=u, activation=act, compute_dtype=args.dtype,
                kernel_impl=impl, remat=(impl == "scan"),
            )
            params = layer.init(jax.random.PRNGKey(1), x)

            fwd = jax.jit(lambda p, xx, ss, L=layer: L.apply(p, xx + ss))
            gfn = jax.jit(
                jax.grad(
                    lambda p, xx, ss, L=layer: jnp.sum(L.apply(p, xx + ss) ** 2)
                )
            )
            try:
                f_ms = bench(fwd, params, x, iters=args.iters, floor=floor)
            except Exception as e:  # noqa: BLE001
                cols += [f"ERR:{type(e).__name__}"[:14], "-"]
                continue
            try:
                g_ms = bench(gfn, params, x, iters=args.iters, floor=floor)
            except Exception as e:  # noqa: BLE001
                cols += [f"{f_ms:14.3f}", f"ERR:{type(e).__name__}"[:14]]
                continue
            cols += [f"{f_ms:14.3f}", f"{g_ms:14.3f}"]
        print(f"{name:6} " + "  ".join(f"{c:>14}" for c in cols))


if __name__ == "__main__":
    main()
