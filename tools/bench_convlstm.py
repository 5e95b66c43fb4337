#!/usr/bin/env python
"""Per-layer ConvLSTM recurrence bench: lax.scan vs fused Pallas kernel.

Times the full ConvLSTM2D layer (hoisted input conv + recurrence) at the
flagship MMNIST-64 B=32 shapes for every ConvLSTM in the model, forward
and forward+grad, for both kernel_impl settings.  The hoisted conv is
identical across impls, so deltas isolate the recurrence engine.

Usage: python tools/bench_convlstm.py [--batch 32] [--impl scan,pallas]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from kccotgan_tpu.models.layers import ConvLSTM2D  # noqa: E402
from kccotgan_tpu.utils import timing  # noqa: E402

# (name, T, H, W, C_in, filters, k, stride) — flagship MMNIST-64, f=8
LAYERS = [
    ("enc1", 20, 64, 64, 1, 32, 6, 2),
    ("enc2", 20, 32, 32, 32, 64, 6, 2),
    ("enc3", 20, 16, 16, 64, 128, 5, 2),
    ("enc4", 20, 8, 8, 128, 256, 5, 2),
    ("dec2", 15, 8, 8, 384, 128, 4, 1),
    ("dec3", 15, 16, 16, 192, 64, 6, 1),
    ("dec4", 15, 32, 32, 96, 32, 8, 1),
    ("dec5", 15, 64, 64, 17, 8, 8, 1),
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

    for name, t, h, w, c, f, k, s in layers:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (args.batch, t, h, w, c), jnp.float32
        )
        cols = []
        for impl in impls:
            layer = ConvLSTM2D(
                filters=f, kernel_size=(k, k), strides=(s, s),
                use_bias=True, compute_dtype=args.dtype, kernel_impl=impl,
                remat=(impl == "scan"),
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
