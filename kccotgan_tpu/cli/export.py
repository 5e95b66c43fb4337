"""Export CLI: package a trained checkpoint as a serving artifact.

The deployment counterpart of ``cli.sample`` (the reference offers
neither — sampling lives inline in its training loop,
`kernel_train.py:339-356`).  Produces ONE self-contained file via
``jax.export`` (see ``kccotgan_tpu/export.py``): weights baked in,
batch dimension symbolic, runnable on CPU or TPU with no model code.

  python -m kccotgan_tpu.cli.export --preset mmnist_full \
      --ckpt trained/run/ckpt --out model.kccot --check
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", type=str, default="mmnist_small")
    p.add_argument("--ckpt", type=str, required=True,
                   help="checkpoint dir written by the trainer")
    p.add_argument("--out", type=str, default="model.kccot")
    p.add_argument("--batch", type=int, default=None,
                   help="bake a static batch size (default: symbolic — "
                        "one artifact serves any batch)")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated export targets")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify it reproduces "
                        "the live rollout bit-for-bit on a synthetic batch")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from ..ckpt import restore_checkpoint
    from ..config import get_preset
    from ..export import load_rollout, save_rollout
    from ..train import create_train_state

    cfg = get_preset(args.preset)
    state = restore_checkpoint(
        args.ckpt, create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    )
    header = save_rollout(
        args.out, cfg, state,
        batch_polymorphic=args.batch is None,
        batch_size=args.batch,
        platforms=tuple(s for s in args.platforms.split(",") if s),
    )
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB): {header}")

    if args.check:
        import dataclasses

        import numpy as np
        import jax.numpy as jnp

        from ..train import GanModules
        from ..train.rollout import build_rollout

        m = cfg.model
        b = args.batch or 2
        ctx = np.random.RandomState(0).rand(
            b, m.x_height, cfg.int_time_steps, m.x_width, m.n_channels
        ).astype("float32")
        got = load_rollout(args.out)(ctx, seed=0)
        # compare against the scan engine — the one the artifact bakes
        # (engines are numerically pinned to each other elsewhere)
        scan_cfg = dataclasses.replace(cfg, kernel_impl="scan")
        want = build_rollout(scan_cfg, GanModules(scan_cfg))(
            state, jnp.asarray(ctx), jax.random.PRNGKey(0)
        )
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"check: max|artifact - live rollout| = {err} on batch {b}")
        if err != 0.0:
            print("CHECK FAILED", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
