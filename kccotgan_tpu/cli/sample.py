"""Sampling CLI: conditioned rollouts from a trained checkpoint.

The reference only samples inside the training loop (TensorBoard image
summaries, `kernel_train.py:339-356`); this gives the capability a
standalone entry point producing the same artifacts the reference
README showcases (gifs + film-strip grids):

  python -m kccotgan_tpu.cli.sample --preset mmnist_full \
      --ckpt trained/run/ckpt --out samples/
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
    p.add_argument("--data_path", type=str, default="../data")
    p.add_argument("--out", type=str, default="samples")
    p.add_argument("--num", type=int, default=4, help="videos to sample")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--metrics_k", type=int, default=0,
                   help="if > 0, also report best-of-K PSNR/SSIM of the "
                        "predicted future vs the ground truth (standard "
                        "stochastic video-prediction protocol)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ckpt import restore_checkpoint
    from ..config import get_preset
    from ..data import make_dataset
    from ..train import GanModules, create_train_state
    from ..train.rollout import build_rollout
    from ..utils import display_frames, save_video_gif

    cfg = dataclasses.replace(
        get_preset(args.preset), data_path=args.data_path, seed=args.seed
    )
    mods = GanModules(cfg)
    state = restore_checkpoint(
        args.ckpt, create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    )

    batches, test_batch = make_dataset(cfg)
    if test_batch is None:  # fall back to the train stream for context
        test_batch = next(iter(batches))
    ctx = jnp.array(test_batch[: args.num, :, : cfg.int_time_steps])

    rollout = build_rollout(cfg, mods)
    video = rollout(state, ctx, jax.random.PRNGKey(args.seed))
    video = np.asarray(video)  # [N, H, T, W, C]

    if args.metrics_k > 0 and test_batch.shape[2] > cfg.int_time_steps:
        import json

        from ..eval import best_of_k

        m = best_of_k(
            rollout,
            state,
            jnp.asarray(test_batch[: args.num], jnp.float32),
            cfg.int_time_steps,
            jax.random.PRNGKey(args.seed + 1),
            k=args.metrics_k,
        )
        print(json.dumps({
            "best_of_k": args.metrics_k,
            "psnr": round(float(m["psnr"]), 4),
            "ssim": round(float(m["ssim"]), 4),
            "psnr_per_step": [round(float(v), 3) for v in m["psnr_per_step"]],
            "ssim_per_step": [round(float(v), 4) for v in m["ssim_per_step"]],
        }))
    n, h, t, w, c = video.shape

    os.makedirs(args.out, exist_ok=True)
    strip_png = display_frames(
        video, os.path.join(args.out, "rollout_strips.png"),
        rows=min(n, 4), seed=args.seed,
    )
    nx = max(int(np.floor(np.sqrt(n))), 1)
    ny = max(n // nx, 1)
    gif = save_video_gif(
        video[: nx * ny].reshape(nx * ny, h, t * w, c),
        os.path.join(args.out, "rollout.gif"),
        nx, ny, time_steps=t, x_height=h, x_width=w, fps=args.fps,
    )
    print(f"wrote {strip_png} and {gif} (step {int(jax.device_get(state.step))})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
