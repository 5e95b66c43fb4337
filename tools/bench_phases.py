#!/usr/bin/env python
"""Per-phase breakdown of the full training step on the real TPU.

Times each component of the flagship MMNIST-64 step in isolation
(forward + backward via value_and_grad where training does so):
encoder scan pyramid, U-Net decoder, the 4 discriminator passes, the
mixed Sinkhorn solves, smoothing, and the full fused step for
comparison.  Isolated timings don't capture XLA's cross-component
fusion/overlap inside the real step, so they over-count slightly; the
ratio profile is what matters (PARITY.md records it).

Emits one JSON line per component.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--time-steps", type=int, default=20)
    p.add_argument("--context", type=int, default=10)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--kernel", default="none", choices=["none", "1d", "2d", "3d"])
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
    from kccotgan_tpu.ot import compute_sinkhorn_loss, martingale_regularization
    from kccotgan_tpu.smoothing import apply_smoothing
    from kccotgan_tpu.train import GanModules, build_train_step, create_train_state

    cfg = TrainConfig(
        dname="mmnist",
        batch_size=args.batch,
        total_time_steps=args.time_steps,
        int_time_steps=args.context,
        sinkhorn_l=100,
        kernel=args.kernel,
        model=ModelConfig(x_height=64, x_width=64, n_channels=1),
    )
    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    video = jnp.array(bouncing_blobs(args.batch, args.time_steps, 64, 64, seed=0))
    z = jax.random.normal(
        jax.random.PRNGKey(1), mods.z_shape(args.batch, cfg.pred_time_steps)
    )
    sigma = jnp.float32(cfg.init_sigma)

    from kccotgan_tpu.utils import timing

    floor = timing.sync_floor()

    def timeit(name, fn, *inputs):
        # Chained-sync timing (utils/timing.py): the chain scalar is
        # folded into every leaf of the first input so iteration i+1
        # data-depends on iteration i (axon block_until_ready acks
        # enqueue only; unchained loops misread / can wedge).
        def chained(*a):
            *xs, ss = a
            xs = list(xs)
            xs[0] = jax.tree_util.tree_map(
                lambda q: q + ss.astype(q.dtype), xs[0]
            )
            return fn(*xs)

        ms = timing.time_chained(
            jax.jit(chained), *inputs, iters=args.reps, floor=floor
        ) * 1e3
        print(json.dumps({"component": name, "ms": round(ms, 2)}), flush=True)

    # ---- components (fwd + bwd, as the training step drives them) ----
    def enc_loss(params):
        pyr = mods.encoder.apply({"params": params}, video, training=True)
        return sum(jnp.sum(p) for p in pyr)

    timeit("encoder fwd+bwd", jax.jit(jax.value_and_grad(enc_loss)), state.enc_params)

    pyramid = jax.jit(
        lambda p: mods.encoder.apply({"params": p}, video, training=True)
    )(state.enc_params)

    def dec_loss(params):
        fake = mods.decoder.apply({"params": params}, pyramid, z, training=True)
        return jnp.sum(fake)

    timeit("decoder fwd+bwd", jax.jit(jax.value_and_grad(dec_loss)), state.dec_params)

    fake_pred = jax.jit(
        lambda p: mods.decoder.apply({"params": p}, pyramid, z, training=True)
    )(state.dec_params)
    fake = jnp.concatenate([video[:, :, : cfg.int_time_steps], fake_pred], axis=2)

    def disc4_loss(hp, mp):
        outs = []
        for params, x in ((hp, fake), (hp, video), (mp, video), (mp, fake)):
            out, _ = mods.disc_h.apply(
                {"params": params}, x, training=True, mutable=["batch_stats"]
            )
            outs.append(jnp.sum(out))
        return sum(outs)

    timeit(
        "discriminators x4 fwd+bwd",
        jax.jit(jax.value_and_grad(disc4_loss, argnums=(0, 1))),
        state.h_params, state.m_params,
    )

    hm = jax.jit(
        lambda p, x: mods.disc_h.apply(
            {"params": p}, x, training=True, mutable=["batch_stats"]
        )[0]
    )
    h_fake, h_real = hm(state.h_params, fake), hm(state.h_params, video)
    m_real, m_fake = hm(state.m_params, video), hm(state.m_params, fake)

    def sink_loss(fr, ff):
        loss = compute_sinkhorn_loss(
            fr, ff, cfg.effective_scaling, h_fake, m_real, h_real, m_fake,
            video=True, num_iters=cfg.sinkhorn_l, solver=cfg.sinkhorn_solver,
        )
        return loss + martingale_regularization(m_real, cfg.reg_penalty, cfg.effective_scaling)

    timeit(
        "sinkhorn 3-solve + pM fwd+bwd",
        jax.jit(jax.value_and_grad(sink_loss, argnums=(0, 1))),
        video, fake,
    )

    if cfg.kernel != "none":
        timeit(
            "smoothing fwd",
            jax.jit(lambda x: apply_smoothing(x, sigma, cfg.kernel)),
            video,
        )

    step_fn = build_train_step(cfg, mods, donate=False)
    state2, metrics = step_fn(state, video)
    float(metrics["sinkhorn_loss"])
    t0 = time.perf_counter()
    for _ in range(args.reps):
        state2, metrics = step_fn(state2, video)
    float(metrics["sinkhorn_loss"])
    ms = (time.perf_counter() - t0) / args.reps * 1e3
    print(json.dumps({"component": "FULL train step (2 phases)", "ms": round(ms, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
