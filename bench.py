#!/usr/bin/env python
"""Benchmark harness: KCCOT-GAN training throughput on real TPU.

Measures full training steps (disc + gen phase, 6x L Sinkhorn solves,
all four Adam updates) on the flagship MMNIST-64 configuration and
prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the north-star target is >=5x a V100 running the reference
eager-TF2 implementation (BASELINE.json; the reference publishes no
numbers).  We use a documented estimate of the reference's V100
throughput: the reference runs B=2 eager with 600 un-fused Sinkhorn
iterations + 4 un-jitted ConvLSTM model passes per step; public
V100 numbers for comparable eager ConvLSTM video-GAN steps put it at
~1-2 s/step => ~15-30 frames/sec.  We take the GENEROUS end (30
frames/sec) so vs_baseline is conservative.  vs_baseline = value / 30.

Usage: python bench.py [--steps N] [--batch B] [--no-cache]
"""

import argparse
import json
import os
import sys
import time

REF_V100_FRAMES_PER_SEC = 30.0  # generous estimate, see module docstring

# Per-chip peaks for MFU / roofline accounting.  TPU v5e (v5 lite):
# 197 TFLOP/s bf16 on the MXU, 819 GB/s HBM bandwidth (public spec).
# f32 has no separate MXU rate on v5e — MFU is reported against the
# bf16 peak (the convention of the scaling-book roofline).
TPU_PEAKS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v6 lite": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
}


def roofline(step_fn, state, batch, dt: float):
    """FLOP/byte accounting of the compiled step via XLA's cost model.

    Returns a dict with achieved TFLOP/s, MFU vs the chip's bf16 peak,
    achieved HBM GB/s vs peak, and which resource binds.  ``flops`` is
    the EXECUTED count (includes remat recompute), so mfu is true
    hardware utilization, not model utilization.
    """
    import jax

    try:
        ca = step_fn.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
        return {}
    flops = float(ca.get("flops", 0.0) or 0.0)
    bytes_accessed = float(ca.get("bytes accessed", 0.0) or 0.0)
    if flops <= 0:
        return {}
    kind = jax.devices()[0].device_kind
    peaks = TPU_PEAKS.get(kind)
    out = {
        "step_flops": flops,
        "step_hbm_bytes": bytes_accessed,
        "tflops_per_sec": round(flops / dt / 1e12, 2),
        "hbm_gbps": round(bytes_accessed / dt / 1e9, 1),
        "arithmetic_intensity": round(flops / max(bytes_accessed, 1.0), 2),
    }
    if peaks:
        mfu = flops / dt / 1e12 / peaks["bf16_tflops"]
        hbm_util = bytes_accessed / dt / 1e9 / peaks["hbm_gbps"]
        out["mfu"] = round(mfu, 4)
        out["hbm_util"] = round(hbm_util, 4)
        out["binding_resource"] = (
            "hbm" if hbm_util > mfu else "flops"
        ) if max(hbm_util, mfu) > 0.35 else "latency (scan-bound)"
    return out


# Repeatable benchmark configurations (PARITY.md perf table rows).
# 'default' is the flagship the driver records; the others are the
# BASELINE.json configs #3 (RGB mazes-shaped) and #5 (long horizon).
# Config #4 (BAIR push) has the identical device shape as mazes_rgb
# (B=8, T=15, C=3, 64x64 — presets.py), so that row covers both; #1
# (CPU-runnable small) is covered by the test suite.
BENCH_CONFIGS = {
    "default": dict(batch=32, time_steps=20, context=10, channels=1),
    "mazes_rgb": dict(batch=8, time_steps=15, context=5, channels=3),
    "long_horizon": dict(batch=32, time_steps=30, context=5, channels=1),
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--config", default="default", choices=sorted(BENCH_CONFIGS),
                   help="named benchmark shape (overridable by the flags below)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--time-steps", type=int, default=None)
    p.add_argument("--context", type=int, default=None)
    p.add_argument("--channels", type=int, default=None)
    p.add_argument("--filter-size", type=int, default=8,
                   help="generator/discriminator base filter size "
                        "(reference default 8; larger values probe the "
                        "fat-channel regime where MXU lanes fill up)")
    p.add_argument("--no-cache", action="store_true")
    p.add_argument(
        "--solver", default="auto", choices=["auto", "scan", "pallas"],
        help="Sinkhorn solver for the training step ('auto': fused "
             "Pallas kernel on TPU, XLA scan elsewhere)",
    )
    p.add_argument(
        "--dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="MXU compute precision for model convs/matmuls "
             "(params + Sinkhorn stay f32; bf16 training-parity "
             "validated in PARITY.md)",
    )
    p.add_argument("--unroll", type=int, default=1,
                   help="lax.scan unroll factor for ConvLSTM/LSTM scans")
    p.add_argument("--remat-policy", default="carry_only",
                   help="scan-body checkpoint policy (save_recurrent "
                        "keeps recurrent conv outputs, recomputes only "
                        "gate math in backward); per-layer overrides "
                        "like 'carry_only,decoder5=save_recurrent'")
    p.add_argument("--conv-packing", default=None, choices=["auto", "off"],
                   help="space-to-depth MXU-lane packing of stride-1 "
                        "small-filter ConvLSTMs.  Default follows "
                        "TrainConfig ('auto' since r5)")
    p.add_argument("--time-major", dest="time_major", default=None,
                   action="store_true",
                   help="time-major generator layout ([T, B, ...] "
                        "through the encoder/decoder stacks — no B<->T "
                        "scan transposes; bit-exact forward).  Default "
                        "follows TrainConfig (ON) so the driver's bench "
                        "measures the shipped configuration")
    p.add_argument("--no-time-major", dest="time_major",
                   action="store_false",
                   help="batch-major generator layout")
    p.add_argument("--kernel-impl", default=None,
                   choices=["scan", "pallas", "auto"],
                   help="ConvLSTM/LSTM recurrence engine (fused Pallas "
                        "kernel vs lax.scan; models/pallas_convlstm.py). "
                        "Default: the TrainConfig default, so the "
                        "driver's bench always measures the shipped "
                        "configuration")
    args = p.parse_args()

    shape = BENCH_CONFIGS[args.config]
    for field in ("batch", "time_steps", "context", "channels"):
        if getattr(args, field) is None:
            setattr(args, field, shape[field])

    if not args.no_cache:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax

    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import bouncing_blobs
    from kccotgan_tpu.train import GanModules, build_train_step, create_train_state

    if args.kernel_impl is None:
        args.kernel_impl = TrainConfig.kernel_impl  # shipped default
    if args.time_major is None:
        args.time_major = TrainConfig.time_major  # shipped default
    if args.conv_packing is None:
        args.conv_packing = TrainConfig.conv_packing  # shipped default
    cfg = TrainConfig(
        dname="mmnist",
        batch_size=args.batch,
        total_time_steps=args.time_steps,
        int_time_steps=args.context,
        sinkhorn_l=100,
        sinkhorn_solver=args.solver,
        compute_dtype=args.dtype,
        scan_unroll=args.unroll,
        scan_remat_policy=args.remat_policy,
        conv_packing=args.conv_packing,
        kernel_impl=args.kernel_impl,
        time_major=args.time_major,
        model=ModelConfig(
            x_height=64, x_width=64, n_channels=args.channels,
            g_filter_size=args.filter_size, d_filter_size=args.filter_size,
        ),
    )
    print(
        f"# bench[{args.config}]: device={jax.devices()[0]} batch={args.batch} "
        f"T={args.time_steps} (ctx {args.context}) C={args.channels} "
        f"L={cfg.sinkhorn_l} kernel_impl={cfg.kernel_impl}",
        file=sys.stderr,
    )

    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = build_train_step(cfg, mods)
    batch = jnp.array(
        bouncing_blobs(args.batch, args.time_steps, 64, 64,
                       channels=args.channels, seed=0)
    )

    # NOTE: under the axon remote-TPU runtime, block_until_ready can
    # return before the program actually retires; only a data readback
    # (device_get / float()) is a true sync.  All timed regions below
    # end with a scalar readback that depends on the final step.
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    float(metrics["sinkhorn_loss"])
    compile_s = time.perf_counter() - t0
    print(f"# first step (compile+run): {compile_s:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch)
    loss_sync = float(metrics["sinkhorn_loss"])
    dt = (time.perf_counter() - t0) / args.steps

    frames_per_sec = args.batch * args.time_steps / dt
    sinkhorn_iters_per_sec = 6 * cfg.sinkhorn_l / dt
    loss = loss_sync
    print(
        f"# steady state: {dt*1e3:.1f} ms/step, "
        f"{frames_per_sec:.0f} frames/sec/chip, "
        f"{sinkhorn_iters_per_sec:.0f} sinkhorn iters/sec, loss={loss:.4f}",
        file=sys.stderr,
    )
    if not (loss == loss):  # NaN guard: a broken step must not "win" the bench
        print(json.dumps({"metric": "error", "value": 0, "unit": "nan-loss", "vs_baseline": 0}))
        return 1

    rl = roofline(step_fn, state, batch, dt)
    if rl:
        print(
            "# roofline: %.1f TFLOP/s (MFU %.1f%%), %.0f GB/s HBM (%.1f%%), "
            "AI %.1f flop/byte, binds on %s"
            % (
                rl.get("tflops_per_sec", 0.0), 100 * rl.get("mfu", 0.0),
                rl.get("hbm_gbps", 0.0), 100 * rl.get("hbm_util", 0.0),
                rl.get("arithmetic_intensity", 0.0),
                rl.get("binding_resource", "?"),
            ),
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "training frames/sec/chip (%s 64x64, B=%d, T=%d, C=%d, full step)"
                % ("MMNIST" if args.config == "default" else args.config,
                   args.batch, args.time_steps, args.channels),
                "value": round(frames_per_sec, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / REF_V100_FRAMES_PER_SEC, 2),
                **rl,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
