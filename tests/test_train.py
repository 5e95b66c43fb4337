"""End-to-end training-engine tests (tiny shapes, CPU).

Covers SURVEY.md section 4 'Integration': a few train steps with finite
loss, checkpoint save/restore round-trip (fixing the reference's broken
resume), rollout shapes, and schedule parity vs the reference's
WarmUp + ExponentialDecay composition.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.config import ModelConfig, TrainConfig
from kccotgan_tpu.data import ArrayDataset, bouncing_blobs
from kccotgan_tpu.train import (
    GanModules,
    Trainer,
    build_rollout,
    build_train_step,
    create_train_state,
    warmup_staircase_exponential_decay,
)

TINY = TrainConfig(
    dname="synthetic",
    batch_size=2,
    # f32 pinned: incremental-vs-full-re-encode rollout equality is an
    # f32 bit-level property (bf16 conv rounding differs across batch
    # shapes).  The dtype-parametrized test below covers bfloat16.
    compute_dtype="float32",
    total_time_steps=5,
    int_time_steps=3,
    sinkhorn_l=10,
    warmup_steps=10,
    decay_steps=5,
    ckpt_freq=10_000,
    save_freq=10_000,
    model=ModelConfig(
        x_height=16,
        x_width=16,
        n_channels=1,
        g_filter_size=2,
        d_filter_size=2,
        g_state_size=3,
        d_state_size=3,
        z_channels=4,
        z_height=1,
        z_width=1,
        use_norm=True,
    ),
)


@pytest.fixture(scope="module")
def tiny_batch():
    vids = bouncing_blobs(4, TINY.total_time_steps, 16, 16, seed=3)
    return vids[: TINY.batch_size]


@pytest.fixture(scope="module")
def state_and_mods():
    mods = GanModules(TINY)
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    return state, mods


def test_schedule_semantics():
    sched = warmup_staircase_exponential_decay(1e-3, 100, 50, 0.9)
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-6)  # decay t=0
    np.testing.assert_allclose(float(sched(149)), 1e-3, rtol=1e-6)  # staircase
    np.testing.assert_allclose(float(sched(150)), 9e-4, rtol=1e-6)
    d = warmup_staircase_exponential_decay(1e-3, 100, 50, 0.9, double_step=True, offset=1)
    np.testing.assert_allclose(float(d(10)), 1e-3 * 21 / 100, rtol=1e-6)


@pytest.mark.reference_oracle
def test_schedule_parity_vs_reference():
    import tensorflow as tf

    from tests._reference_oracle import load_reference_module

    du = load_reference_module("data_utils")
    lr0, warmup, dsteps, rate = 5e-4, 100, 50, 0.975
    ref_decay = tf.keras.optimizers.schedules.ExponentialDecay(
        initial_learning_rate=lr0, decay_steps=dsteps, decay_rate=rate, staircase=True
    )
    ref = du.WarmUp(initial_learning_rate=lr0, decay_schedule_fn=ref_decay, warmup_steps=warmup)
    ours = warmup_staircase_exponential_decay(lr0, warmup, dsteps, rate)
    for step in [0, 1, 50, 99, 100, 101, 149, 150, 349, 1000]:
        np.testing.assert_allclose(
            float(ours(step)), float(ref(step)), rtol=1e-6,
            err_msg=f"step {step}",
        )


def test_train_step_finite_and_updates(state_and_mods, tiny_batch):
    state, mods = state_and_mods
    step_fn = build_train_step(TINY, mods, jit=True, donate=False)
    # Two steps: at optimizer count 0 the warmup LR is exactly 0 for the
    # offset-0 modules (enc, h) — true for the reference's Keras WarmUp
    # too — so single-step updates only move dec and m.
    mid_state, metrics = step_fn(state, jnp.array(tiny_batch))
    new_state, metrics = step_fn(mid_state, jnp.array(tiny_batch))
    assert np.isfinite(float(metrics["sinkhorn_loss"]))
    assert np.isfinite(float(metrics["pm"]))
    assert int(new_state.step) == int(state.step) + 2
    # all four param trees moved
    for name in ("enc_params", "dec_params", "h_params", "m_params"):
        before = jax.tree_util.tree_leaves(getattr(state, name))
        after = jax.tree_util.tree_leaves(getattr(new_state, name))
        assert any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(before, after)
        ), f"{name} did not update"


def test_train_step_pallas_solver(tiny_batch):
    """Full GAN step with the fused Pallas Sinkhorn solver (interpret
    mode on CPU) — guards the static-epsilon plumbing through the jitted
    step (custom_vjp nondiff args must see Python floats)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, sinkhorn_solver="pallas")
    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(2))
    step_fn = build_train_step(cfg, mods, jit=True, donate=False)
    _, metrics = step_fn(state, jnp.array(tiny_batch))
    assert np.isfinite(float(metrics["sinkhorn_loss"]))


def test_train_step_bfloat16_compute(tiny_batch):
    """Mixed precision: bf16 MXU inputs, f32 accumulation/params.  The
    step must stay finite and track the f32 loss to bf16 tolerance."""
    import dataclasses

    losses = {}
    for dt in ("float32", "bfloat16"):
        cfg = dataclasses.replace(TINY, compute_dtype=dt)
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(3))
        step_fn = build_train_step(cfg, mods, jit=True, donate=False)
        _, metrics = step_fn(state, jnp.array(tiny_batch))
        losses[dt] = float(metrics["sinkhorn_loss"])
        assert np.isfinite(losses[dt]), dt
    # bf16 has ~3 decimal digits; the divergence is a difference of
    # large Sinkhorn terms, so allow a loose relative tolerance.
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"], rtol=0.2)


def test_train_step_with_dropout(tiny_batch):
    """The --dropout/--rnn_dropout training path (reference `gan.py:
    40-41,57-62` via `kernel_train.py:393-395`).  Round-2 VERDICT bug:
    no PRNG was threaded, so any dropout>0 config crashed at state
    creation with InvalidRngError.  Pins: state creation + N finite
    train steps, determinism under a fixed rng, and that the masks
    actually engage (different dropout rng => different loss)."""
    import dataclasses

    from kccotgan_tpu.train.steps import gan_forward

    cfg = dataclasses.replace(
        TINY,
        model=dataclasses.replace(TINY.model, dropout=0.3, rnn_dropout=0.3),
    )
    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(11))
    step_fn = build_train_step(cfg, mods, jit=True, donate=False)
    batch = jnp.array(tiny_batch)

    s1, m1 = step_fn(state, batch)
    s2, m2 = step_fn(s1, batch)
    assert np.isfinite(float(m1["sinkhorn_loss"]))
    assert np.isfinite(float(m2["sinkhorn_loss"]))
    assert np.isfinite(float(m2["pm"]))
    assert int(s2.step) == 2

    # determinism: same state + batch -> bit-identical metrics
    _, m1b = step_fn(state, batch)
    assert float(m1["sinkhorn_loss"]) == float(m1b["sinkhorn_loss"])

    # masks engage: same params/z, different dropout rng -> different loss
    z = jax.random.normal(
        jax.random.PRNGKey(9), mods.z_shape(cfg.batch_size, cfg.pred_time_steps)
    )
    losses = []
    for dk in (jax.random.PRNGKey(0), jax.random.PRNGKey(1)):
        loss, _, _, _ = gan_forward(
            mods, cfg, state.enc_params, state.dec_params,
            state.h_params, state.m_params, state.h_stats, state.m_stats,
            batch, z, jnp.float32(cfg.init_sigma), dropout_rng=dk,
        )
        losses.append(float(loss))
    assert losses[0] != losses[1]

    # inference rollout ignores dropout (training=False) and must run
    rollout = build_rollout(cfg, mods)
    ctx = batch[:, :, : cfg.int_time_steps]
    video = rollout(state, ctx, jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(video)).all()


def test_cli_trains_with_dropout(tmp_path):
    """`--dropout 0.1 --rnn_dropout 0.1` trains finite steps via the CLI
    (MIGRATION.md's `-dp` claim, broken in round 2)."""
    from kccotgan_tpu.cli.main import main as cli_main

    rc = cli_main([
        "--dname", "synthetic", "--max_steps", "2",
        "--dropout", "0.1", "--rnn_dropout", "0.1",
        "--batch_size", "2", "--total_time_steps", "5",
        "--int_time_steps", "3", "--sinkhorn_l", "10",
        "--height", "16", "--width", "16",
        "--g_state_size", "3", "--g_filter_size", "2",
        "--d_state_size", "3", "--d_filter_size", "2",
        "--z_channels", "4", "--compute_dtype", "float32",
        "--out_dir", str(tmp_path), "--run_name", "dp",
        "--compile_cache", "",
    ])
    assert rc == 0


def test_cli_flags_override_preset():
    """Explicitly-typed CLI flags lay on top of --preset instead of
    being silently dropped (round-2 VERDICT weak #6); untyped flags
    keep the preset's values, not the parser defaults."""
    from kccotgan_tpu.cli.main import (
        build_parser, config_from_args, provided_dests,
    )
    from kccotgan_tpu.config import get_preset

    base = get_preset("mmnist_full")
    parser = build_parser()
    argv = ["--preset", "mmnist_full", "--sinkhorn_l", "50",
            "--dropout=0.1", "-bs", "4"]
    cfg = config_from_args(parser.parse_args(argv), provided_dests(parser, argv))
    assert cfg.sinkhorn_l == 50
    assert cfg.model.dropout == 0.1  # --flag=value form
    assert cfg.batch_size == 4  # short-option form
    # untyped flags: preset wins over parser defaults
    assert cfg.total_time_steps == base.total_time_steps
    assert cfg.model.g_filter_size == base.model.g_filter_size
    assert cfg.lr == base.lr

    # no overrides -> exactly the preset (modulo run-identity fields)
    argv2 = ["--preset", "mmnist_full"]
    cfg2 = config_from_args(parser.parse_args(argv2), provided_dests(parser, argv2))
    import dataclasses
    assert dataclasses.replace(
        cfg2, data_path=base.data_path, out_dir=base.out_dir,
        run_name=base.run_name, seed=base.seed,
    ) == base


def test_cli_abbreviated_flags_override_preset():
    """argparse prefix abbreviations (e.g. ``--warmu 500``) must count
    as explicitly typed: round-4 VERDICT weak #6 — the old argv
    string-matching missed them and silently reverted to the preset."""
    from kccotgan_tpu.cli.main import (
        build_parser, config_from_args, provided_dests,
    )
    from kccotgan_tpu.config import get_preset

    base = get_preset("mmnist_full")
    parser = build_parser()
    argv = ["--preset", "mmnist_full", "--warmu", "500"]
    provided = provided_dests(parser, argv)
    assert "warmup" in provided
    cfg = config_from_args(parser.parse_args(argv), provided)
    assert cfg.warmup_steps == 500
    # untyped flags still follow the preset
    assert cfg.lr == base.lr


def test_cli_remat_policy_validated_eagerly():
    """A misspelled --remat_policy fails as a clean argparse error at
    parse time, not a ValueError at trace time (round-4 ADVICE)."""
    import pytest

    from kccotgan_tpu.cli.main import build_parser

    parser = build_parser()
    for bad in ("carryonly", "decodr5=save_recurrent",
                "decoder5=saverecurrent", "carry_only,save_recurrent"):
        with pytest.raises(SystemExit):
            parser.parse_args(["--remat_policy", bad])
    # the valid forms still parse
    args = parser.parse_args(
        ["--remat_policy", "carry_only,decoder5=save_recurrent"]
    )
    assert args.remat_policy == "carry_only,decoder5=save_recurrent"


def test_train_step_smoothing_modes(tiny_batch):
    for kern in ("1d", "3d"):
        cfg = TrainConfig(
            **{
                **{f.name: getattr(TINY, f.name) for f in TINY.__dataclass_fields__.values()},
                "kernel": kern,
                "init_sigma": 2.0,
            }
        )
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(1))
        step_fn = build_train_step(cfg, mods, jit=True, donate=False)
        _, metrics = step_fn(state, jnp.array(tiny_batch))
        assert np.isfinite(float(metrics["sinkhorn_loss"])), kern


def test_rollout_shapes(state_and_mods, tiny_batch):
    state, mods = state_and_mods
    rollout = build_rollout(TINY, mods)
    ctx = jnp.array(tiny_batch[:, :, : TINY.int_time_steps])
    video = rollout(state, ctx, jax.random.PRNGKey(5))
    assert video.shape == (
        TINY.batch_size, 16, TINY.total_time_steps, 16, 1
    )
    v = np.asarray(video)
    assert np.isfinite(v).all()
    np.testing.assert_allclose(
        v[:, :, : TINY.int_time_steps], np.asarray(ctx), rtol=1e-6
    )


def test_rollout_incremental_matches_full_reencode(state_and_mods, tiny_batch):
    """The O(T) carry-based rollout must produce the SAME frames as the
    reference's O(T^2) re-encode-everything procedure (same weights,
    same z draws)."""
    state, mods = state_and_mods
    cfg = TINY
    ctx = jnp.array(tiny_batch[:, :, : cfg.int_time_steps])
    rng = jax.random.PRNGKey(7)

    fast = build_rollout(cfg, mods, jit=False)(state, ctx, rng)

    # Reference procedure: re-encode the growing sequence every step.
    keys = jax.random.split(rng, cfg.pred_time_steps)
    seq = ctx
    m = cfg.model
    for i in range(cfg.pred_time_steps):
        pyr = mods.encoder.apply({"params": state.enc_params}, seq, training=False)
        z = jax.random.normal(
            keys[i], (cfg.batch_size, 1, m.z_height, m.z_width, m.z_channels)
        )
        frame = mods.decoder.apply({"params": state.dec_params}, pyr, z, training=False)
        seq = jnp.concatenate([seq, frame], axis=2)

    np.testing.assert_allclose(np.asarray(fast), np.asarray(seq), rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, state_and_mods, tiny_batch):
    from kccotgan_tpu.ckpt import restore_checkpoint, save_checkpoint

    state, mods = state_and_mods
    step_fn = build_train_step(TINY, mods, jit=True, donate=False)
    trained, _ = step_fn(state, jnp.array(tiny_batch))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, trained, 1)

    template = create_train_state(TINY, jax.random.PRNGKey(99))
    restored = restore_checkpoint(ckpt_dir, template)
    assert int(restored.step) == int(trained.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(trained), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_fit_synthetic(tmp_path):
    cfg = TrainConfig(
        **{
            **{f.name: getattr(TINY, f.name) for f in TINY.__dataclass_fields__.values()},
            "out_dir": str(tmp_path),
            "run_name": "e2e",
            "n_epochs": 1,
        }
    )
    data = bouncing_blobs(6, cfg.total_time_steps, 16, 16, seed=0)
    ds = ArrayDataset(data, cfg.batch_size, seed=0)
    trainer = Trainer(cfg)
    state, summary = trainer.fit(
        ds.repeat(2), max_steps=3, test_batch=data[: cfg.batch_size]
    )
    assert summary["status"] == "completed"
    assert summary["steps"] == 3
    assert os.path.exists(os.path.join(trainer.run_dir, "train_notes.txt"))
    metrics_path = os.path.join(trainer.run_dir, "log", "metrics.jsonl")
    assert os.path.exists(metrics_path)
    # the sampling cadence also logs quantitative rollout quality
    with open(metrics_path) as f:
        tags = {json.loads(line).get("tag") for line in f}
    assert {"eval/psnr", "eval/ssim"} <= tags


def test_time_major_train_step_matches_batch_major(tiny_batch):
    """cfg.time_major runs the whole generator stack on [T, B, ...]
    tensors (no B<->T scan transposes).  The FORWARD is bit-exact (the
    conv folds are row permutations of identical per-frame convs):
    loss and pM must be bit-equal.  The BACKWARD differs only by
    reduction order (dL/dW sums the t*b rows in a different order):
    measured <= 1.6e-07 relative / 7.3e-12 absolute on the updated
    params — asserted with margin."""
    import dataclasses

    results = {}
    for tm in (False, True):
        cfg = dataclasses.replace(TINY, time_major=tm)
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = build_train_step(cfg, mods, jit=True, donate=False)
        new_state, metrics = step(state, jnp.asarray(tiny_batch))
        results[tm] = (new_state, metrics)

    bm_state, bm_metrics = results[False]
    tm_state, tm_metrics = results[True]
    assert float(bm_metrics["sinkhorn_loss"]) == float(tm_metrics["sinkhorn_loss"])
    assert float(bm_metrics["pm"]) == float(tm_metrics["pm"])
    for name in ("enc_params", "dec_params", "h_params", "m_params"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(bm_state, name)),
            jax.tree_util.tree_leaves(getattr(tm_state, name)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-10,
                err_msg=name,
            )


def test_time_major_with_dropout_is_bit_exact(tiny_batch):
    """Dropout composes with time_major: the input-dropout fold is
    already time-major internally, so masks align identically."""
    import dataclasses

    results = {}
    for tm in (False, True):
        cfg = dataclasses.replace(
            TINY,
            time_major=tm,
            model=dataclasses.replace(TINY.model, dropout=0.3, rnn_dropout=0.3),
        )
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = build_train_step(cfg, mods, jit=True, donate=False)
        _, metrics = step(state, jnp.asarray(tiny_batch))
        results[tm] = float(metrics["sinkhorn_loss"])
    assert results[False] == results[True]


def _poison(batch):
    bad = np.array(batch)
    bad[0, 0, 0, 0, 0] = np.nan
    return bad


def test_nan_sentinel_stops_without_recovery(tmp_path):
    """retries=0 keeps the reference's sentinel semantics: write the
    train_notes line and stop (`kernel_train.py:323-329`)."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, out_dir=str(tmp_path), run_name="nanstop",
        save_freq=10_000, ckpt_freq=10_000,
    )
    data = bouncing_blobs(4, cfg.total_time_steps, 16, 16, seed=5)
    good = data[: cfg.batch_size]
    batches = iter([good, _poison(good), good, good])
    trainer = Trainer(cfg)
    _, summary = trainer.fit(batches, max_steps=4)
    assert summary["status"] == "failed"
    assert summary["recoveries"] == 0
    notes = open(os.path.join(trainer.run_dir, "train_notes.txt")).read()
    assert "Training failed!" in notes


def test_nan_recovery_restores_and_continues(tmp_path):
    """Automated checkpoint-based restart (SURVEY §5.3): a poisoned
    batch NaNs the state mid-run; the trainer restores the last
    VERIFIED checkpoint (one whose own metrics passed the finite check
    — round-4 VERDICT weak #5's poisoned-latest ordering), re-seeds,
    skips the offending batch, and completes with finite params."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, out_dir=str(tmp_path), run_name="nanrec",
        ckpt_freq=1, nan_recovery_retries=2, save_freq=10_000,
    )
    data = bouncing_blobs(4, cfg.total_time_steps, 16, 16, seed=5)
    good = data[: cfg.batch_size]
    # g, g, POISON, then enough good batches to reach max_steps again
    batches = iter([good, good, _poison(good), good, good, good])
    trainer = Trainer(cfg)
    state, summary = trainer.fit(batches, max_steps=4)
    assert summary["status"] == "completed"
    assert summary["steps"] == 4
    assert summary["recoveries"] == 1
    for leaf in jax.tree_util.tree_leaves(
        (state.enc_params, state.dec_params, state.h_params, state.m_params)
    ):
        assert np.isfinite(np.asarray(leaf)).all()
    notes = open(os.path.join(trainer.run_dir, "train_notes.txt")).read()
    assert "re-seeded (retry 1/2)" in notes
    assert "Training failed!" not in notes


def test_scan_remat_is_exact(tiny_batch):
    """jax.checkpoint on the scan bodies must not change values or
    gradients — only residual memory traffic."""
    import dataclasses

    results = {}
    for remat in (False, True):
        cfg = dataclasses.replace(TINY, scan_remat=remat)
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(4))
        step_fn = build_train_step(cfg, mods, jit=True, donate=False)
        new_state, metrics = step_fn(state, jnp.array(tiny_batch))
        results[remat] = (
            float(metrics["sinkhorn_loss"]),
            np.asarray(jax.tree_util.tree_leaves(new_state.dec_params)[0]),
        )
    np.testing.assert_allclose(results[True][0], results[False][0], rtol=1e-6)
    np.testing.assert_allclose(results[True][1], results[False][1], rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("kernel", ["none", "1d"])
def test_share_context_encoding_exact(tiny_batch, kernel):
    """Encoding the context ONCE per step (value reused by the disc
    phase, cotangent chained through jax.vjp in the gen phase) must
    match the two-forward trace: same metrics, same updated params
    for all four modules.  Mathematically identical — only the number
    of encoder forward executions changes.  The '1d' case additionally
    covers the shared smoothed-real video (param- and z-free, computed
    once per step under share)."""
    import dataclasses

    results = {}
    for share in (False, True):
        cfg = dataclasses.replace(
            TINY, share_context_encoding=share, kernel=kernel
        )
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(11))
        step_fn = build_train_step(cfg, mods, jit=True, donate=False)
        new_state, metrics = step_fn(state, jnp.array(tiny_batch))
        results[share] = (
            float(metrics["sinkhorn_loss"]),
            float(metrics["pm"]),
            new_state,
        )
    loss0, pm0, st0 = results[False]
    loss1, pm1, st1 = results[True]
    np.testing.assert_allclose(loss1, loss0, rtol=1e-6)
    np.testing.assert_allclose(pm1, pm0, rtol=1e-6)
    for name in ("enc_params", "dec_params", "h_params", "m_params"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(st1, name)),
            jax.tree_util.tree_leaves(getattr(st0, name)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=name,
            )


def test_fused_discriminators_exact(tiny_batch):
    """The vmapped 4-way discriminator pass must match the sequential
    reference-order calls: identical losses, discriminator outputs (via
    the loss), BN running-stat chains, and raw gradients.  (Comparing
    post-Adam params is too brittle: a first Adam step is ~lr*sign(g),
    so 1e-7 gradient noise flips signs.  atol covers BN-cancelled
    conv-bias grads, which are analytically zero.)"""
    import dataclasses

    from kccotgan_tpu.train.steps import gan_forward

    batch = jnp.array(tiny_batch)
    outs = {}
    for fused in (False, True):
        cfg = dataclasses.replace(TINY, fused_discriminators=fused)
        mods = GanModules(cfg)
        state = create_train_state(cfg, jax.random.PRNGKey(6))
        z = jax.random.normal(
            jax.random.PRNGKey(9), mods.z_shape(cfg.batch_size, cfg.pred_time_steps)
        )

        def fwd(m_params):
            loss, pm, h_stats, m_stats = gan_forward(
                mods, cfg, state.enc_params, state.dec_params,
                state.h_params, m_params, state.h_stats, state.m_stats,
                batch, z, jnp.float32(cfg.init_sigma),
            )
            return loss + pm, (pm, h_stats, m_stats)

        (val, (pm, h_stats, m_stats)), grad = jax.value_and_grad(
            fwd, has_aux=True
        )(state.m_params)
        outs[fused] = (float(val), float(pm), h_stats, m_stats, grad)

    v0, pm0, hs0, ms0, g0 = outs[False]
    v1, pm1, hs1, ms1, g1 = outs[True]
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    np.testing.assert_allclose(pm1, pm0, rtol=1e-5)
    for name, (a_tree, b_tree) in {
        "h_stats": (hs1, hs0), "m_stats": (ms1, ms0), "m_grad": (g1, g0)
    }.items():
        for a, b in zip(
            jax.tree_util.tree_leaves(a_tree), jax.tree_util.tree_leaves(b_tree)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=name,
            )


def test_sample_cli_roundtrip(tmp_path, capsys):
    """Train 2 steps on synthetic data via the training CLI machinery,
    then drive the sampling CLI against the written checkpoint."""
    import dataclasses

    from kccotgan_tpu.cli.sample import main as sample_main
    from kccotgan_tpu.config import presets
    from kccotgan_tpu.data import make_dataset

    cfg = dataclasses.replace(
        TINY, dname="synthetic", ckpt_freq=2, out_dir=str(tmp_path),
        run_name="r",
    )
    batches, test_batch = make_dataset(cfg)
    tr = Trainer(cfg)
    tr.fit(batches, max_steps=2, test_batch=None)

    # register a throwaway preset matching the tiny config
    presets.PRESETS["_test_tiny"] = lambda: cfg
    try:
        rc = sample_main([
            "--preset", "_test_tiny",
            "--ckpt", str(tmp_path / "r" / "ckpt"),
            "--out", str(tmp_path / "samples"),
            "--num", "2",
            "--metrics_k", "2",
        ])
    finally:
        presets.PRESETS.pop("_test_tiny")
    assert rc == 0
    assert os.path.getsize(tmp_path / "samples" / "rollout.gif") > 0
    assert os.path.getsize(tmp_path / "samples" / "rollout_strips.png") > 0
    # --metrics_k emits one best-of-K PSNR/SSIM JSON line
    report = [
        json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    assert report and report[0]["best_of_k"] == 2
    assert np.isfinite(report[0]["psnr"]) and 0 < report[0]["ssim"] <= 1
