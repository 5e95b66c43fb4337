"""Multi-device data parallelism on the 8-device virtual CPU mesh.

Key test: GSPMD global-batch mode produces EXACTLY the same update as
the single-device step on the same global batch (the SURVEY section 4
'pmean-gradient parity' requirement, made stronger: bit-level per-step
agreement modulo fp reduction order).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.config import ModelConfig, TrainConfig
from kccotgan_tpu.data import bouncing_blobs
from kccotgan_tpu.parallel import (
    build_sharded_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)
from kccotgan_tpu.train import GanModules, build_train_step, create_train_state


def _cfg(**kw) -> TrainConfig:
    base = dict(
        dname="synthetic",
        batch_size=8,
        # f32 pinned: the sharded-vs-single-device equality these tests
        # assert is an f32 bit-level property; bf16 conv rounding differs
        # across batch tilings and 100 Sinkhorn iters amplify it.  bf16
        # statistical parity is validated separately (PARITY.md).
        compute_dtype="float32",
        total_time_steps=5,
        int_time_steps=3,
        sinkhorn_l=10,
        warmup_steps=10,
        donate_buffers=False,
        model=ModelConfig(
            x_height=16, x_width=16, n_channels=1,
            g_filter_size=2, d_filter_size=2,
            g_state_size=3, d_state_size=3,
            z_channels=4, z_height=1, z_width=1,
            use_norm=True,
        ),
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def batch():
    return jnp.array(bouncing_blobs(8, 5, 16, 16, seed=4))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_global_mode_matches_single_device(batch):
    cfg = _cfg(global_batch_sinkhorn=True)
    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    single = build_train_step(cfg, mods, jit=True, donate=False)
    s1, m1 = single(state, batch)
    s1, m1 = single(s1, batch)
    jax.block_until_ready(m1)

    mesh = make_mesh()
    sharded = build_sharded_train_step(cfg, mods, mesh)
    st = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    gb = shard_batch(batch, mesh)
    # One 8-thread collective program at a time: overlapping async
    # dispatches starve XLA:CPU's collective rendezvous (hard 40s
    # timeout -> process abort) on a single-core host.
    s2, m2 = sharded(st, gb)
    jax.block_until_ready(m2)
    s2, m2 = sharded(s2, gb)
    jax.block_until_ready(m2)

    np.testing.assert_allclose(
        float(m1["sinkhorn_loss"]), float(m2["sinkhorn_loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.enc_params),
        jax.tree_util.tree_leaves(s2.enc_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_local_shard_mode_runs(batch):
    cfg = _cfg(global_batch_sinkhorn=False)
    mods = GanModules(cfg)
    mesh = make_mesh()
    sharded = build_sharded_train_step(cfg, mods, mesh)
    st = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    s, m = sharded(st, shard_batch(batch, mesh))
    jax.block_until_ready(m)
    assert np.isfinite(float(m["sinkhorn_loss"]))
    assert np.isfinite(float(m["pm"]))
    assert int(jax.device_get(s.step)) == 1
    # state stays replicated across the mesh
    leaf = jax.tree_util.tree_leaves(s.enc_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_global_mode_pallas_falls_back_to_scan(batch, caplog):
    """GSPMD cannot partition an opaque Mosaic custom call across the
    batch axis, so the exact global-batch mode must swap the Pallas
    recurrence engine for the scan engine (bit-identical program) and
    say so.  The Pallas engine stays available in the shard_map mode."""
    import logging

    cfg = _cfg(global_batch_sinkhorn=True, kernel_impl="pallas")
    mods = GanModules(cfg)
    assert mods.kernel_impl == "pallas"
    mesh = make_mesh()
    with caplog.at_level(logging.WARNING, "kccotgan_tpu.parallel.sharding"):
        sharded = build_sharded_train_step(cfg, mods, mesh)
    assert any("scan engine" in r.message for r in caplog.records)

    st = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    s_p, m_p = sharded(st, shard_batch(batch, mesh))
    jax.block_until_ready(m_p)

    scan_cfg = _cfg(global_batch_sinkhorn=True, kernel_impl="scan")
    scan_step = build_sharded_train_step(scan_cfg, GanModules(scan_cfg), mesh)
    st2 = replicate_state(
        create_train_state(scan_cfg, jax.random.PRNGKey(0)), mesh
    )
    s_s, m_s = scan_step(st2, shard_batch(batch, mesh))
    jax.block_until_ready(m_s)
    np.testing.assert_array_equal(
        np.asarray(m_p["sinkhorn_loss"]), np.asarray(m_s["sinkhorn_loss"])
    )


def test_local_shard_mode_pallas_runs(batch):
    """The batch-parallel Pallas engine composes with shard_map DP:
    each device runs the fused recurrence on its local shard."""
    cfg = _cfg(global_batch_sinkhorn=False, kernel_impl="pallas")
    mods = GanModules(cfg)
    assert mods.kernel_impl == "pallas"
    mesh = make_mesh()
    sharded = build_sharded_train_step(cfg, mods, mesh)
    st = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    s, m = sharded(st, shard_batch(batch, mesh))
    jax.block_until_ready(m)
    assert np.isfinite(float(m["sinkhorn_loss"]))
    assert int(jax.device_get(s.step)) == 1


def test_global_sinkhorn_couples_shards(batch):
    """The exact mode must see the GLOBAL batch in the cost matrix:
    permuting which device holds which sample must not change the loss."""
    cfg = _cfg(global_batch_sinkhorn=True)
    mods = GanModules(cfg)
    mesh = make_mesh()
    sharded = build_sharded_train_step(cfg, mods, mesh)
    st = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    s_a, m_a = sharded(st, shard_batch(batch, mesh))
    jax.block_until_ready(m_a)
    # batch rolled across devices: different shard contents, same global set
    rolled = jnp.roll(batch, 3, axis=0)
    st_b = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    s_b, m_b = sharded(st_b, shard_batch(rolled, mesh))
    jax.block_until_ready(m_b)
    np.testing.assert_allclose(
        float(m_a["pm"]), float(m_b["pm"]), rtol=1e-4
    )


# ---------------------------------------------------------------------------
# End-to-end trainer + checkpoint restore on the virtual mesh (the full
# user path: Trainer(cfg, mesh), cli --num_devices 8, save -> restore ->
# replicate -> resume).
# ---------------------------------------------------------------------------


def test_trainer_fit_on_mesh(tmp_path):
    from kccotgan_tpu.parallel import batch_sharding
    from kccotgan_tpu.train import Trainer

    cfg = _cfg(out_dir=str(tmp_path), run_name="mesh_e2e", n_epochs=4)
    mesh = make_mesh(8)
    data = bouncing_blobs(cfg.batch_size, cfg.total_time_steps, 16, 16, seed=7)
    from kccotgan_tpu.data import ArrayDataset

    ds = ArrayDataset(np.asarray(data), cfg.batch_size, seed=0)
    trainer = Trainer(cfg, mesh=mesh)
    state, summary = trainer.fit(
        ds.repeat(4), max_steps=3, data_sharding=batch_sharding(mesh)
    )
    assert summary["status"] == "completed"
    assert summary["steps"] == 3
    assert int(jax.device_get(state.step)) == 3


def test_checkpoint_restore_under_mesh(tmp_path, batch):
    """Save a mesh-replicated state, restore into a fresh template,
    re-replicate, and resume training — exact array round-trip."""
    from kccotgan_tpu.ckpt import restore_checkpoint, save_checkpoint

    cfg = _cfg(global_batch_sinkhorn=True)
    mods = GanModules(cfg)
    mesh = make_mesh(8)
    step_fn = build_sharded_train_step(cfg, mods, mesh)
    state = replicate_state(create_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    state, _ = step_fn(state, shard_batch(batch, mesh))

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, jax.device_get(state), 1)

    template = create_train_state(cfg, jax.random.PRNGKey(99))
    restored = restore_checkpoint(ckpt_dir, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    resumed = replicate_state(restored, mesh)
    resumed, metrics = step_fn(resumed, shard_batch(batch, mesh))
    assert int(jax.device_get(resumed.step)) == 2
    assert np.isfinite(float(metrics["sinkhorn_loss"]))


def test_cli_num_devices_mesh(tmp_path):
    """cli/main.py --num_devices 8 drives the full mesh path."""
    from kccotgan_tpu.cli.main import main

    rc = main([
        "--dname", "synthetic",
        "--batch_size", "8",
        "--total_time_steps", "5",
        "--int_time_steps", "3",
        "--sinkhorn_l", "5",
        "--g_filter_size", "2", "--d_filter_size", "2",
        "--g_state_size", "3", "--d_state_size", "3",
        "--z_channels", "4",
        "--height", "16", "--width", "16",
        "--n_epochs", "2",
        "--max_steps", "2",
        "--save_freq", "100",
        "--num_devices", "8",
        "--out_dir", str(tmp_path),
        "--run_name", "cli_mesh",
        "--compile_cache", "",
        "--no_batch_norm",
    ])
    assert rc == 0
