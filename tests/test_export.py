"""Serving-export round trip: jax.export artifact == live rollout.

The reference has no serving path at all (sampling only exists inline
in its training loop, `kernel_train.py:339-356`); these tests pin the
contract of ours: one self-contained artifact, weights baked in, batch
dim symbolic, deterministic in (context, seed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.config import ModelConfig, TrainConfig
from kccotgan_tpu.export import load_rollout, save_rollout
from kccotgan_tpu.train import GanModules, build_rollout, create_train_state

CFG = TrainConfig(
    dname="synthetic",
    batch_size=2,
    compute_dtype="float32",
    total_time_steps=5,
    int_time_steps=3,
    sinkhorn_l=5,
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
def artifact(tmp_path_factory):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("export") / "model.kccot")
    header = save_rollout(path, CFG, state)
    return path, header, state


def _context(batch, seed=0):
    return np.random.RandomState(seed).rand(batch, 16, 3, 16, 1).astype("float32")


def test_header_contract(artifact):
    _, header, _ = artifact
    assert header["platforms"] == ["cpu", "tpu"]
    assert header["context_shape"] == ["b", "16", "3", "16", "1"]
    assert header["context_time_steps"] == 3
    assert header["output_time_steps"] == 5


def test_roundtrip_bit_exact_vs_live_rollout(artifact):
    path, _, state = artifact
    serve = load_rollout(path)
    ctx = _context(2)
    got = serve(ctx, seed=7)
    want = build_rollout(CFG, GanModules(CFG))(
        state, jnp.asarray(ctx), jax.random.PRNGKey(7)
    )
    assert got.shape == (2, 16, 5, 16, 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batch_polymorphic(artifact):
    path, _, _ = artifact
    serve = load_rollout(path)
    out = serve(_context(3, seed=1), seed=1)
    assert out.shape == (3, 16, 5, 16, 1)


def test_seed_determinism(artifact):
    path, _, _ = artifact
    serve = load_rollout(path)
    ctx = _context(2, seed=2)
    a = np.asarray(serve(ctx, seed=3))
    b = np.asarray(serve(ctx, seed=3))
    c = np.asarray(serve(ctx, seed=4))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # a different seed samples different z
    # the context frames pass through unchanged either way
    np.testing.assert_array_equal(a[:, :, :3], ctx.transpose(0, 1, 2, 3, 4))
    np.testing.assert_array_equal(c[:, :, :3], ctx)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.kccot"
    p.write_bytes(b"NOTANEXPORT")
    with pytest.raises(ValueError, match="bad magic"):
        load_rollout(str(p))
