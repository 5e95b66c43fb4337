"""Fused Pallas LSTM recurrence vs the lax.scan oracle.

Runs in interpret mode on CPU (same dispatch as the Pallas ConvLSTM
tests): forward and the reverse-time adjoint must match the LSTM scan
path to f32 roundoff, for both output activations the discriminator
stack uses (tanh for lstm1/2, sigmoid for lstm3 —
`/root/reference/gan.py:411-418`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kccotgan_tpu.models.layers import LSTM
from kccotgan_tpu.models.pallas_lstm import lstm_scan_pallas


def _mk(impl, **kw):
    base = dict(units=4, compute_dtype="float32", kernel_impl=impl)
    base.update(kw)
    return LSTM(**base)


@pytest.fixture(scope="module")
def data(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 6)) * 0.5, jnp.float32)
    params = _mk("scan").init(jax.random.PRNGKey(0), x)
    return x, params


def test_forward_matches_scan(data):
    x, params = data
    y_scan = _mk("scan").apply(params, x)
    y_pal = _mk("pallas").apply(params, x)
    np.testing.assert_allclose(y_pal, y_scan, rtol=1e-6, atol=1e-6)


def test_sigmoid_activation_matches_scan(data, rng):
    """lstm3's sigmoid OUTPUT activation routes through the kernel's
    static activation dispatch (the adjoint derivative differs)."""
    x, _ = data
    layer_s = _mk("scan", activation="sigmoid")
    layer_p = _mk("pallas", activation="sigmoid")
    params = layer_s.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        layer_p.apply(params, x), layer_s.apply(params, x),
        rtol=1e-6, atol=1e-6,
    )

    def loss(p, impl):
        layer = _mk(impl, activation="sigmoid")
        y = layer.apply(p, x)
        return jnp.sum(y * jnp.sin(jnp.arange(y.size).reshape(y.shape)))

    g_s = jax.grad(loss)(params, "scan")
    g_p = jax.grad(loss)(params, "pallas")
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_gradients_match_scan(data):
    """Param + input grads through the custom-VJP reverse-time kernel
    == autodiff through the scan, for a loss touching every output."""
    x, params = data

    def loss(impl):
        def f(p, xx):
            y = _mk(impl).apply(p, xx)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return f

    g_s = jax.grad(loss("scan"), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss("pallas"), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_seq_axis_falls_back(data):
    """seq_axis configs silently use the scan engine (no axis bound
    here, so success means the pallas path was NOT taken — the pallas
    kernel has no seq_axis support at all)."""
    x, params = data
    y = _mk("scan").apply(params, x)
    got = LSTM(
        units=4, compute_dtype="float32", kernel_impl="pallas",
        activation="linear",  # unsupported by the kernel -> scan path
    ).apply(params, x)
    assert got.shape == y.shape


def test_raw_kernel_bf16_semantics(rng):
    """bf16 stack in, f32 gate math, bf16 y out — mirrors the scan's
    precision contract (rproj rounded once to bf16)."""
    b, t, u = 2, 4, 4
    x = jnp.asarray(rng.normal(size=(b, t, 4 * u)), jnp.bfloat16)
    h0 = jnp.zeros((b, u), jnp.float32)
    c0 = jnp.zeros((b, u), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(u, 4 * u)) * 0.2, jnp.float32)
    bias = jnp.zeros((4 * u,), jnp.float32)
    y, (hn, cn) = lstm_scan_pallas(x, h0, c0, rk, bias)
    assert y.dtype == jnp.bfloat16
    assert hn.dtype == cn.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_multi_batch_tile_grads_match(rng, monkeypatch):
    """nb > 1 batch tiles (the flagship regime): dW/db accumulate in
    VMEM scratch ACROSS tiles — zeroed only at grid step (0, 0),
    written only at the last.  Force two tiles at a tiny shape."""
    import kccotgan_tpu.models.pallas_lstm as mod

    monkeypatch.setattr(mod, "_batch_tile", lambda b, u, item: b // 2)
    x = jnp.asarray(rng.normal(size=(4, 5, 6)) * 0.5, jnp.float32)
    params = _mk("scan").init(jax.random.PRNGKey(4), x)

    def loss(impl):
        def f(p, xx):
            y = _mk(impl).apply(p, xx)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return f

    np.testing.assert_allclose(
        _mk("pallas").apply(params, x), _mk("scan").apply(params, x),
        rtol=1e-6, atol=1e-6,
    )
    g_s = jax.grad(loss("scan"), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss("pallas"), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_discriminator_parity_scan_vs_pallas(rng):
    """The full VideoDiscriminator (CNN + 3-layer LSTM stack incl. the
    sigmoid lstm3) produces identical outputs and grads between
    engines."""
    from kccotgan_tpu.models.video import VideoDiscriminator

    video = jnp.asarray(
        rng.uniform(size=(2, 16, 4, 16, 1)), jnp.float32
    )  # [B, H, T, W, C]
    disc_s = VideoDiscriminator(state_size=3, filter_size=2,
                                kernel_impl="scan")
    disc_p = VideoDiscriminator(state_size=3, filter_size=2,
                                kernel_impl="pallas")
    params = disc_s.init(jax.random.PRNGKey(2), video)
    y_s = disc_s.apply(params, video)
    y_p = disc_p.apply(params, video)
    np.testing.assert_allclose(y_p, y_s, rtol=1e-6, atol=1e-6)

    def loss(p, disc):
        return jnp.sum(disc.apply(p, video) ** 2)

    g_s = jax.grad(loss)(params, disc_s)
    g_p = jax.grad(loss)(params, disc_p)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_narrow_gate_width_falls_back_on_tpu(data, monkeypatch):
    """On a TPU backend the dense kernel is skipped when 4*units < 128
    (Mosaic "unsupported shape cast" at u=8 on v5e); interpret mode
    keeps exercising the kernel at any width.  Simulate the TPU
    dispatch and assert the kernel is NOT invoked."""
    import kccotgan_tpu.models.layers as layers_mod

    x, params = data

    def _boom(*a, **k):  # the kernel must not be reached
        raise AssertionError("lstm_scan_pallas called for 4u < 128 on tpu")

    monkeypatch.setattr(
        layers_mod.jax, "default_backend", lambda: "tpu"
    )
    import kccotgan_tpu.models.pallas_lstm as pl_mod

    monkeypatch.setattr(pl_mod, "lstm_scan_pallas", _boom)
    y = _mk("pallas").apply(params, x)  # units=4 -> scan fallback
    y_scan = _mk("scan").apply(params, x)
    np.testing.assert_allclose(y, y_scan, rtol=1e-6, atol=1e-6)
