"""Fused Pallas ConvLSTM recurrence vs the lax.scan oracle.

Runs in interpret mode on CPU (same dispatch as the Pallas Sinkhorn
tests): the kernel's math — forward, and the reverse-time adjoint for
all five inputs — must match the ConvLSTM2D scan path to f32 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kccotgan_tpu.models.layers import ConvLSTM2D
from kccotgan_tpu.models.pallas_convlstm import convlstm_scan_pallas


def _mk_layer(impl, **kw):
    base = dict(
        filters=4, kernel_size=(3, 3), strides=(1, 1), use_bias=True,
        compute_dtype="float32", kernel_impl=impl,
    )
    base.update(kw)
    return ConvLSTM2D(**base)


@pytest.fixture(scope="module")
def data(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 8, 8, 3)) * 0.5, jnp.float32)
    params = _mk_layer("scan").init(jax.random.PRNGKey(0), x)
    return x, params


def test_forward_matches_scan(data):
    x, params = data
    y_scan = _mk_layer("scan").apply(params, x)
    y_pal = _mk_layer("pallas").apply(params, x)
    np.testing.assert_allclose(y_pal, y_scan, rtol=1e-6, atol=1e-6)


def test_forward_strided_and_state(data, rng):
    """Stride-2 hoisted conv + carry-in/carry-out both route through
    the kernel identically to the scan."""
    x, _ = data
    layer_s = _mk_layer("scan", strides=(2, 2))
    layer_p = _mk_layer("pallas", strides=(2, 2))
    params = layer_s.init(jax.random.PRNGKey(1), x)
    h0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(2, 4, 4, 4)) * 0.3, jnp.float32)
    y_s, (hn_s, cn_s) = layer_s.apply(
        params, x, initial_state=(h0, c0), return_state=True
    )
    y_p, (hn_p, cn_p) = layer_p.apply(
        params, x, initial_state=(h0, c0), return_state=True
    )
    np.testing.assert_allclose(y_p, y_s, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(hn_p, hn_s, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cn_p, cn_s, rtol=1e-6, atol=1e-6)


def test_gradients_match_scan(data):
    """Param + input grads through the custom-VJP reverse-time kernel
    == autodiff through the scan, for a loss touching every output."""
    x, params = data

    def loss(impl):
        def f(p, xx):
            y = _mk_layer(impl).apply(p, xx)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return f

    g_s = jax.grad(loss("scan"), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss("pallas"), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_multi_batch_tile_grads_match(rng, monkeypatch):
    """nb > 1 batch tiles (the flagship regime — _batch_tile gives
    nb=4 at enc1's B=32 shape): dW/db accumulate in VMEM scratch
    ACROSS tiles.  Force two tiles at a tiny shape."""
    import kccotgan_tpu.models.pallas_convlstm as mod

    monkeypatch.setattr(
        mod, "_batch_tile", lambda b, ho, wo, f, item: b // 2
    )
    x = jnp.asarray(rng.normal(size=(4, 3, 8, 8, 3)) * 0.5, jnp.float32)
    params = _mk_layer("scan").init(jax.random.PRNGKey(5), x)

    def loss(impl):
        def f(p, xx):
            y = _mk_layer(impl).apply(p, xx)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
        return f

    np.testing.assert_allclose(
        _mk_layer("pallas").apply(params, x),
        _mk_layer("scan").apply(params, x),
        rtol=1e-6, atol=1e-6,
    )
    g_s = jax.grad(loss("scan"), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss("pallas"), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_even_kernel_same_padding(rng):
    """k=8 (decoder4/5's kernel): TF 'SAME' asymmetric padding must
    match lax.conv exactly."""
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8, 2)) * 0.5, jnp.float32)
    layer_s = _mk_layer("scan", filters=2, kernel_size=(8, 8))
    layer_p = _mk_layer("pallas", filters=2, kernel_size=(8, 8))
    params = layer_s.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(
        layer_p.apply(params, x), layer_s.apply(params, x),
        rtol=1e-6, atol=1e-6,
    )


def test_unsupported_paths_fall_back(data):
    """recurrent_dropout / seq_axis configs silently use the scan."""
    x, params = data
    layer = _mk_layer("pallas", recurrent_dropout=0.5)
    y = layer.apply(
        params, x, training=True,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert y.shape == (2, 5, 8, 8, 4)  # ran (on the scan path)


def test_full_train_step_parity_scan_vs_pallas():
    """One full GAN train step (both phases, grads through the
    custom-VJP reverse kernel, all four Adam updates) with
    kernel_impl='pallas' == the lax.scan step, on a tiny config."""
    from kccotgan_tpu.config import ModelConfig, TrainConfig
    from kccotgan_tpu.data import bouncing_blobs
    from kccotgan_tpu.train import (
        GanModules, build_train_step, create_train_state,
    )

    kw = dict(
        dname="synthetic", batch_size=2, compute_dtype="float32",
        total_time_steps=6, int_time_steps=3, sinkhorn_l=5,
        donate_buffers=False, sinkhorn_solver="scan",
        model=ModelConfig(
            x_height=16, x_width=16, n_channels=1,
            g_filter_size=2, d_filter_size=2,
            g_state_size=3, d_state_size=3,
            z_channels=4, z_height=1, z_width=1,
        ),
    )
    batch = jnp.array(bouncing_blobs(2, 6, 16, 16, seed=3))
    got = {}
    for impl in ("scan", "pallas"):
        cfg = TrainConfig(kernel_impl=impl, **kw)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = build_train_step(cfg, GanModules(cfg), jit=True, donate=False)
        state, metrics = step(state, batch)
        got[impl] = (metrics, state)
    np.testing.assert_allclose(
        float(got["pallas"][0]["sinkhorn_loss"]),
        float(got["scan"][0]["sinkhorn_loss"]), rtol=1e-5,
    )
    for name in ("enc_params", "dec_params", "h_params", "m_params"):
        for a, b in zip(
            jax.tree_util.tree_leaves(getattr(got["pallas"][1], name)),
            jax.tree_util.tree_leaves(getattr(got["scan"][1], name)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=name,
            )


def test_raw_kernel_bf16_semantics(rng):
    """bf16 stack in, f32 gate math, bf16 y out — the kernel mirrors
    the scan's precision contract (rconv rounded once to bf16)."""
    b, t, ho, wo, f = 2, 4, 8, 8, 4
    x = jnp.asarray(rng.normal(size=(b, t, ho, wo, 4 * f)), jnp.bfloat16)
    h0 = jnp.zeros((b, ho, wo, f), jnp.float32)
    c0 = jnp.zeros((b, ho, wo, f), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(3, 3, f, 4 * f)) * 0.2, jnp.float32)
    bias = jnp.zeros((4 * f,), jnp.float32)
    y, (hn, cn) = convlstm_scan_pallas(x, h0, c0, rk, bias)
    assert y.dtype == jnp.bfloat16
    assert hn.dtype == cn.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_bwd_batch_tile_fits_measured_vmem():
    """Pin the calibrated reverse-kernel batch-tile model against the
    Mosaic stack sizes measured on v5e (PARITY.md "Compile on real
    hardware"): enc4's fixed dW term forces a small tile, dec5's
    lane-padded 64x64 blocks force bt=1, and every choice must divide
    the batch."""
    from kccotgan_tpu.models.pallas_convlstm import _bwd_batch_tile

    flagship = {
        "enc1": (32, 32, 32, 6), "enc2": (16, 16, 64, 6),
        "enc3": (8, 8, 128, 5), "enc4": (4, 4, 256, 5),
        "dec2": (8, 8, 128, 4), "dec3": (16, 16, 64, 6),
        "dec4": (32, 32, 32, 8), "dec5": (64, 64, 8, 8),
    }
    for name, (ho, wo, f, k) in flagship.items():
        bt = _bwd_batch_tile(32, ho, wo, f, k, k, 2)
        assert 1 <= bt <= 32 and 32 % bt == 0, name
    # the two shapes that OOM'd at the old tiles (118.6 / 126 MiB):
    assert _bwd_batch_tile(32, 4, 4, 256, 5, 5, 2) <= 8
    assert _bwd_batch_tile(32, 64, 64, 8, 8, 8, 2) == 1


def test_fits_vmem_feasibility_gate():
    """The scoped-VMEM feasibility predicate must admit every flagship
    layer shape (all ran the fused kernel on the real chip) and reject
    the fat-channel shape that Mosaic-OOM'd (encoder4 at
    filter_size=16: f=512, k=5 — its bf16 weight copy alone is 105 MiB
    vs the 100 MiB fwd stack limit)."""
    from kccotgan_tpu.models.pallas_convlstm import fits_vmem

    flagship = {
        "enc1": (32, 32, 32, 6), "enc2": (16, 16, 64, 6),
        "enc3": (8, 8, 128, 5), "enc4": (4, 4, 256, 5),
        "dec2": (8, 8, 128, 4), "dec3": (16, 16, 64, 6),
        "dec4": (32, 32, 32, 8), "dec5": (64, 64, 8, 8),
    }
    for name, (ho, wo, f, k) in flagship.items():
        assert fits_vmem(ho, wo, f, k, k, 2), name
    assert not fits_vmem(4, 4, 512, 5, 5, 2)  # the measured OOM


def test_infeasible_shape_falls_back_to_scan():
    """ConvLSTM2D(kernel_impl='pallas') at a VMEM-infeasible fat shape
    must dispatch to the scan body (same math) instead of building the
    fused kernel — pinned by equality with kernel_impl='scan'."""
    rng = np.random.default_rng(5)
    # f=512 k=5 on a tiny spatial grid: infeasible per fits_vmem.
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 8)), jnp.float32)

    def run(impl):
        mod = ConvLSTM2D(
            filters=512, kernel_size=(5, 5), strides=(1, 1),
            kernel_impl=impl,
        )
        params = mod.init(jax.random.PRNGKey(0), x, training=False)
        return mod.apply(params, x, training=False)

    np.testing.assert_array_equal(
        np.asarray(run("pallas")), np.asarray(run("scan"))
    )
