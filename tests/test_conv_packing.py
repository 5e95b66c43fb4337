"""Space-to-depth conv packing: exactness vs the plain SAME conv.

The packed form must be the *same linear map* (models/conv_packing.py
derivation) — these tests pin it against `lax` SAME convs over the
kernel shapes the models actually instantiate (8x8 decoder5, 6x6/5x5
encoder taps, odd and even), plus round-trip and gradient flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from kccotgan_tpu.models.conv_packing import (
    depth_to_space,
    pack_kernel,
    packed_same_conv,
    space_to_depth,
)


def _same_conv(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)


def test_s2d_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x, 2), 2), x)


@pytest.mark.parametrize("k", [3, 4, 5, 6, 8])
def test_packed_conv_matches_same_conv(k):
    key = jax.random.PRNGKey(k)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, 16, 16, 3), jnp.float32)
    w = jax.random.normal(kw, (k, k, 3, 8), jnp.float32)
    want = _same_conv(x, w)
    got = depth_to_space(
        packed_same_conv(space_to_depth(x, 2), pack_kernel(w, 2), (k, k)), 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_conv_decoder5_shape():
    """The exact shape packing exists for: 8x8 taps, 17ch skip input,
    4f=32 gate outputs at 64x64 (flagship decoder5)."""
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, 64, 64, 17), jnp.float32)
    w = jax.random.normal(kw, (8, 8, 17, 32), jnp.float32) * 0.05
    want = _same_conv(x, w)
    got = depth_to_space(
        packed_same_conv(space_to_depth(x, 2), pack_kernel(w, 2), (8, 8)), 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_gradients_flow_to_original_kernel():
    """pack_kernel is a fixed linear rearrangement: grads w.r.t. the
    ORIGINAL parameter through the packed conv == grads through the
    plain conv."""
    key = jax.random.PRNGKey(7)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (1, 8, 8, 2), jnp.float32)
    w = jax.random.normal(kw, (5, 5, 2, 4), jnp.float32)

    def loss_plain(w):
        return jnp.sum(_same_conv(x, w) ** 2)

    def loss_packed(w):
        y = packed_same_conv(space_to_depth(x, 2), pack_kernel(w, 2), (5, 5))
        return jnp.sum(depth_to_space(y, 2) ** 2)

    g1 = jax.grad(loss_plain)(w)
    g2 = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-4)


def test_convlstm_packed_matches_unpacked():
    """ConvLSTM2D(conv_packing='auto') == 'off' on an eligible layer
    (stride 1, f=8, even dims): same outputs and same parameter
    gradients up to reduction order."""
    from kccotgan_tpu.models.layers import ConvLSTM2D

    key = jax.random.PRNGKey(3)
    kx, ki = jax.random.split(key)
    x = jax.random.normal(kx, (2, 4, 16, 16, 5), jnp.float32)

    def make(packing):
        return ConvLSTM2D(
            filters=8, kernel_size=(8, 8), strides=(1, 1),
            conv_packing=packing,
        )

    params = make("off").init(ki, x)["params"]

    def loss(mod, p):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    y_off, g_off = jax.value_and_grad(lambda p: loss(make("off"), p))(params)
    y_on, g_on = jax.value_and_grad(lambda p: loss(make("auto"), p))(params)
    np.testing.assert_allclose(y_on, y_off, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3),
        g_on, g_off,
    )


def test_convlstm_packed_carry_api():
    """return_state / initial_state speak frame layout regardless of
    packing: incremental (carry) encode == full encode."""
    from kccotgan_tpu.models.layers import ConvLSTM2D

    key = jax.random.PRNGKey(5)
    kx, ki = jax.random.split(key)
    x = jax.random.normal(kx, (1, 6, 16, 16, 3), jnp.float32)
    mod = ConvLSTM2D(
        filters=8, kernel_size=(5, 5), strides=(1, 1), conv_packing="auto",
    )
    params = mod.init(ki, x)["params"]
    y_full, (h_n, c_n) = mod.apply(
        {"params": params}, x, return_state=True
    )
    y1, st = mod.apply({"params": params}, x[:, :3], return_state=True)
    y2, (h2, c2) = mod.apply(
        {"params": params}, x[:, 3:], initial_state=st, return_state=True
    )
    np.testing.assert_allclose(
        jnp.concatenate([y1, y2], axis=1), y_full, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(h2, h_n, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c2, c_n, rtol=1e-4, atol=1e-5)


def test_convlstm_packing_skips_ineligible():
    """Odd spatial dims / stride-2 / large filters fall back to the
    unpacked path bit-for-bit (same compiled fn as conv_packing='off')."""
    from kccotgan_tpu.models.layers import ConvLSTM2D

    key = jax.random.PRNGKey(9)
    kx, ki = jax.random.split(key)
    x = jax.random.normal(kx, (1, 3, 15, 15, 2), jnp.float32)  # odd dims
    mod_on = ConvLSTM2D(filters=8, kernel_size=(3, 3), conv_packing="auto")
    mod_off = ConvLSTM2D(filters=8, kernel_size=(3, 3), conv_packing="off")
    params = mod_off.init(ki, x)["params"]
    np.testing.assert_array_equal(
        mod_on.apply({"params": params}, x),
        mod_off.apply({"params": params}, x),
    )
