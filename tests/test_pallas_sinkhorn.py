"""Fused Pallas Sinkhorn kernel vs the pure-JAX scan reference.

Runs in Pallas interpret mode on CPU; the same code path compiles to
Mosaic on TPU (exercised by bench.py / the solver='pallas' train path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.ot import compute_sinkhorn_loss, sinkhorn_from_cost
from kccotgan_tpu.ot.pallas_sinkhorn import mixed_sinkhorn_pallas, sinkhorn_pallas_batch

L = 30
B, T, F, J = 6, 5, 12, 3
SCALING = 1.0 / 15.0


def _costs(rng, k=3, b=B):
    x = rng.normal(size=(k, b, b)).astype(np.float32)
    c = np.abs(x) + 0.1
    # make it cost-like: symmetric-ish positive with zero-ish diagonal
    return jnp.array(c)


def test_forward_matches_scan(rng):
    c = _costs(rng)
    got = sinkhorn_pallas_batch(c, 1.0, L)
    want = jnp.stack([sinkhorn_from_cost(c[i], num_iters=L) for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b", [2, 8, 32])
def test_forward_matches_scan_sizes(rng, b):
    c = _costs(rng, k=2, b=b)
    got = sinkhorn_pallas_batch(c, 0.7, L)
    want = jnp.stack(
        [sinkhorn_from_cost(c[i], epsilon=0.7, num_iters=L) for i in range(2)]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_gradient_matches_unrolled_autodiff(rng):
    """The hand-derived adjoint must equal jax.grad of the scan version
    (the unrolled derivative — what TF's GradientTape computes for the
    reference), not just the implicit-function approximation."""
    c = _costs(rng)

    def loss_pallas(c):
        return jnp.sum(sinkhorn_pallas_batch(c, 1.0, L) * jnp.array([2.0, -1.0, -1.0]))

    def loss_scan(c):
        costs = jnp.stack([sinkhorn_from_cost(c[i], num_iters=L) for i in range(3)])
        return jnp.sum(costs * jnp.array([2.0, -1.0, -1.0]))

    g_pallas = jax.grad(loss_pallas)(c)
    g_scan = jax.grad(loss_scan)(c)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_scan), rtol=1e-4, atol=1e-6
    )


def test_mixed_loss_pallas_path(rng):
    x = jnp.array(rng.normal(size=(B, T, F)).astype(np.float32))
    y = jnp.array(rng.normal(size=(B, T, F)).astype(np.float32))
    hf = jnp.array(rng.normal(size=(B, T, J)).astype(np.float32))
    mr = jnp.array(rng.normal(size=(B, T, J)).astype(np.float32))
    hr = jnp.array(rng.normal(size=(B, T, J)).astype(np.float32))
    mf = jnp.array(rng.normal(size=(B, T, J)).astype(np.float32))

    want = compute_sinkhorn_loss(
        x, y, SCALING, hf, mr, hr, mf, video=False, num_iters=L
    )
    got = compute_sinkhorn_loss(
        x, y, SCALING, hf, mr, hr, mf, video=False, num_iters=L, solver="pallas"
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    # gradient through the full mixed loss w.r.t. fake features
    def f(solver):
        return jax.grad(
            lambda yy: compute_sinkhorn_loss(
                x, yy, SCALING, hf, mr, hr, mf,
                video=False, num_iters=L, solver=solver,
            )
        )(y)

    np.testing.assert_allclose(
        np.asarray(f("pallas")), np.asarray(f("scan")), rtol=1e-3, atol=1e-5
    )
