"""Ring-relay time-sharded scan vs plain lax.scan (8-device CPU mesh)."""

import numpy as np
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from kccotgan_tpu.parallel.seqpar import time_sharded_scan

T, B, F = 16, 4, 8


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("seq",))


def _step(carry, xt):
    h, c = carry
    z = jnp.tanh(xt + h * 0.5 + c * 0.1)
    c2 = 0.9 * c + 0.1 * z
    return (z, c2), z * 2.0 + c2


def test_time_sharded_scan_matches_lax_scan(rng):
    xs = jnp.array(rng.normal(size=(T, B, F)).astype(np.float32))
    init = (jnp.zeros((B, F)), jnp.ones((B, F)))

    want_carry, want_ys = lax.scan(_step, init, xs)

    mesh = _mesh()
    fn = shard_map(
        partial(time_sharded_scan, _step, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(), P("seq")),
        out_specs=(P(), P("seq")),
    )
    got_carry, got_ys = jax.jit(lambda i, x: fn(i, x))(init, xs)

    np.testing.assert_allclose(np.asarray(got_ys), np.asarray(want_ys), rtol=1e-6)
    for g, w in zip(got_carry, want_carry):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_time_sharded_scan_gradients(rng):
    """Differentiating through the ring relay must match plain scan."""
    xs = jnp.array(rng.normal(size=(T, B, F)).astype(np.float32))
    init = (jnp.zeros((B, F)), jnp.ones((B, F)))
    mesh = _mesh()
    fn = shard_map(
        partial(time_sharded_scan, _step, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(), P("seq")),
        out_specs=(P(), P("seq")),
    )

    def loss_sharded(x):
        _, ys = fn(init, x)
        return jnp.sum(ys**2)

    def loss_plain(x):
        _, ys = lax.scan(_step, init, x)
        return jnp.sum(ys**2)

    g1 = jax.jit(jax.grad(loss_sharded))(xs)
    g2 = jax.grad(loss_plain)(xs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)
