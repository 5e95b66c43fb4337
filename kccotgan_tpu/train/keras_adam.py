"""Keras-3-exact Adam as an optax GradientTransformation.

The reference updates its four parameter groups through TWO shared
Keras Adam instances, calling ``apply_gradients`` twice per optimizer
per train iteration (h then m — `/root/reference/kernel_train.py:
254-255`; encoder then decoder — `:290-291`).  Keras 3 semantics
(`keras/src/optimizers/adam.py::update_step`,
`base_optimizer.py::apply`) that plain ``optax.adam`` does NOT match:

* the LR schedule is evaluated at ``iterations`` (0-based count of
  *apply calls*, advancing 2x per train iteration for a shared
  optimizer);
* the bias-correction powers use ``local_step = iterations + 1`` — so
  the SECOND parameter group of a shared optimizer is bias-corrected
  with beta^(2i) at train iteration i even though its own moments have
  only accumulated i times (optax.adam would use beta^i for both);
* epsilon is added to the RAW ``sqrt(v)`` with the bias corrections
  folded into the step size:
  ``update = lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)``
  (optax adds eps to the bias-corrected ``sqrt(vhat)``, an effective
  eps of ``eps*sqrt(1-b2^t)``).

Reproducing the reference's loss trajectory requires all three, so this
module implements the exact Keras update rule; ``double_step``/
``offset`` encode which slot of a shared optimizer a parameter group
occupies (0 = first ``apply_gradients`` call, 1 = second).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["keras_adam"]


class KerasAdamState(NamedTuple):
    count: chex.Array  # number of prior updates to THIS param group
    mu: optax.Params
    nu: optax.Params


def keras_adam(
    learning_rate: Callable[[chex.Numeric], chex.Numeric] | float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    *,
    double_step: bool = False,
    offset: int = 0,
) -> optax.GradientTransformation:
    """Keras-3-exact Adam.

    ``learning_rate`` is a schedule of the KERAS iteration counter (or a
    constant).  With ``double_step``, this param group's Keras-visible
    iteration at its n-th update (0-based) is ``2n + offset`` — the
    shared-optimizer double-apply cadence; otherwise it is ``n``.
    """

    def keras_iter(count):
        return 2 * count + offset if double_step else count

    def init_fn(params):
        return KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        it = keras_iter(state.count)
        lr = learning_rate(it) if callable(learning_rate) else learning_rate
        t = jnp.asarray(it + 1, jnp.float32)
        b1p = jnp.asarray(b1, jnp.float32) ** t
        b2p = jnp.asarray(b2, jnp.float32) ** t
        alpha = lr * jnp.sqrt(1.0 - b2p) / (1.0 - b1p)
        # Keras: m += (g - m)*(1-b1); v += (g^2 - v)*(1-b2)
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (g - m) * (1.0 - b1), state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: v + (jnp.square(g) - v) * (1.0 - b2),
            state.nu, updates,
        )
        new_updates = jax.tree_util.tree_map(
            lambda m, v: -(m * alpha) / (jnp.sqrt(v) + eps), mu, nu
        )
        return new_updates, KerasAdamState(
            count=state.count + 1, mu=mu, nu=nu
        )

    return optax.GradientTransformation(init_fn, update_fn)
