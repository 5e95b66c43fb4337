"""Learning-rate schedule: linear warmup into staircase exponential decay.

Reproduces the reference's composition (`kernel_train.py:54-59` wrapping
`data_utils.py:589-621`): for ``step < warmup`` the LR is
``lr0 * step / warmup`` (polynomial warmup, power 1); afterwards
``lr0 * rate ** floor((step - warmup) / decay_steps)`` (Keras
ExponentialDecay with ``staircase=True``).

The reference calls ``apply_gradients`` twice per optimizer per train
iteration (h then m; encoder then decoder — `kernel_train.py:254-255,
290-291`), so each Keras optimizer's schedule step advances 2x per
iteration.  ``double_step`` + ``offset`` reproduce that cadence.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["warmup_staircase_exponential_decay"]


def warmup_staircase_exponential_decay(
    lr0: float,
    warmup_steps: int,
    decay_steps: int,
    decay_rate: float,
    *,
    double_step: bool = False,
    offset: int = 0,
):
    """Returns an optax-compatible ``schedule(count) -> lr``.

    With ``double_step`` the Keras-visible step is ``2*count + offset``
    (offset 0 for the first apply_gradients call in the iteration, 1 for
    the second).
    """

    def schedule(count):
        step = jnp.asarray(count, jnp.float32)
        if double_step:
            step = 2.0 * step + offset
        warm = lr0 * step / max(warmup_steps, 1)
        t = jnp.maximum(step - warmup_steps, 0.0)
        decayed = lr0 * decay_rate ** jnp.floor(t / decay_steps)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule
