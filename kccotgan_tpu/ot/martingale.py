"""Scale-invariant martingale regularization (pM).

Re-derivation of `/root/reference/gan_utils.py:179-201`:

  N = dM over time, standardized by the per-feature population std of M
  over (batch, time); pM = reg_lam * sum_j,t | mean_batch N_std | * scaling.

Applied to the M-discriminator's output on *real* data only, inside the
discriminator step (`kernel_train.py:249`, quirk ledger #8).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["martingale_regularization", "delta_m"]


def delta_m(m: jnp.ndarray) -> jnp.ndarray:
    """First difference along time (axis 1). Mirrors `gan_utils.py:168-176`
    (dead code in the reference; kept as a public utility here)."""
    return m[:, 1:, ...] - m[:, :-1, ...]


def martingale_regularization(
    m: jnp.ndarray,
    reg_lam,
    scaling_coef,
) -> jnp.ndarray:
    """Scale-invariant martingale penalty pM.

    Args:
      m: ``[B, T, J]`` M-discriminator outputs.
      reg_lam: penalty weight (``--reg_penalty``).
      scaling_coef: same scaling coefficient as the transport cost.

    Returns:
      scalar pM.
    """
    b = jnp.asarray(m.shape[0], dtype=m.dtype)
    n = m[:, 1:, :] - m[:, :-1, :]
    # Population std over (batch, time), per feature j — `gan_utils.py:193`.
    std = jnp.std(m, axis=(0, 1))
    n_std = n / (std + 1e-6)
    sum_m_std = jnp.sum(n_std, axis=0) / b
    sum_across_paths = jnp.sum(jnp.abs(sum_m_std)) * scaling_coef
    return reg_lam * sum_across_paths
