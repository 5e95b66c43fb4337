"""Causal optimal-transport cost matrices.

Re-derivation of the reference math (`/root/reference/gan_utils.py:6-72`)
as TPU-first JAX:

* ``cost_xy`` — pairwise squared-L2 cost between two batches of
  time-series, summed over features then time, scaled by
  ``scaling_coef``.  The reference materializes the broadcasted
  ``[B, B, T, F]`` difference tensor (`gan_utils.py:14-17`); on TPU the
  same quantity is a Gram matrix: ``|x|^2 + |y|^2 - 2 x.y`` with the
  inner product computed as one ``[B, T*F] @ [T*F, B]`` matmul on the
  MXU.  ``method='exact'`` reproduces the reference's reduction order
  (used by parity tests); ``method='gram'`` is the fast default.

* ``causal_penalty`` / ``modified_cost`` — the COT causality Lagrangian
  ``C_hM[a, b] = sum_{t<T-1, j} h[a, t, j] * (M[b, t+1, j] - M[b, t, j])``
  added to ``cost_xy`` (`gan_utils.py:21-43`).  The reference builds a
  ``[B, B, T-1, J]`` outer product (`gan_utils.py:37`) — the true long-T
  memory hazard.  Here it is a single ``[B, (T-1)*J] @ [(T-1)*J, B]``
  matmul: no T-sized intermediate ever exists, so long-horizon configs
  are T-independent in memory.

* ``bi_causal_modified_cost`` — symmetric variant (`gan_utils.py:46-72`);
  reachable but never used by the reference trainer (quirk ledger #3).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = [
    "cost_xy",
    "causal_penalty",
    "modified_cost",
    "bi_causal_modified_cost",
]


def _flatten_time_features(x: jnp.ndarray) -> jnp.ndarray:
    b = x.shape[0]
    return x.reshape(b, -1)


def cost_xy(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scaling_coef: jnp.ndarray | float,
    *,
    method: str = "gram",
) -> jnp.ndarray:
    """Pairwise squared-L2 cost matrix between time-series batches.

    Args:
      x: ``[B, T, F]`` real samples.
      y: ``[B', T, F]`` fake samples.
      scaling_coef: scalar multiplier (the trainer passes ``1/flag``,
        mirroring `kernel_train.py:71`).
      method: ``'gram'`` (MXU matmul, default) or ``'exact'`` (reference
        broadcast-subtract reduction order, for parity testing).

    Returns:
      ``[B, B']`` cost matrix ``C[i, j] = scaling * sum_{t,f} (x_i - y_j)^2``.
    """
    if method == "exact":
        diff = x[:, None, :, :] - y[None, :, :, :]
        sum_over_feats = jnp.sum(diff * diff, axis=-1)
        return jnp.sum(sum_over_feats, axis=-1) * scaling_coef
    if method != "gram":
        raise ValueError(f"unknown cost method: {method!r}")
    xf = _flatten_time_features(x)
    yf = _flatten_time_features(y)
    x_sq = jnp.sum(xf * xf, axis=-1)
    y_sq = jnp.sum(yf * yf, axis=-1)
    xy = lax.dot_general(
        xf,
        yf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sq = x_sq[:, None] + y_sq[None, :] - 2.0 * xy
    # Squared distances are non-negative; the Gram form can dip slightly
    # below zero for near-identical rows (e.g. the xx/yy self-terms).
    return jnp.maximum(sq, 0.0) * scaling_coef


def causal_penalty(
    h: jnp.ndarray,
    m: jnp.ndarray,
    scaling_coef: jnp.ndarray | float,
) -> jnp.ndarray:
    """COT causality term ``C_hM[a, b] = <h_a[:-1], dM_b>`` as one matmul.

    Args:
      h: ``[B, T, J]`` output of the h-discriminator.
      m: ``[B', T, J]`` output of the M-discriminator.

    Returns:
      ``[B, B']`` penalty matrix (rows follow ``h``, columns follow ``m``,
      matching `gan_utils.py:37-38`).
    """
    dm = m[:, 1:, :] - m[:, :-1, :]
    ht = h[:, :-1, :]
    b_h = ht.shape[0]
    b_m = dm.shape[0]
    prod = lax.dot_general(
        ht.reshape(b_h, -1),
        dm.reshape(b_m, -1),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return prod * scaling_coef


def modified_cost(
    x: jnp.ndarray,
    y: jnp.ndarray,
    h: jnp.ndarray,
    m: jnp.ndarray,
    scaling_coef: jnp.ndarray | float,
    *,
    cost_method: str = "gram",
) -> jnp.ndarray:
    """Squared-L2 cost plus the causal Lagrangian (`gan_utils.py:21-43`).

    ``C[i, j] = cost_xy(x, y)[i, j] + sum_{t<T-1, j'} h[i, t, j'] * dM[j, t, j']``
    """
    return cost_xy(x, y, scaling_coef, method=cost_method) + causal_penalty(
        h, m, scaling_coef
    )


def bi_causal_modified_cost(
    x: jnp.ndarray,
    y: jnp.ndarray,
    hy: jnp.ndarray,
    mx: jnp.ndarray,
    hx: jnp.ndarray,
    my: jnp.ndarray,
    scaling_coef: jnp.ndarray | float,
    *,
    cost_method: str = "gram",
) -> jnp.ndarray:
    """Bi-causal cost: both ``h(y).dM(x)`` and ``h(x).dM(y)`` terms
    (`gan_utils.py:46-72`).  Note the second term is transposed so its
    rows follow ``hx`` — reproduced exactly (the reference adds
    ``C_Mh[a, b] = <hx_a, dMy_b>`` without transposing)."""
    c = cost_xy(x, y, scaling_coef, method=cost_method)
    c = c + causal_penalty(hy, mx, scaling_coef)
    c = c + causal_penalty(hx, my, scaling_coef)
    return c
