"""Fused Pallas TPU kernel for the mixed causal-Sinkhorn divergence.

North-star component (BASELINE.json): the log-domain Sinkhorn iteration
over causal-transport cost matrices as a single fused TPU kernel.

Design:
* The three solves of the mixed divergence (xy, xx, yy —
  `gan_utils.py:221-223`) run TOGETHER: the cost stack ``[3, B, B]``
  plus both dual vectors stay resident in VMEM for all L iterations —
  zero HBM round-trips inside the loop (the XLA scan version streams
  u/v through HBM between fused sub-kernels).
* Dual layout avoids all transposes: ``u`` lives as ``[3, Bp, 1]``
  (sublane-aligned), ``v`` as ``[3, 1, Bp]`` (lane-aligned), so both
  logsumexp reductions and both broadcasts are native VPU ops.
* Padding to the f32 tile (rows to 8, lanes to 128) is handled with a
  large-constant mask: padded cost entries are +BIG and padded dual
  entries are pinned to -BIG each iteration, which zeroes their
  contribution through ``exp`` exactly in f32.
* Backward: Pallas has no autodiff, so the kernel saves the (u, v)
  trajectory (tiny: ``[L, 3, Bp]``) and a hand-derived adjoint of the
  unrolled iteration runs as a reverse ``lax.scan`` — gradients match
  ``jax.grad`` of the reference scan implementation (test-pinned), NOT
  merely the implicit-function approximation.

Semantics identical to ``sinkhorn.sinkhorn_from_cost`` (fixed L
iterations, reference update order — `gan_utils.py:151-164`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cost import causal_penalty, cost_xy

__all__ = ["sinkhorn_pallas_batch", "mixed_sinkhorn_pallas"]

_BIG = 1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(c_ref, cost_ref, uhist_ref, vhist_ref, *, n: int, eps: float, num_iters: int):
    k, br, bc = c_ref.shape
    c = c_ref[:]
    log_mu = -jnp.log(jnp.float32(n))

    row_valid = lax.broadcasted_iota(jnp.int32, (1, br, 1), 1) < n
    col_valid = lax.broadcasted_iota(jnp.int32, (1, 1, bc), 2) < n

    def body(i, carry):
        u, v = carry
        a = (-c + u + v) / eps
        r = jax.nn.logsumexp(a, axis=2, keepdims=True)  # [k, br, 1]
        u = eps * (log_mu - r) + u
        u = jnp.where(row_valid, u, -_BIG)
        b = (-c + u + v) / eps
        s = jax.nn.logsumexp(b, axis=1, keepdims=True)  # [k, 1, bc]
        v = eps * (log_mu - s) + v
        v = jnp.where(col_valid, v, -_BIG)
        uhist_ref[pl.ds(i, 1)] = u[:, :, 0][None]
        vhist_ref[pl.ds(i, 1)] = v[:, 0, :][None]
        return u, v

    u0 = jnp.where(row_valid, 0.0, -_BIG) * jnp.ones((k, br, 1), jnp.float32)
    v0 = jnp.where(col_valid, 0.0, -_BIG) * jnp.ones((k, 1, bc), jnp.float32)
    u, v = lax.fori_loop(0, num_iters, body, (u0, v0))

    pi_c = jnp.exp((-c + u + v) / eps) * c  # padded entries: pi == 0 exactly
    for i in range(k):  # k is static; scalar-reduce each matrix into SMEM
        cost_ref[i, 0] = jnp.sum(pi_c[i])


def _solve_padded(c_pad: jnp.ndarray, n: int, eps: float, num_iters: int, interpret: bool):
    k, br, bc = c_pad.shape
    kernel = partial(_kernel, n=n, eps=eps, num_iters=num_iters)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_iters, k, br), jnp.float32),
            jax.ShapeDtypeStruct((num_iters, k, bc), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(c_pad)


def _pad_costs(c_batch: jnp.ndarray) -> jnp.ndarray:
    k, n, _ = c_batch.shape
    br = _round_up(max(n, 8), 8)
    bc = _round_up(max(n, 128), 128)
    return jnp.pad(
        c_batch, ((0, 0), (0, br - n), (0, bc - n)), constant_values=_BIG
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sinkhorn_pallas_batch(
    c_batch: jnp.ndarray, eps: float = 1.0, num_iters: int = 100
) -> jnp.ndarray:
    """Solve K independent Sinkhorn problems ``[K, B, B] -> [K]`` in one
    fused kernel (uniform marginals 1/B, fixed ``num_iters``)."""
    costs, _, _ = _forward(c_batch, eps, num_iters)
    return costs


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _forward(c_batch, eps, num_iters):
    k, n, _ = c_batch.shape
    c_pad = _pad_costs(c_batch)
    costs, uhist, vhist = _solve_padded(
        c_pad, n, eps, num_iters, interpret=_interpret()
    )
    return costs[:, 0], uhist[:, :, :n], vhist[:, :, :n]


def _fwd(c_batch, eps, num_iters):
    costs, uhist, vhist = _forward(c_batch, eps, num_iters)
    return costs, (c_batch, uhist, vhist)


def _bwd(eps, num_iters, residuals, g):
    """Hand-derived adjoint of the unrolled log-domain iteration.

    Forward (per iter i, with u_i,v_i -> u_{i+1},v_{i+1}):
      A_i = (-C + u_i + v_i^T)/eps ;  r_i = lse_row(A_i)
      u_{i+1} = eps(log_mu - r_i) + u_i
      B_i = (-C + u_{i+1} + v_i^T)/eps ;  s_i = lse_col(B_i)
      v_{i+1} = eps(log_nu - s_i) + v_i
    Final: cost = sum(exp((-C + u_L + v_L^T)/eps) * C).

    The saved trajectory holds the POST-update pairs (u_{i+1}, v_{i+1});
    (u_i, v_i) are read from entry i-1 (zeros for i=0), so nothing is
    recomputed except the two softmaxes per step.
    """
    c_batch, uhist, vhist = residuals
    k, n, _ = c_batch.shape
    g = g.reshape(k, 1, 1)
    log_mu = -jnp.log(jnp.float32(n))

    u_prev = jnp.concatenate(
        [jnp.zeros((1, k, n), uhist.dtype), uhist[:-1]], axis=0
    )
    v_prev = jnp.concatenate(
        [jnp.zeros((1, k, n), vhist.dtype), vhist[:-1]], axis=0
    )

    u_l = uhist[-1][:, :, None]  # [k, n, 1]
    v_l = vhist[-1][:, None, :]  # [k, 1, n]
    m_fin = (-c_batch + u_l + v_l) / eps
    pi = jnp.exp(m_fin)
    # cost = sum(pi * C): direct C term + through M
    c_bar = g * pi
    m_bar = g * pi * c_batch
    c_bar = c_bar - m_bar / eps
    u_bar = jnp.sum(m_bar, axis=2, keepdims=True) / eps  # [k, n, 1]
    v_bar = jnp.sum(m_bar, axis=1, keepdims=True) / eps  # [k, 1, n]

    def step(carry, hist):
        c_bar, u_bar, v_bar = carry
        u_i, v_i, u_ip1 = hist  # [k,n] each
        u_i = u_i[:, :, None]
        u_ip1 = u_ip1[:, :, None]
        v_i = v_i[:, None, :]

        # ---- v-update adjoint: v_{i+1} = eps(log_nu - s_i) + v_i
        s_bar = -eps * v_bar  # [k, 1, n]
        b_i = (-c_batch + u_ip1 + v_i) / eps
        soft_col = jax.nn.softmax(b_i, axis=1)
        b_bar = soft_col * s_bar
        c_bar = c_bar - b_bar / eps
        u_ip1_bar = jnp.sum(b_bar, axis=2, keepdims=True) / eps
        v_i_bar = v_bar + jnp.sum(b_bar, axis=1, keepdims=True) / eps

        u_bar = u_bar + u_ip1_bar  # total cotangent on u_{i+1}

        # ---- u-update adjoint: u_{i+1} = eps(log_mu - r_i) + u_i
        r_bar = -eps * u_bar  # [k, n, 1]
        a_i = (-c_batch + u_i + v_i) / eps
        soft_row = jax.nn.softmax(a_i, axis=2)
        a_bar = soft_row * r_bar
        c_bar = c_bar - a_bar / eps
        u_i_bar = u_bar + jnp.sum(a_bar, axis=2, keepdims=True) / eps
        v_i_bar = v_i_bar + jnp.sum(a_bar, axis=1, keepdims=True) / eps

        return (c_bar, u_i_bar, v_i_bar), None

    hist = (u_prev, v_prev, uhist)  # scanned leading axis = iteration
    (c_bar, _, _), _ = lax.scan(
        step, (c_bar, u_bar, v_bar), hist, reverse=True
    )
    del log_mu  # (enters only via constants; no gradient path)
    return (c_bar,)


sinkhorn_pallas_batch.defvjp(_fwd, _bwd)


def mixed_sinkhorn_pallas(
    f_real: jnp.ndarray,
    f_fake: jnp.ndarray,
    h_fake: jnp.ndarray,
    m_real: jnp.ndarray,
    h_real: jnp.ndarray,
    m_fake: jnp.ndarray,
    scaling_coef,
    *,
    epsilon: float = 1.0,
    num_iters: int = 100,
) -> jnp.ndarray:
    """Mixed divergence ``2*W(x,y) - W(x,x) - W(y,y)`` with all three
    causally-modified cost matrices built on the MXU (Gram form) and
    solved in ONE fused Pallas kernel."""
    c_xy = cost_xy(f_real, f_fake, scaling_coef) + causal_penalty(
        h_fake, m_real, scaling_coef
    )
    c_xx = cost_xy(f_real, f_real, scaling_coef) + causal_penalty(
        h_real, m_real, scaling_coef
    )
    c_yy = cost_xy(f_fake, f_fake, scaling_coef) + causal_penalty(
        h_fake, m_fake, scaling_coef
    )
    costs = sinkhorn_pallas_batch(
        jnp.stack([c_xy, c_xx, c_yy]), epsilon, num_iters
    )
    return 2.0 * costs[0] - costs[1] - costs[2]
