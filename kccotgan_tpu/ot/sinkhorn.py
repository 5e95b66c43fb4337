"""Log-domain Sinkhorn solvers and the mixed causal-Sinkhorn divergence.

Re-derivation of `/root/reference/gan_utils.py:75-227` as compiled JAX:

* ``sinkhorn_from_cost`` — the log-domain dual iteration, expressed as a
  ``lax.scan`` over a fixed iteration count so the whole solve compiles
  to a single fused XLA loop.  Matches the reference's exact update
  order (u-update recomputes the kernel before the v-update,
  `gan_utils.py:151-156`).  The reference's early-stop is dead code
  (``Lmin == L == 100``, quirk ledger #2), so the default here is a
  fixed-trip-count scan — the XLA-friendly choice.  An optional
  ``early_stop`` mode reproduces the (reachable-in-principle) break via
  ``lax.while_loop`` for the benchmark solver's ``Lmin=10`` semantics.

* ``compute_sinkhorn`` — Sinkhorn on the causally modified cost
  (`gan_utils.py:124-165`).

* ``benchmark_sinkhorn`` — plain-cost evaluation solver with live early
  stop (`gan_utils.py:75-121`).

* ``compute_sinkhorn_loss`` — the mixed divergence
  ``2*W(x,y) - W(x,x) - W(y,y)`` on flattened video frames
  (`gan_utils.py:204-227`).  Reference quirk ledger #1: the reference
  binds its CLI epsilon/L positionally into unused parameters, so the
  *effective* training values are always ``epsilon=1.0, L=100``.  Here
  epsilon/L are real knobs whose defaults equal those effective values.

The gradient flows through the scan exactly as TF's GradientTape
differentiates through the reference's Python loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .cost import bi_causal_modified_cost, cost_xy, modified_cost

__all__ = [
    "sinkhorn_from_cost",
    "compute_sinkhorn",
    "benchmark_sinkhorn",
    "compute_sinkhorn_loss",
    "flatten_video",
]

_DEFAULT_EPS = 1.0
_DEFAULT_L = 100
_STOP_THRESHOLD = 1e-2


def _dual_step(c: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, log_mu, log_nu, epsilon):
    """One Sinkhorn dual update in the reference's exact order."""
    muv = (-c + u + v.T) / epsilon
    u = epsilon * (log_mu - jax.nn.logsumexp(muv, axis=1, keepdims=True)) + u
    muv = (-c + u + v.T) / epsilon
    v = epsilon * (log_nu - jax.nn.logsumexp(muv.T, axis=1, keepdims=True)) + v
    return u, v


def sinkhorn_from_cost(
    c: jnp.ndarray,
    *,
    epsilon: float = _DEFAULT_EPS,
    num_iters: int = _DEFAULT_L,
    lmin: int | None = None,
    threshold: float = _STOP_THRESHOLD,
    grad: str = "unrolled",
) -> jnp.ndarray:
    """Entropic OT cost ``<pi, C>`` for a given cost matrix.

    Uniform marginals ``mu = nu = 1/n`` (`gan_utils.py:138-141`).

    Args:
      c: ``[B, B]`` cost matrix.
      epsilon: entropic regularization.
      num_iters: maximum dual iterations ``L``.
      lmin: if ``None`` (default), run exactly ``num_iters`` iterations —
        the reference trainer's effective behavior.  Otherwise enable the
        early stop: break once ``sum|u - u_prev| < threshold`` and at
        least ``lmin`` iterations have run (`gan_utils.py:149-160`).
        The early-stop path is differentiable: ``lax.while_loop`` has no
        reverse-mode rule, so its duals are treated as a fixed point and
        the gradient flows through the implicit-function-theorem VJP
        below (exact in the converged limit the early stop certifies;
        the ``grad`` arg is ignored on this path).
      grad: ``'unrolled'`` (default) differentiates through all L dual
        updates — exactly what TF's GradientTape computes for the
        reference, O(L) backward.  ``'implicit'`` applies the implicit
        function theorem at the dual fixed point (cf. "A Unified
        Framework for Implicit Sinkhorn Differentiation",
        arXiv:2205.06688): the backward collapses to ONE ``[2B, 2B]``
        linear solve instead of an L-step reverse scan — O(1) in L,
        equal to the unrolled gradient in the converged limit.  A
        production speed knob for large L; NOT bit-parity with the
        reference at finite L.
    """
    n = c.shape[0]
    log_mu = jnp.full((n, 1), -jnp.log(jnp.float32(n)), dtype=c.dtype)
    log_nu = log_mu
    u0 = jnp.zeros((n, 1), dtype=c.dtype)
    v0 = jnp.zeros((n, 1), dtype=c.dtype)

    if lmin is None:
        def body(carry, _):
            u, v = carry
            u, v = _dual_step(c, u, v, log_mu, log_nu, epsilon)
            return (u, v), None

        (u, v), _ = lax.scan(body, (u0, v0), None, length=num_iters)
    else:
        # The dual solve runs on a gradient-severed cost so the
        # while_loop never enters the autodiff graph (it has no
        # transpose rule); the cost below re-attaches ``c`` through the
        # implicit-gradient VJP.
        c_ng = lax.stop_gradient(c)

        def cond(state):
            u, v, err, it = state
            return jnp.logical_and(
                it < num_iters,
                jnp.logical_or(err >= threshold, it < lmin),
            )

        def body(state):
            u, v, _, it = state
            u_prev = u
            u, v = _dual_step(c_ng, u, v, log_mu, log_nu, epsilon)
            err = jnp.sum(jnp.abs(u - u_prev))
            return u, v, err, it + 1

        u, v, _, _ = lax.while_loop(
            cond, body, (u0, v0, jnp.asarray(jnp.inf, c.dtype), jnp.int32(0))
        )
        return _cost_with_implicit_grad(c, u, v, epsilon)

    if grad == "implicit":
        return _cost_with_implicit_grad(
            c, lax.stop_gradient(u), lax.stop_gradient(v), epsilon
        )
    if grad != "unrolled":
        raise ValueError(f"unknown grad mode: {grad!r}")
    muv = (-c + u + v.T) / epsilon
    pi = jnp.exp(muv)
    return jnp.sum(pi * c)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _cost_with_implicit_grad(c, u, v, epsilon):
    pi = jnp.exp((-c + u + v.T) / epsilon)
    return jnp.sum(pi * c)


def _implicit_fwd(c, u, v, epsilon):
    return _cost_with_implicit_grad(c, u, v, epsilon), (c, u, v)


def _implicit_bwd(epsilon, res, g):
    """IFT gradient of ``W = <pi(C), C>`` at the dual fixed point.

    With ``pi = exp((-C + u + v^T)/eps)`` and marginal residuals
    ``G1_i = eps(log rowsum_i - log mu_i)``, ``G2_j`` likewise:

      J = [[I, P/mu], [(P/nu)^T, I]]        (Jacobian wrt (u, v))
      dW/d(u, v) = (1/eps) [P C 1, (P C)^T 1]
      grad_C = pi (1 - C/eps)  -  (lam1_i + lam2_j) pi_ij / m_ij

    where ``J^T lam = -dW/d(u, v)`` and ``m`` carries the mu/nu
    normalizers.  J is singular along the (u+t, v-t) gauge; the system
    is consistent (W is gauge-invariant), solved with a tiny ridge.
    """
    c, u, v = res
    n = c.shape[0]
    pi = jnp.exp((-c + u + v.T) / epsilon)
    mu = jnp.full((n,), 1.0 / n, c.dtype)

    a = pi / mu[:, None]  # P/mu  (rows sum to ~1 at convergence)
    b = pi / mu[None, :]  # P/nu
    eye = jnp.eye(n, dtype=c.dtype)
    jac_t = jnp.block([[eye, b], [a.T, eye]])  # J^T
    w = jnp.sum(pi * c, axis=1) / epsilon
    z = jnp.sum(pi * c, axis=0) / epsilon
    rhs = -jnp.concatenate([w, z])
    lam = jnp.linalg.solve(
        jac_t + 1e-6 * jnp.eye(2 * n, dtype=c.dtype), rhs
    )
    lam1, lam2 = lam[:n], lam[n:]

    direct = pi * (1.0 - c / epsilon)
    dual_term = (lam1[:, None] * a) + (lam2[None, :] * b)
    return (g * (direct - dual_term), None, None)


_cost_with_implicit_grad.defvjp(_implicit_fwd, _implicit_bwd)


def compute_sinkhorn(
    x: jnp.ndarray,
    y: jnp.ndarray,
    hy: jnp.ndarray,
    mx: jnp.ndarray,
    scaling_coef,
    hx: jnp.ndarray | None = None,
    my: jnp.ndarray | None = None,
    *,
    epsilon: float = _DEFAULT_EPS,
    num_iters: int = _DEFAULT_L,
    bi_causal: bool = False,
    cost_method: str = "gram",
    grad: str = "unrolled",
) -> jnp.ndarray:
    """Sinkhorn cost on the causally modified cost (`gan_utils.py:124-165`)."""
    if bi_causal:
        c = bi_causal_modified_cost(
            x, y, hy, mx, hx, my, scaling_coef, cost_method=cost_method
        )
    else:
        c = modified_cost(x, y, hy, mx, scaling_coef, cost_method=cost_method)
    return sinkhorn_from_cost(c, epsilon=epsilon, num_iters=num_iters, grad=grad)


def benchmark_sinkhorn(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scaling_coef,
    *,
    epsilon: float = 1.0,
    num_iters: int = 10,
    lmin: int = 10,
    cost_method: str = "gram",
) -> jnp.ndarray:
    """Plain-cost Sinkhorn evaluation utility (`gan_utils.py:75-121`)."""
    c = cost_xy(x, y, scaling_coef, method=cost_method)
    return sinkhorn_from_cost(
        c, epsilon=epsilon, num_iters=num_iters, lmin=lmin
    )


def flatten_video(frames: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, T, W, C]`` film-strip video -> ``[B, T, H*W*C]`` series
    (`gan_utils.py:216-220`)."""
    x = jnp.transpose(frames, (0, 2, 1, 3, 4))
    return x.reshape(x.shape[0], x.shape[1], -1)


@partial(
    jax.jit,
    # epsilon is static so the fused Pallas solver (custom_vjp with
    # nondiff eps) sees a Python float even under an outer jit.
    static_argnames=(
        "video", "epsilon", "num_iters", "cost_method", "solver", "grad"
    ),
)
def compute_sinkhorn_loss(
    f_real: jnp.ndarray,
    f_fake: jnp.ndarray,
    scaling_coef,
    h_fake: jnp.ndarray,
    m_real: jnp.ndarray,
    h_real: jnp.ndarray,
    m_fake: jnp.ndarray,
    *,
    video: bool = True,
    epsilon: float = _DEFAULT_EPS,
    num_iters: int = _DEFAULT_L,
    cost_method: str = "gram",
    solver: str = "auto",
    grad: str = "unrolled",
) -> jnp.ndarray:
    """Mixed causal-Sinkhorn divergence ``2*W(x,y) - W(x,x) - W(y,y)``.

    Defaults reproduce the reference trainer's *effective* hyperparameters
    (``epsilon=1.0, num_iters=100`` — see module docstring).

    ``solver='pallas'`` routes the three solves through the fused Pallas
    TPU kernel (cost matrices resident in VMEM for all L iterations);
    it beats the scan solver standalone in every measured (B, L) regime
    (PARITY.md solver table — up to 2.3x on fwd+grad; the one losing
    cell in the round-2 table, B=128/L=100, no longer reproduces after
    the r3 solver changes — boundary re-swept at B=64..256, Pallas wins
    everywhere, so ``'auto'`` needs no shape dispatch).  ``'auto'`` (the
    default) picks pallas on a TPU backend and scan elsewhere (the
    kernel would run in slow interpret mode off-TPU).
    """
    if video:
        f_real = flatten_video(f_real)
        f_fake = flatten_video(f_fake)
    if solver == "auto":
        import jax

        solver = "pallas" if jax.default_backend() == "tpu" else "scan"
    if solver == "pallas":
        from .pallas_sinkhorn import mixed_sinkhorn_pallas

        return mixed_sinkhorn_pallas(
            f_real,
            f_fake,
            h_fake,
            m_real,
            h_real,
            m_fake,
            scaling_coef,
            epsilon=epsilon,
            num_iters=num_iters,
        )
    loss_xy = compute_sinkhorn(
        f_real, f_fake, h_fake, m_real, scaling_coef,
        epsilon=epsilon, num_iters=num_iters, cost_method=cost_method,
        grad=grad,
    )
    loss_xx = compute_sinkhorn(
        f_real, f_real, h_real, m_real, scaling_coef,
        epsilon=epsilon, num_iters=num_iters, cost_method=cost_method,
        grad=grad,
    )
    loss_yy = compute_sinkhorn(
        f_fake, f_fake, h_fake, m_fake, scaling_coef,
        epsilon=epsilon, num_iters=num_iters, cost_method=cost_method,
        grad=grad,
    )
    return 2.0 * loss_xy - loss_xx - loss_yy
