"""Fused Pallas LSTM recurrence: the whole T-loop in one kernel.

Dense sibling of ``pallas_convlstm`` for the discriminators' 3-layer
LSTM stacks (re-derived from the reference's Keras stack,
`/root/reference/gan.py:411-418`).  The per-step work of these layers
is tiny ([B, U] state, U ≤ 64 at the flagship config), so under
``lax.scan`` the runtime is pure sequential dispatch latency — exactly
what fusing all T steps into one ``pallas_call`` removes:

* grid = (batch_tiles, T), executed sequentially on TPU, so the (h, c)
  state lives in VMEM scratch across all T steps (zero carry HBM
  traffic, no per-step kernel launches);
* the hoisted input projection streams per step from its natural
  ``[B, T, 4U]`` layout (no [B,T]<->[T,B] transpose pair);
* the recurrent matmul accumulates in f32 and is rounded once to the
  compute dtype — bit-matching ``layers.LSTM``'s
  dot(cdt) -> .astype(f32) step semantics;
* gate math (Keras order [i, f, c, o]) fuses on the VPU.

The backward pass is a reverse-time kernel under ``jax.custom_vjp``
(gate recompute from the saved h/c stacks; dW/db accumulated in VMEM
scratch across the whole grid).  Unlike the ConvLSTM kernel, the output
activation may be ``sigmoid`` (the discriminator's final layer,
`models/video.py` lstm3) — the adjoint dispatches on the activation
name statically.

Exactness vs the scan path is pinned in tests/test_pallas_lstm.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_scan_pallas"]


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _act(name: str):
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"unsupported activation for pallas lstm: {name!r}")


def _dact(name: str):
    """Derivative of the activation expressed in terms of its VALUE
    (both supported activations admit this form, which is what lets the
    backward kernel recompute instead of saving pre-activations)."""
    if name == "tanh":
        return lambda a: 1.0 - a * a
    if name == "sigmoid":
        return lambda a: a * (1.0 - a)
    raise ValueError(f"unsupported activation for pallas lstm: {name!r}")


def _batch_tile(b: int, u: int, itemsize: int) -> int:
    """Largest divisor of b keeping resident VMEM well under budget.

    Per-sample resident bytes: x_t [4U] cdt (double-buffered), y_t [U]
    cdt, h/c (+ adjoint dh/dc) f32 scratch, f32 gate vector [4U].  Lane
    padding: dims under 128 still occupy full (8, 128) VMEM tiles, so
    bill channel dims at >= 128 lanes.
    """
    lanes4u = max(4 * u, 128)
    lanesu = max(u, 128)
    per = (
        lanes4u * itemsize * 2      # x_t double buffer
        + lanesu * itemsize         # y_t
        + 4 * lanesu * 4 * 2        # h, c (or dh, dc) f32 scratch
        + lanes4u * 4               # f32 gate vector
    )
    budget = 8 * 1024 * 1024
    bt = b
    while bt > 1 and per * bt > budget:
        bt -= 1
        while b % bt:
            bt -= 1
    return bt


def _fwd_kernel(x_ref, h0_ref, c0_ref, rk_ref, b_ref, y_ref, cs_ref,
                hn_ref, cn_ref, h_scr, c_scr, *, act, rec_act, cdt, t_total):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]

    # Recurrent matmul, f32-accumulated, rounded ONCE to the compute
    # dtype — identical reduction semantics to layers.LSTM's
    # dot_general(cdt) -> .astype(f32).
    rproj = jnp.dot(
        h.astype(cdt), rk_ref[:].astype(cdt),
        preferred_element_type=jnp.float32,
    ).astype(cdt).astype(jnp.float32)

    # Streamed refs carry a singleton sublane axis ([bt, 1, 1, ch]):
    # Mosaic requires the LAST TWO block dims to tile (8, 128) or equal
    # the array dims, so the T=1 block must sit above them.
    z = x_ref[:, 0, 0].astype(jnp.float32) + b_ref[:] + rproj
    u = h.shape[-1]
    i = rec_act(z[..., :u])
    fg = rec_act(z[..., u:2 * u])
    cc = fg * c + i * act(z[..., 2 * u:3 * u])
    o = rec_act(z[..., 3 * u:])
    hh = o * act(cc)

    h_scr[:] = hh
    c_scr[:] = cc
    y_ref[:, 0, 0] = hh.astype(cdt)
    cs_ref[:, 0, 0] = cc

    @pl.when(t == t_total - 1)
    def _():
        hn_ref[:] = hh
        cn_ref[:] = cc


def _fwd(xproj, h0, c0, rec_kernel, bias, activation, recurrent_activation):
    b, t, u4 = xproj.shape
    u = u4 // 4
    cdt = xproj.dtype
    bt = _batch_tile(b, u, jnp.dtype(cdt).itemsize)
    nb = b // bt

    kern = partial(
        _fwd_kernel,
        act=_act(activation), rec_act=_act(recurrent_activation),
        cdt=cdt, t_total=t,
    )
    y, c_stack, h_n, c_n = pl.pallas_call(
        kern,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((bt, 1, 1, u4), lambda i, tt: (i, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, u), lambda i, tt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, u), lambda i, tt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rec_kernel [U, 4U]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [4U]
        ],
        out_specs=[
            pl.BlockSpec((bt, 1, 1, u), lambda i, tt: (i, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, 1, u), lambda i, tt: (i, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, u), lambda i, tt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, u), lambda i, tt: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, 1, u), cdt),          # y
            jax.ShapeDtypeStruct((b, t, 1, u), jnp.float32),  # c_stack
            jax.ShapeDtypeStruct((b, u), jnp.float32),        # h_n
            jax.ShapeDtypeStruct((b, u), jnp.float32),        # c_n
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, u), jnp.float32),
            pltpu.VMEM((bt, u), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=_interpret(),
    )(xproj.reshape(b, t, 1, u4), h0, c0, rec_kernel, bias)
    return y.reshape(b, t, u), c_stack.reshape(b, t, u), h_n, c_n


def _bwd_kernel(x_ref, y_ref, cs_ref, h0_ref, c0_ref, rk_ref, b_ref,
                dy_ref, dhn_ref, dcn_ref,
                dx_ref, dh0_ref, dc0_ref, drk_ref, db_ref,
                dh_scr, dc_scr, drk_scr, db_scr, *,
                act, dact, rec_act, cdt, t_total):
    """Reverse-time adjoint; step tt visits global time t = T-1-tt.
    Recomputes the gates from (x_t, h_{t-1}, c_{t-1}) — the saved
    stacks — then pushes cotangents through the cell.  dW/db accumulate
    in f32 VMEM scratch across the ENTIRE grid."""
    tt = pl.program_id(1)
    ib = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(jnp.logical_and(ib == 0, tt == 0))
    def _():
        drk_scr[:] = jnp.zeros_like(drk_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    @pl.when(tt == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]

    # h_{t-1}, c_{t-1}: block maps deliver y/cs at t-1 (clamped at t=0);
    # substitute (h0, c0) when this is the first step.
    first = tt == t_total - 1
    h_prev = jnp.where(first, h0_ref[:], y_ref[:, 0, 0].astype(jnp.float32))
    c_prev = jnp.where(first, c0_ref[:], cs_ref[:, 0, 0])

    u = h_prev.shape[-1]
    rk = rk_ref[:]
    hp = h_prev.astype(cdt)

    # ---- recompute forward gates for step t ----
    rproj = jnp.dot(
        hp, rk.astype(cdt), preferred_element_type=jnp.float32
    ).astype(cdt).astype(jnp.float32)
    z = x_ref[:, 0, 0].astype(jnp.float32) + b_ref[:] + rproj
    i = rec_act(z[..., :u])
    fg = rec_act(z[..., u:2 * u])
    g = act(z[..., 2 * u:3 * u])
    o = rec_act(z[..., 3 * u:])
    c_t = fg * c_prev + i * g
    tc = act(c_t)

    # ---- adjoint of the cell ----
    dh = dh_scr[:] + dy_ref[:, 0, 0].astype(jnp.float32)
    dc = dc_scr[:] + dh * o * dact(tc)
    do = dh * tc
    di = dc * g
    dfg = dc * c_prev
    dg = dc * i
    # recurrent activation is pinned to sigmoid by the dispatch
    dzi = di * i * (1.0 - i)
    dzf = dfg * fg * (1.0 - fg)
    dzc = dg * dact(g)
    dzo = do * o * (1.0 - o)
    dz = jnp.concatenate([dzi, dzf, dzc, dzo], axis=-1)  # [bt, 4U]

    dx_ref[:, 0, 0] = dz.astype(dx_ref.dtype)
    db_scr[0, :] = db_scr[0, :] + jnp.sum(dz, axis=0)

    dzc_ = dz.astype(cdt)
    dh_prev = jnp.dot(
        dzc_, rk.astype(cdt).T, preferred_element_type=jnp.float32
    )
    drk_scr[:] = drk_scr[:] + jax.lax.dot_general(
        hp, dzc_,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dh_scr[:] = dh_prev
    dc_scr[:] = dc * fg

    @pl.when(tt == t_total - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]

    @pl.when(jnp.logical_and(ib == nb - 1, tt == t_total - 1))
    def _():
        drk_ref[:] = drk_scr[:]
        db_ref[:] = db_scr[:]


def _bwd(xproj, h0, c0, rec_kernel, bias, y, c_stack,
         dy, dh_n, dc_n, activation, recurrent_activation):
    b, t, u4 = xproj.shape
    u = u4 // 4
    cdt = xproj.dtype
    bt = _batch_tile(b, u, jnp.dtype(cdt).itemsize)
    nb = b // bt

    kern = partial(
        _bwd_kernel,
        act=_act(activation), dact=_dact(activation),
        rec_act=_act(recurrent_activation),
        cdt=cdt, t_total=t,
    )

    def rev(i, tt):
        return (i, t - 1 - tt, 0, 0)

    def rev_prev(i, tt):
        # block at global t-1 (clamped; t=0 substitutes h0/c0 in-kernel)
        return (i, jnp.maximum(t - 2 - tt, 0), 0, 0)

    state_spec = pl.BlockSpec(
        (bt, u), lambda i, tt: (i, 0), memory_space=pltpu.VMEM
    )
    seq_spec = lambda imap, ch: pl.BlockSpec(  # noqa: E731
        (bt, 1, 1, ch), imap, memory_space=pltpu.VMEM
    )

    dx, dh0, dc0, drk, db = pl.pallas_call(
        kern,
        grid=(nb, t),
        in_specs=[
            seq_spec(rev, u4),        # x_t
            seq_spec(rev_prev, u),    # y at t-1  (h_prev)
            seq_spec(rev_prev, u),    # c_stack at t-1
            state_spec,               # h0
            state_spec,               # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rec_kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            seq_spec(rev, u),         # dy
            state_spec,               # dh_n
            state_spec,               # dc_n
        ],
        out_specs=[
            seq_spec(rev, u4),        # dx
            state_spec,               # dh0
            state_spec,               # dc0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # drk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, 1, u4), cdt),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((u, 4 * u), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * u), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, u), jnp.float32),
            pltpu.VMEM((bt, u), jnp.float32),
            pltpu.VMEM((u, 4 * u), jnp.float32),
            pltpu.VMEM((1, 4 * u), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=_interpret(),
    )(
        xproj.reshape(b, t, 1, u4),
        y.reshape(b, t, 1, u),
        c_stack.reshape(b, t, 1, u),
        h0, c0, rec_kernel, bias,
        dy.reshape(b, t, 1, u),
        dh_n, dc_n,
    )
    return dx.reshape(b, t, u4), dh0, dc0, drk, db[0]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def lstm_scan_pallas(
    xproj, h0, c0, rec_kernel, bias,
    activation="tanh", recurrent_activation="sigmoid",
):
    """Fused LSTM recurrence over ``xproj [B, T, 4U]``.

    ``xproj`` is the hoisted input projection (bias added in-kernel,
    matching ``layers.LSTM``'s streamed path) at compute precision.
    Returns ``(y [B, T, U] cdt, (h_n, c_n) f32)``.
    """
    y, _, h_n, c_n = _fwd(
        xproj, h0, c0, rec_kernel, bias, activation, recurrent_activation
    )
    return y, (h_n, c_n)


def _vjp_fwd(xproj, h0, c0, rec_kernel, bias, activation, recurrent_activation):
    y, c_stack, h_n, c_n = _fwd(
        xproj, h0, c0, rec_kernel, bias, activation, recurrent_activation
    )
    res = (xproj, h0, c0, rec_kernel, bias, y, c_stack)
    return (y, (h_n, c_n)), res


def _vjp_bwd(activation, recurrent_activation, res, cots):
    xproj, h0, c0, rec_kernel, bias, y, c_stack = res
    dy, (dh_n, dc_n) = cots
    dx, dh0, dc0, drk, db = _bwd(
        xproj, h0, c0, rec_kernel, bias, y, c_stack,
        dy.astype(xproj.dtype), dh_n, dc_n,
        activation, recurrent_activation,
    )
    return dx, dh0, dc0, drk.astype(rec_kernel.dtype), db.astype(bias.dtype)


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
