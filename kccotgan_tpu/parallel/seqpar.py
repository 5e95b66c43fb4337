"""Sequence (time-axis) parallelism: ring-relay sharded scan.

The reference's long-horizon hazards are sequential ConvLSTM scans over
T and T-sized activation stacks (SURVEY.md §5.7).  ``scan_remat``
already removes the activation stacks on one chip; this module adds the
multi-chip memory axis: shard the TIME dimension over a ``"seq"`` mesh
axis so each device holds only ``T / S`` frames of inputs and outputs
(O(T/S) activation memory — the enabler for very long horizons).

An RNN over sharded time has a sequential carry dependence, so this is
a *memory-scaling* transform, not a wall-clock one: the scan runs in
``S`` ring rounds.  In round ``r`` the device holding chunk ``r`` scans
its frames starting from the carry relayed by chunk ``r-1``
(``lax.ppermute`` over ICI — the ring-communication pattern that
ring-attention/CP use for KV blocks, applied here to the (h, c) carry,
exactly as SURVEY.md §2.9 prescribes).  Wall-clock is ``S`` sequential
rounds of a ``T/S``-step scan — the same total scan latency as one
chip, plus ``S-1`` carry hops; there is no round-level parallel speedup
(the carry chain forbids it), only the O(T/S) per-device memory win.
Off-turn devices skip the scan entirely via ``lax.cond`` (idle, not
redundantly computing), so total FLOPs also match one chip.

Exactness: ``time_sharded_scan`` == ``lax.scan`` bit-for-bit on the
gathered result (test-pinned on an 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["time_sharded_scan", "SEQ_AXIS"]

SEQ_AXIS = "seq"


def time_sharded_scan(
    step: Callable,
    init,
    xs_local,
    *,
    axis_name: str = SEQ_AXIS,
):
    """``lax.scan`` over a time axis sharded across ``axis_name``.

    Must run inside ``shard_map`` (or ``pmap``) with ``axis_name`` bound.

    Args:
      step: ``(carry, x_t) -> (carry, y_t)`` — same contract as lax.scan.
      init: initial carry (replicated pytree; only chunk 0 consumes it).
      xs_local: this device's time chunk, leading axis ``T_local``;
        devices are ordered along ``axis_name`` in time order.

    Returns:
      ``(final_carry, ys_local)`` — final carry is the true carry after
      the LAST global timestep (identical on every device); ``ys_local``
      are this device's outputs for its own chunk.
    """
    s = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(s - 1)]

    # The replicated init must be promoted to 'varying' over the seq
    # axis (post-0.8 shard_map type system) so scan carry types match.
    def _vary(x):
        try:
            return lax.pcast(x, (axis_name,), to="varying")
        except AttributeError:
            return lax.pvary(x, (axis_name,))

    init = jax.tree_util.tree_map(_vary, init)

    def select(pred, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(pred, x, y), a, b
        )

    def round_body(r, state):
        carry_in, ys = state
        mine = idx == r
        # Only the device whose turn it is scans its chunk; off-turn
        # devices take the no-op branch (XLA cond executes one side at
        # runtime — no masked redundant compute).
        carry_out, ys_r = lax.cond(
            mine,
            lambda c: lax.scan(step, c, xs_local),
            lambda c: (c, ys),
            carry_in,
        )
        ys = select(mine, ys_r, ys)
        done_carry = select(mine, carry_out, carry_in)
        # Relay the finished carry one step around the ring; device r+1
        # adopts it as its starting carry for round r+1.
        relayed = lax.ppermute(done_carry, axis_name, fwd)
        carry_in = select(idx == r + 1, relayed, done_carry)
        return carry_in, ys

    # Prime ys with a correctly-shaped (zero) buffer via one dry scan
    # shape inference — reuse the real scan on round 0 instead of paying
    # an extra pass: round_body overwrites ys for idx==r.
    carry_shape = jax.eval_shape(lambda c, x: lax.scan(step, c, x), init, xs_local)
    ys0 = jax.tree_util.tree_map(
        lambda sd: _vary(jnp.zeros(sd.shape, sd.dtype)), carry_shape[1]
    )
    final_carry, ys_local = lax.fori_loop(
        0, s, round_body, (init, ys0)
    )
    # After the last round the final carry lives on device s-1 (and was
    # relayed forward to nobody); broadcast it so every shard returns
    # the same final carry (cheap: carry is [B/..,h,w,f]-sized).
    last = jax.tree_util.tree_map(
        lambda x: lax.psum(jnp.where(idx == s - 1, x, jnp.zeros_like(x)), axis_name),
        final_carry,
    )
    return last, ys_local
