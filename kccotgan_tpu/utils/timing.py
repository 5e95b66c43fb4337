"""True-sync device timing helpers.

Under the axon remote-TPU runtime, ``jax.block_until_ready`` can return
before the program actually retires on the chip (the tunnel acks enqueue,
not completion) — an 8192^3 matmul "benches" at 41 PFLOP/s with the
naive block-until-ready loop.  Only a host data readback is a true sync,
and a single readback costs ~30 ms of RPC latency, so per-call syncing
drowns the measurement.

The pattern that works (and matches ``bench.py``'s train-step timing):
chain the iterations through a device-resident scalar so the i-th call
data-depends on the (i-1)-th, then read back ONE scalar at the end.  The
one-time RPC latency is measured separately (``sync_floor``) and
subtracted.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["device_sync", "sync_floor", "time_chained"]


def device_sync(out) -> float:
    """True sync: reduce ``out`` (any pytree) to one host float."""
    leaves = jax.tree_util.tree_leaves(out)
    # Fetch a single element of the first leaf; slicing happens on
    # device, the transfer is one scalar.
    x = leaves[0]
    return float(jnp.asarray(x).ravel()[0])


def sync_floor(repeats: int = 3) -> float:
    """Measured cost (s) of one dispatch + scalar readback round-trip."""
    one = jnp.float32(1.0) + 0.0
    device_sync(one)  # warm path
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        device_sync(one + 1.0)
        best = min(best, time.perf_counter() - t0)
    return best


def time_chained(
    fn: Callable,
    *args,
    iters: int = 30,
    floor: float | None = None,
    repeats: int = 3,
) -> float:
    """Time ``fn(*args)`` per call (seconds), chaining iterations.

    ``fn`` must accept a trailing f32 scalar argument and fold it into
    its computation so iteration i+1 data-depends on iteration i's
    output (e.g. ``lambda p, x, s: apply(p, x + s)``).  The chain scalar
    stays ~0 (it is scaled by 1e-30 here) so numerics are unaffected.

    The RPC floor (~30 ms here) drifts by tens of ms run-to-run, so a
    single pass misreads anything faster than a few ms/iter: iters are
    auto-scaled until one pass costs >= 20x the floor, the pass is
    repeated ``repeats`` times, and the minimum is reported (min, not
    mean — floor drift is strictly additive noise).
    """
    if floor is None:
        floor = sync_floor()

    def one_pass(n: int) -> float:
        s = jnp.float32(0.0)
        out = fn(*args, s)
        s = _chain_scalar(out)
        device_sync(s)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, s)
            s = _chain_scalar(out)
        device_sync(s)
        return time.perf_counter() - t0

    total = one_pass(iters)
    # Scale until the pass dwarfs the floor (cap the growth: one pass
    # should stay under ~3 s even if the floor estimate is inflated).
    while total < 20.0 * floor and total < 3.0 and iters < 2000:
        iters = min(iters * 4, 2000)
        total = one_pass(iters)
    for _ in range(repeats - 1):
        total = min(total, one_pass(iters))
    return max(total - floor, 1e-9) / iters


def _chain_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return (jnp.asarray(leaf).ravel()[0] * 1e-30).astype(jnp.float32)
