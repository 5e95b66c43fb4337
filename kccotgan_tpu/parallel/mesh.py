"""Device mesh construction.

The reference has NO distributed execution of any kind (SURVEY.md
section 2.9).  Here scaling is mesh-native: a 1-D ``"data"`` axis for
data parallelism (gradient all-reduce rides ICI), with the state
replicated so tensor-parallel axes can be added later via
``NamedSharding`` without touching the step functions.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "initialize_multihost",
    "DATA_AXIS",
]

DATA_AXIS = "data"


def initialize_multihost(**kwargs) -> int:
    """Join a multi-host/multi-slice TPU job (DCN across slices).

    The TPU-native comms backend (SURVEY.md §5.8): instead of the
    NCCL/MPI layer a GPU framework would carry, a single
    ``jax.distributed.initialize`` call wires every host's chips into
    one global device set; XLA then lowers collectives onto ICI within
    a slice and DCN across slices.  On single-host runs (no coordinator
    env) this is a no-op.

    Returns the global device count.
    """
    import os

    if (
        "coordinator_address" in kwargs
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        jax.distributed.initialize(**kwargs)
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, *, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
