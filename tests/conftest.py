"""Test session setup.

Forces JAX onto CPU with 8 virtual devices (the standard trick for
testing multi-chip sharding without a TPU pod) BEFORE jax initializes.
Must run before any module imports jax — pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize pre-imports jax and registers the TPU
# plugin, so the env vars alone are too late — flip the config knob too
# (backends are still uninitialized at conftest time).
import jax

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compile cache here.  Its background
# serialization threads (100MB+ executable writes) starve the 8-virtual-
# device collective rendezvous on this single-core host — XLA:CPU hard-
# aborts the process after 40s ("Exiting to ensure a consistent program
# state").  Sharing the axon .jax_cache is also unsafe: its host-side
# entries are compiled on the REMOTE TPU server's CPU and trip the
# cpu_aot_loader machine-feature mismatch when loaded locally.

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def _reference_available():
    if not os.path.isdir("/root/reference"):
        return False
    try:
        import tensorflow  # noqa: F401
    except Exception:
        return False
    return True


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "reference_oracle: parity test that executes the reference repo as an oracle",
    )


def pytest_collection_modifyitems(config, items):
    if _reference_available():
        return
    skip = pytest.mark.skip(reason="reference repo or TF unavailable")
    for item in items:
        if "reference_oracle" in item.keywords:
            item.add_marker(skip)
