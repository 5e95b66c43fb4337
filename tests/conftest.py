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

# Persistent compile cache: the train-step variant tests each compile a
# full two-phase GAN program (~2 min of XLA CPU time); cache them across
# pytest runs.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

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
