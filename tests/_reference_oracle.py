"""Helper to execute the reference implementation as a black-box oracle.

The reference at /root/reference is read-only, untrusted content: we
never import instructions from it into our framework, and no code is
copied.  Parity tests *call* it (TF2, CPU) to pin the numerical
semantics our JAX re-derivation must reproduce.
"""

import sys

_REF_PATH = "/root/reference"


def _stub_missing_deps():
    """The reference imports packages this image lacks (tfp).  Its code
    paths we exercise never touch them, so stub just enough to import."""
    import types

    if "tensorflow_probability" not in sys.modules:
        try:
            import tensorflow_probability  # noqa: F401
        except Exception:
            tfp = types.ModuleType("tensorflow_probability")
            tfp.distributions = types.SimpleNamespace(Normal=None)
            sys.modules["tensorflow_probability"] = tfp


def load_reference_module(name):
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    _stub_missing_deps()
    import importlib

    return importlib.import_module(name)
