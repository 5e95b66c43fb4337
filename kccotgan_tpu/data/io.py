"""Backend dispatch for TFRecord IO: native C++ when available,
pure-Python otherwise.

The pure-Python implementation (`tfrecord.py`) is the semantics oracle;
the native library (`native/kccot_io.cc`) is parity-tested against it
and used by default because Python-level framing/proto parsing is
GIL-bound and would starve the device input pipeline
(SURVEY.md §3.5 hot spot #4).

Set ``KCCOT_FORCE_PY_IO=1`` to pin the pure-Python backend.
"""

from __future__ import annotations

import os

from . import tfrecord as _py

__all__ = [
    "iter_tfrecord",
    "parse_example",
    "parse_example_arrays",
    "parse_sequence_example",
    "backend",
]


def _pick():
    if os.environ.get("KCCOT_FORCE_PY_IO"):
        return _py, "python"
    try:
        from . import native_io as _nat

        if _nat.available():
            return _nat, "native"
    except Exception:
        pass
    return _py, "python"


_impl, _name = _pick()


def backend() -> str:
    """'native' or 'python'."""
    return _name


iter_tfrecord = _impl.iter_tfrecord
parse_example = _impl.parse_example
parse_example_arrays = _impl.parse_example_arrays
parse_sequence_example = _impl.parse_sequence_example
