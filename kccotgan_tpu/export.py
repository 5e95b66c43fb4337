"""AOT serving export: the rollout sampler as one portable artifact.

The reference can only produce samples inside a live training process —
its eval rollout is an inner function of the training script
(`kernel_train.py:339-356`) and needs the full TF2 stack, the model
code, and a checkpoint directory.  TPU-native redesign: ``jax.export``
serializes the jitted conditional-rollout program to StableHLO with the
trained weights baked in as constants and the batch dimension symbolic,
producing ONE self-contained file.  Any JAX process — CPU or TPU, with
no kccotgan_tpu import, no flax, and no checkpoint — deserializes it
and serves conditioned video predictions:

    from kccotgan_tpu.export import save_rollout, load_rollout
    save_rollout("model.kccot", cfg, state)          # once, after training
    serve = load_rollout("model.kccot")              # any process, any chip
    video = serve(context, seed=0)                   # [B,H,Tc+Tp,W,C]

Design notes:

* Weights are closure constants, so the artifact is the deployment
  unit (export-once / run-anywhere), and XLA constant-folds and fuses
  them like any literal.
* The batch dimension is exported symbolically
  (``jax.export.symbolic_shape``) by default, so one artifact serves
  any batch size; everything else (context length, resolution, horizon)
  is static — the shapes XLA needs to tile the MXU.
* The recurrence engine is pinned to the ``scan`` oracle for export:
  a Mosaic (Pallas) custom call is not portable StableHLO across
  platforms, and the engines are bit-equal (pinned by
  tests/test_pallas_convlstm.py), so artifact outputs are identical.
* ``platforms=("cpu", "tpu")`` by default: the artifact runs host-side
  for validation and on TPU for serving, dispatching per platform at
  load time.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .config import TrainConfig
from .train.rollout import build_rollout
from .train.state import GanModules

__all__ = ["export_rollout", "save_rollout", "load_rollout", "ServingRollout"]

# Artifact layout: 8-byte magic + u32 header length + JSON header +
# jax.export bytes.  The header carries the contract a serving fleet
# needs without deserializing the program.
_MAGIC = b"KCCOTEXP"
_FORMAT_VERSION = 1


class _ParamShim:
    """Duck-typed stand-in for TrainState: build_rollout reads only
    ``enc_params``/``dec_params``."""

    def __init__(self, enc_params: Any, dec_params: Any):
        self.enc_params = enc_params
        self.dec_params = dec_params


def _serving_fn(cfg: TrainConfig, enc_params: Any, dec_params: Any):
    """(context [B,H,Tc,W,C] f32, seed i32 scalar) -> [B,H,Tc+Tp,W,C]."""
    export_cfg = dataclasses.replace(cfg, kernel_impl="scan")
    mods = GanModules(export_cfg)
    roll = build_rollout(export_cfg, mods, jit=False)
    shim = _ParamShim(enc_params, dec_params)

    def serve(context, seed):
        return roll(shim, context, jax.random.PRNGKey(seed))

    return serve


def export_rollout(
    cfg: TrainConfig,
    state: Any,
    *,
    batch_polymorphic: bool = True,
    batch_size: int | None = None,
    platforms: Sequence[str] | None = ("cpu", "tpu"),
) -> jax_export.Exported:
    """Lower + export the rollout for ``state``'s weights.

    ``batch_polymorphic=True`` exports with a symbolic leading batch
    dim; otherwise ``batch_size`` (default ``cfg.batch_size``) is baked
    static.  ``platforms=None`` exports for the current backend only.
    """
    m = cfg.model
    if batch_polymorphic:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size or cfg.batch_size
    ctx_spec = jax.ShapeDtypeStruct(
        (b, m.x_height, cfg.int_time_steps, m.x_width, m.n_channels),
        jnp.float32,
    )
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    serve = _serving_fn(cfg, state.enc_params, state.dec_params)
    return jax_export.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms is not None else None,
    )(ctx_spec, seed_spec)


def save_rollout(
    path: str,
    cfg: TrainConfig,
    state: Any,
    **export_kwargs,
) -> dict:
    """Export and write the artifact; returns its JSON header."""
    exp = export_rollout(cfg, state, **export_kwargs)
    m = cfg.model
    header = {
        "format_version": _FORMAT_VERSION,
        "platforms": list(exp.platforms),
        "context_shape": [str(d) for d in exp.in_avals[0].shape],
        "output_time_steps": cfg.int_time_steps + cfg.pred_time_steps,
        "context_time_steps": cfg.int_time_steps,
        "height": m.x_height,
        "width": m.x_width,
        "channels": m.n_channels,
        "step": int(jax.device_get(state.step)) if hasattr(state, "step") else None,
    }
    blob = json.dumps(header).encode("utf-8")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(blob).to_bytes(4, "little"))
        f.write(blob)
        f.write(exp.serialize())
    return header


class ServingRollout:
    """Deserialized artifact: ``serve(context, seed=0) -> video``.

    ``context``: film-strip ``[B, H, Tc, W, C]`` float32 (any B if the
    artifact was exported batch-polymorphic).  Purely functional —
    identical (context, seed) pairs give identical videos.
    """

    def __init__(self, header: dict, exported: jax_export.Exported):
        self.header = header
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def platforms(self) -> tuple:
        return tuple(self.header["platforms"])

    def __call__(self, context, seed: int = 0):
        return self._call(
            jnp.asarray(context, jnp.float32), jnp.int32(seed)
        )


def load_rollout(path: str) -> ServingRollout:
    """Load an artifact written by :func:`save_rollout`.

    Needs only jax — no flax, no model code, no checkpoint.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(
                f"{path}: not a kccotgan export artifact (bad magic {magic!r})"
            )
        n = int.from_bytes(f.read(4), "little")
        header = json.loads(f.read(n).decode("utf-8"))
        if header.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"{path}: unsupported format_version {header.get('format_version')}"
            )
        exported = jax_export.deserialize(bytearray(f.read()))
    return ServingRollout(header, exported)
