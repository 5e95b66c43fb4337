"""Sequence parallelism for the real video models.

Wires ``time_sharded_scan`` (parallel/seqpar.py) into the actual
``VideoEncoder`` / ``VideoDecoder`` ConvLSTM stacks (SURVEY.md §2.9
"halo-exchange carry state via ppermute across the seq axis" — the
reference analogue is the sequential T-scans at
`/root/reference/gan.py:91-109`).  Each device holds only ``T/S``
frames of every activation, so per-device activation memory for the
ConvLSTM pyramids scales O(T/S) — the enabler for long-horizon configs
that exceed one chip's HBM.

Design split:

* per-timestep work (the hoisted input convs, LayerNorm, the decoder's
  per-frame ConvTranspose) is embarrassingly parallel over time and
  runs on local shards untouched;
* the recurrences run as ring-relay scans (``seq_axis`` set on the
  layers — they relay the (h, c) carry over ``lax.ppermute``);
* global-TIME slices (the encoder's ``[:, Tc-1:]`` pyramid slice, the
  decoder's teacher-forcing ``[:, :-1]``) cannot be done on a local
  chunk, so these wrappers hoist them OUTSIDE the shard_map region
  where GSPMD reshards the (time-sharded) global arrays exactly.

Exactness vs the unsharded modules is test-pinned on an 8-device CPU
mesh (tests/test_seqpar.py) and asserted by the driver dryrun.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .seqpar import SEQ_AXIS

__all__ = [
    "seq_mesh",
    "data_seq_mesh",
    "time_sharded_encode",
    "time_sharded_decode",
]


def _shard_rngs(rngs, data_axis):
    """Dropout keys must be identical across the SEQ axis (Keras masks
    are shared over time) but independent across DATA shards — each
    shard holds different batch rows, so reusing one key would correlate
    masks between rows that are independent in the unsharded model."""
    if rngs is None or data_axis is None:
        return rngs
    idx = jax.lax.axis_index(data_axis)
    return jax.tree_util.tree_map(
        lambda k: jax.random.fold_in(k, idx), rngs
    )


def seq_mesh(n_devices: int | None = None, *, axis_name: str = SEQ_AXIS) -> Mesh:
    """1-D mesh over the time axis."""
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_seq_mesh(
    data: int,
    seq: int,
    *,
    data_axis: str = "data",
    axis_name: str = SEQ_AXIS,
) -> Mesh:
    """2-D ``(data, seq)`` mesh: batch sharded over ``data``, the time
    axis of generator activations over ``seq``.  The seq axis is the
    MINOR (fastest-varying) mesh dimension so each ring-relay's
    ppermute neighbours are ICI-adjacent chips; the data axis carries
    only the per-step gradient all-reduce + Sinkhorn feature gathers
    (comms budget: artifacts/comms_flagship_8dev.json)."""
    import numpy as np

    devs = jax.devices()[: data * seq]
    return Mesh(np.asarray(devs).reshape(data, seq), (data_axis, axis_name))


def time_sharded_encode(
    encoder,
    variables,
    video: jnp.ndarray,
    mesh: Mesh,
    *,
    training: bool = True,
    axis_name: str = SEQ_AXIS,
    data_axis: str | None = None,
    rngs=None,
):
    """Run ``VideoEncoder`` with the time axis sharded over ``axis_name``.

    ``data_axis``: if the mesh is 2-D (data x seq), the batch dim is
    additionally sharded over this axis — each shard then runs the ring
    relay on its own batch rows (batch is embarrassingly parallel in
    the recurrence).

    Args:
      encoder: a ``models.VideoEncoder`` instance (``seq_axis`` unset —
        it is cloned with the axis bound here).
      variables: its flax variables (replicated).
      video: global film-strip video ``[B, H, T, W, C]``; ``T`` must be
        divisible by the mesh axis size.
      mesh: a mesh containing ``axis_name``.

    Returns the same 5-level pyramid as ``encoder.apply(...,
    slice_time=True)`` — each level ``[B, T-Tc+1, h, w, c]`` sharded
    over time — exactly (ring-relay scan is bit-exact vs lax.scan).
    """
    enc = encoder.clone(seq_axis=axis_name)
    tc = encoder.int_time_steps

    def body(vars_, video_local):
        # Full-length pyramid on the local chunk; the [:, Tc-1:] slice
        # is global-time and happens outside.  ``rngs`` is identical on
        # every shard — Keras dropout masks are shared across TIME, so
        # same-key masks on every time chunk reproduce the unsharded
        # semantics exactly.  ``vars_`` is an EXPLICIT replicated input
        # (not a closure capture): differentiating w.r.t. a value
        # closed over by a shard_map body breaks under the sharding-in-
        # types cotangent instantiation (Auto-mesh aval inside the
        # Manual region) — explicit P() args transpose cleanly.
        return enc.apply(
            vars_, video_local, training=training, slice_time=False,
            rngs=_shard_rngs(rngs, data_axis),
        )

    da = data_axis
    pyramid = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(da, None, axis_name)),  # [B, H, T, W, C]
        out_specs=P(da, axis_name),              # [B, T, h, w, c]
        check_vma=False,
    )(variables, video)
    return [lvl[:, tc - 1 :] for lvl in pyramid]


def time_sharded_decode(
    decoder,
    variables,
    pyramid: Sequence[jnp.ndarray],
    z: jnp.ndarray,
    mesh: Mesh,
    *,
    training: bool = True,
    axis_name: str = SEQ_AXIS,
    data_axis: str | None = None,
    rngs=None,
) -> jnp.ndarray:
    """Run ``VideoDecoder`` with the time axis sharded over ``axis_name``
    (and the batch dim over ``data_axis`` on a 2-D data x seq mesh).

    ``pyramid`` is the encoder's (global) 5-level output; the teacher-
    forcing slice ``[:, :-1]`` (or inference ``[:, -1:]``) is applied
    here, outside shard_map, then the decoder consumes pre-sliced skips
    on local time chunks.  ``z.shape[1]`` must equal the sliced skip
    length and be divisible by the mesh axis size.

    Returns fake frames ``[B, H, T_z, W, C]`` (film-strip), time-sharded.
    """
    dec = decoder.clone(seq_axis=axis_name)
    sliced = [
        (lvl[:, :-1] if training else lvl[:, -1:]) for lvl in pyramid
    ]

    def body(vars_, pyr_local, z_local):
        # vars_ explicit for the same AD reason as time_sharded_encode.
        return dec.apply(
            vars_, pyr_local, z_local, training=training, pre_sliced=True,
            rngs=_shard_rngs(rngs, data_axis),
        )

    da = data_axis
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(da, axis_name), P(da, axis_name)),
        out_specs=P(da, None, axis_name),  # film-strip [B, H, T, W, C]
        check_vma=False,
    )(variables, sliced, z)
