"""Autoregressive rollout sampling (conditional video prediction).

The reference re-encodes the ENTIRE growing sequence for every
generated frame — O(T^2) encoder work per rollout
(`kernel_train.py:339-356`).  TPU-native redesign: the encoder's
ConvLSTM carries (h, c) are threaded through a single ``lax.scan`` over
the prediction horizon, so the whole rollout compiles to ONE XLA
program with O(T) work.  Incremental encoding is mathematically exact
(ConvLSTM is causal, Markov in its carry), so generated distributions
match the reference's procedure with the same weights.

The reference also hardcodes ``z_channels=128`` at eval
(`kernel_train.py:348`, quirk ledger #5); here the config value is used.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from .state import GanModules, TrainState

__all__ = ["build_rollout"]


def build_rollout(cfg: TrainConfig, mods: GanModules, *, jit: bool = True) -> Callable:
    """Returns ``rollout(state, context, rng, num_steps=pred) -> video``.

    ``context``: film-strip ``[B, H, Tc, W, C]``.  Returns the full
    predicted film-strip ``[B, H, Tc + num_steps, W, C]``.
    """
    num_steps = cfg.pred_time_steps
    m = cfg.model
    # Rollout always runs the batch-major generator modules (the
    # incremental-carry slicing below is batch-major); when the
    # TRAINING step uses cfg.time_major these are layout twins over
    # the same param trees.
    encoder, decoder = mods.generator_modules(time_major=False)

    def rollout(state: TrainState, context: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        enc_v = {"params": state.enc_params}
        dec_v = {"params": state.dec_params}

        # Encode the context once, keeping ConvLSTM carries.
        pyramid, carry = encoder.apply(
            enc_v, context, training=False, return_carry=True
        )
        # Inference decode uses only the LAST frame's features (`gan.py:272`).
        feats = [p[:, -1:] for p in pyramid]

        b = context.shape[0]
        z_shape = (b, 1, m.z_height, m.z_width, m.z_channels)

        def step(scan_carry, key):
            feats, carry = scan_carry
            z = jax.random.normal(key, z_shape, jnp.float32)
            frame = decoder.apply(dec_v, feats, z, training=False)
            # frame: [B, H, 1, W, C] film-strip; extend the encoding by it.
            new_pyr, new_carry = encoder.apply(
                enc_v,
                frame,
                training=False,
                carry=carry,
                return_carry=True,
                slice_time=False,
            )
            new_feats = [p[:, -1:] for p in new_pyr]
            return (new_feats, new_carry), frame[:, :, 0]

        keys = jax.random.split(rng, num_steps)
        _, frames = jax.lax.scan(step, (feats, carry), keys)
        # frames: [T_pred, B, H, W, C] -> film-strip [B, H, T_pred, W, C]
        pred = jnp.transpose(frames, (1, 2, 0, 3, 4))
        return jnp.concatenate([context, pred], axis=2)

    return jax.jit(rollout) if jit else rollout
