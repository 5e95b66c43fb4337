"""KCCOT-GAN model family: ConvLSTM context encoder, U-Net ConvLSTM
decoder, and the per-frame CNN + LSTM video discriminator.

Architecture re-derivation of `/root/reference/gan.py` as flax modules
over the TPU-first layers in ``layers.py``:

* ``VideoEncoder`` — 4-layer ConvLSTM pyramid (filters f*4..f*32,
  kernels 6,6,5,5, all stride 2), tanh, no bias, optional LayerNorm
  (eps 1e-3), returning the raw input + all four feature maps, each
  time-sliced ``[:, int_time_steps-1:]`` (`gan.py:87-110`).  ConvLSTM is
  unidirectional, so features at t depend only on frames <= t.

* ``VideoDecoder`` — U-Net-style: concat bottleneck features with noise
  z, alternate per-frame ConvTranspose upsampling with stride-1
  ConvLSTMs, concatenating the matching encoder skip level before each
  ConvLSTM (`gan.py:268-361`).  Teacher forcing: training consumes skip
  frames ``[:, :-1]``; inference only the last frame's features
  (`gan.py:270-272`).  The reference's clockwork-RNN scaffolding
  (`gan.py:147-153`) is vestigial (computed, never used) and dropped.

* ``VideoDiscriminator`` — per-frame CNN (3x Conv2D f*4,f*8,f*16, 5x5
  stride 2, optional BatchNorm, LeakyReLU 0.3) then a 3-layer LSTM
  stack ending in ``state_size`` sigmoid units -> ``[B, T, J]``
  (`gan.py:367-429`).  Unlike the reference (which bakes the
  constructor H/W into a reshape and crashes on spatially-smoothed
  inputs), spatial dims are inferred from the input.

Note: the reference wires L2 regularizers into every layer when
``reg=True`` but never adds ``model.losses`` to the objective under
GradientTape — they are dead code (`kernel_train.py:247-292`).  We keep
a ``l2_reg`` knob at the trainer level instead (off by default).

All modules speak the film-strip layout ``[B, H, T, W, C]`` at their
boundaries (quirk ledger #7) and transpose internally.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    LSTM,
    Conv2D,
    ConvLSTM2D,
    ConvTranspose2D,
    leaky_relu,
    resolve_remat_policy,
)

__all__ = ["VideoEncoder", "VideoDecoder", "VideoDiscriminator"]

_LN_EPS = 1e-3  # Keras LayerNormalization default
_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


class VideoEncoder(nn.Module):
    """ConvLSTM feature-pyramid context encoder.

    Input ``[B, H, T, W, C]`` film-strip video; returns a 5-level
    pyramid (raw input + 4 ConvLSTM outputs), each ``[B, T', h, w, c]``
    with ``T' = T - int_time_steps + 1`` in ``[B, T, H, W, C]`` order.
    """

    int_time_steps: int
    filter_size: int = 8
    use_norm: bool = False  # `bn` flag -> LayerNorm here (`gan.py:92-108`)
    dropout: float = 0.0
    rnn_dropout: float = 0.0
    compute_dtype: str = "float32"
    scan_remat: bool = False
    scan_remat_policy: str = "carry_only"
    scan_unroll: int = 1
    # Sequence parallelism (SURVEY.md §2.9): when set, this encoder must
    # be applied inside shard_map with the video's TIME axis sharded
    # over this mesh axis and ``slice_time=False`` (the [:, Tc-1:]
    # pyramid slice is a global-time op — the parallel.time_sharded_
    # encode wrapper performs it outside the shard_map region).
    seq_axis: str | None = None
    # 'auto': space-to-depth MXU-lane packing on eligible stride-1
    # small-filter ConvLSTMs (models/conv_packing.py); 'off' = exact
    # bit-replication mode.  Encoder layers are stride-2 so this is
    # currently a no-op here; threaded for config uniformity.
    conv_packing: str = "off"
    # Recurrence engine per ConvLSTM: 'scan' (lax.scan oracle) or
    # 'pallas' (fused single-kernel recurrence, models/pallas_convlstm.py;
    # falls back to scan per-layer where unsupported).
    kernel_impl: str = "scan"
    # Time-major internal layout: ONE transpose of the input video into
    # [T, B, H, W, C] and the whole pyramid stays time-major ([T', B,
    # h, w, c] levels) — every ConvLSTM's hoisted-conv fold and scan
    # then run transpose-free (see layers.ConvLSTM2D.time_major).
    # Bit-exact forward; pair with a time-major VideoDecoder.
    time_major: bool = False

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,
        *,
        training: bool = True,
        carry=None,
        return_carry: bool = False,
        slice_time: bool = True,
    ):
        """Encode a (sub)sequence.

        ``carry``/``return_carry`` expose the ConvLSTM (h, c) states so
        autoregressive rollout can extend the encoding one frame at a
        time in O(T) instead of the reference's O(T^2) full re-encode
        per generated frame (`kernel_train.py:346-350`).  Incremental
        encoding is exact: ConvLSTM is causal and Markov in (h, c).
        ``slice_time=False`` skips the ``[:, Tc-1:]`` pyramid slicing
        (used by rollout, which encodes single frames).
        """
        if self.time_major:
            x = jnp.transpose(video, (2, 0, 1, 3, 4))  # -> [T, B, H, W, C]

            def tslice(seq, tc):
                return seq[tc - 1 :]
        else:
            x = jnp.transpose(video, (0, 2, 1, 3, 4))  # -> [B, T, H, W, C]

            def tslice(seq, tc):
                return seq[:, tc - 1 :]

        tc = self.int_time_steps if slice_time else 1
        f = self.filter_size
        specs = [(f * 4, 6), (f * 8, 6), (f * 16, 5), (f * 32, 5)]
        pyramid = [tslice(x, tc)]
        h = x
        new_carry = []
        for i, (filters, k) in enumerate(specs):
            h, state = ConvLSTM2D(
                filters=filters,
                kernel_size=(k, k),
                strides=(2, 2),
                use_bias=False,
                dropout=self.dropout,
                recurrent_dropout=self.rnn_dropout,
                compute_dtype=self.compute_dtype,
                remat=self.scan_remat,
                remat_policy=resolve_remat_policy(
                    self.scan_remat_policy, f"encoder{i + 1}"
                ),
                unroll=self.scan_unroll,
                seq_axis=self.seq_axis,
                conv_packing=self.conv_packing,
                kernel_impl=self.kernel_impl,
                time_major=self.time_major,
                name=f"encoder{i + 1}",
            )(
                h,
                training=training,
                initial_state=None if carry is None else carry[i],
                return_state=True,
            )
            new_carry.append(state)
            if self.use_norm:
                h = nn.LayerNorm(epsilon=_LN_EPS, name=f"norm{i + 1}")(h)
            pyramid.append(tslice(h, tc))
        if return_carry:
            return pyramid, tuple(new_carry)
        return pyramid


def _decoder_geometry(x_height: int, x_width: int):
    """(kernel, stride) tables per aspect ratio (`gan.py:160-189`)."""
    if x_height == x_width:
        return dict(k1=(2, 2), s1=(2, 2), k2=(4, 4), s2=(2, 2), k3=(6, 6), s3=(2, 2))
    if x_height < x_width:
        return dict(k1=(6, 7), s1=(2, 2), k2=(6, 7), s2=(2, 2), k3=(6, 7), s3=(2, 2))
    return dict(k1=(7, 6), s1=(3, 2), k2=(7, 6), s2=(3, 2), k3=(7, 6), s3=(3, 2))


class VideoDecoder(nn.Module):
    """U-Net ConvLSTM decoder / generator.

    Args to ``__call__``:
      pyramid: the encoder's 5-level output.
      z: noise ``[B, T_z, h4, w4, z_channels]`` at the bottleneck
        resolution.  Training requires ``T_z == pyramid_time - 1``
        (teacher forcing consumes ``[:, :-1]``); inference requires the
        single-last-frame path, any ``T_z == 1``.

    Returns fake frames ``[B, H, T_z, W, nchannel]`` (film-strip order).
    """

    x_height: int
    x_width: int
    nchannel: int = 1
    filter_size: int = 8
    use_norm: bool = False
    dropout: float = 0.0
    rnn_dropout: float = 0.0
    output_activation: str = "sigmoid"
    compute_dtype: str = "float32"
    scan_remat: bool = False
    scan_remat_policy: str = "carry_only"
    scan_unroll: int = 1
    # Sequence parallelism: same contract as VideoEncoder.seq_axis; use
    # with ``pre_sliced=True`` (teacher-forcing [:, :-1] is a global-
    # time slice, done outside shard_map by parallel.time_sharded_decode).
    seq_axis: str | None = None
    # 'auto': space-to-depth MXU-lane packing on the stride-1
    # small-filter ConvLSTMs — at default g_state_size=8 that is
    # decoder5, the full-resolution 8x8-kernel layer whose 4f=32 gate
    # channels otherwise use 32 of 128 MXU lanes (conv_packing.py).
    conv_packing: str = "off"
    # Recurrence engine per ConvLSTM (see VideoEncoder.kernel_impl).
    kernel_impl: str = "scan"
    # Time-major internal layout: consumes a TIME-MAJOR pyramid (from a
    # time-major VideoEncoder), runs the whole U-Net stack on [T, B,
    # ...] tensors — transpose-free ConvLSTM folds/scans — and returns
    # the same film-strip output (one transpose of z in, one of the
    # generated frames out).  Bit-exact forward.
    time_major: bool = False

    @nn.compact
    def __call__(
        self,
        pyramid: Sequence[jnp.ndarray],
        z: jnp.ndarray,
        *,
        training: bool = True,
        pre_sliced: bool = False,
    ) -> jnp.ndarray:
        f = self.filter_size
        g = _decoder_geometry(self.x_height, self.x_width)
        b, t_z = z.shape[0], z.shape[1]
        tm = self.time_major
        if tm:
            z = jnp.transpose(z, (1, 0, 2, 3, 4))  # [T_z, B, h4, w4, zc]

        def skip(level: int) -> jnp.ndarray:
            feats = pyramid[level]
            if pre_sliced:
                return feats
            if tm:
                return feats[:-1] if training else feats[-1:]
            return feats[:, :-1] if training else feats[:, -1:]

        def fold(seq):  # [(B,T)|(T,B), h, w, c] -> [B*T, h, w, c]
            return seq.reshape((b * t_z,) + seq.shape[2:])

        def unfold(frames):  # [B*T, h, w, c] -> [(B,T)|(T,B), h, w, c]
            lead = (t_z, b) if tm else (b, t_z)
            return frames.reshape(lead + frames.shape[1:])

        def maybe_norm(x, name):
            return nn.LayerNorm(epsilon=_LN_EPS, name=name)(x) if self.use_norm else x

        # Bottleneck: concat deepest skip with z, upsample per-frame.
        h = jnp.concatenate([skip(4), z], axis=-1)
        h = ConvTranspose2D(
            filters=f * 32, kernel_size=g["k1"], strides=g["s1"],
            use_bias=False, activation="tanh",
            compute_dtype=self.compute_dtype, name="conv_transpose1",
        )(fold(h))
        h = maybe_norm(h, "conv_norm1")

        stages = [
            # (skip level, convlstm filters/kernel/bias, convT filters/kernel/stride)
            (3, (f * 16, (4, 4), False), (f * 16, g["k2"], g["s2"]), "decoder2", "conv_transpose2"),
            (2, (f * 8, (6, 6), False), (f * 8, g["k3"], g["s3"]), "decoder3", "conv_transpose3"),
            (1, (f * 4, (8, 8), True), (f * 2, g["k3"], g["s3"]), "decoder4", "conv_transpose4"),
        ]
        for level, (cf, ck, cbias), (tf_, tk, ts), dec_name, ct_name in stages:
            h = unfold(h)
            h = jnp.concatenate([skip(level), h], axis=-1)
            h = ConvLSTM2D(
                filters=cf, kernel_size=ck, strides=(1, 1), use_bias=cbias,
                dropout=self.dropout, recurrent_dropout=self.rnn_dropout,
                compute_dtype=self.compute_dtype,
                remat=self.scan_remat,
                remat_policy=resolve_remat_policy(
                    self.scan_remat_policy, dec_name
                ),
                unroll=self.scan_unroll,
                seq_axis=self.seq_axis,
                conv_packing=self.conv_packing,
                kernel_impl=self.kernel_impl,
                time_major=tm,
                name=dec_name,
            )(h, training=training)
            h = maybe_norm(h, dec_name + "_norm")
            h = ConvTranspose2D(
                filters=tf_, kernel_size=tk, strides=ts,
                use_bias=False, activation="tanh",
                compute_dtype=self.compute_dtype, name=ct_name,
            )(fold(h))
            h = maybe_norm(h, ct_name + "_norm")

        # Full resolution: last skip + final ConvLSTM + output conv.
        h = unfold(h)
        h = jnp.concatenate([skip(0), h], axis=-1)
        h = ConvLSTM2D(
            filters=f, kernel_size=(8, 8), strides=(1, 1), use_bias=True,
            dropout=self.dropout, recurrent_dropout=self.rnn_dropout,
            compute_dtype=self.compute_dtype,
            remat=self.scan_remat,
            remat_policy=resolve_remat_policy(
                self.scan_remat_policy, "decoder5"
            ),
            unroll=self.scan_unroll,
            seq_axis=self.seq_axis,
            conv_packing=self.conv_packing,
            kernel_impl=self.kernel_impl,
            time_major=tm,
            name="decoder5",
        )(h, training=training)
        h = maybe_norm(h, "decoder5_norm")
        y = ConvTranspose2D(
            filters=self.nchannel, kernel_size=(8, 8), strides=(1, 1),
            use_bias=False, activation=self.output_activation,
            compute_dtype=self.compute_dtype, name="conv_transpose5",
        )(fold(h))
        if tm:
            y = y.reshape(t_z, b, self.x_height, self.x_width, self.nchannel)
            return jnp.transpose(y, (1, 2, 0, 3, 4))  # film-strip
        y = y.reshape(b, t_z, self.x_height, self.x_width, self.nchannel)
        return jnp.transpose(y, (0, 2, 1, 3, 4))  # film-strip [B, H, T, W, C]


class VideoDiscriminator(nn.Module):
    """Per-frame CNN + LSTM discriminator -> ``[B, T, state_size]``."""

    state_size: int = 8
    filter_size: int = 8
    use_batch_norm: bool = False
    compute_dtype: str = "float32"
    scan_remat: bool = False
    scan_remat_policy: str = "carry_only"
    scan_unroll: int = 1
    # Recurrence engine for the LSTM stack (see layers.LSTM.kernel_impl).
    kernel_impl: str = "scan"

    @nn.compact
    def __call__(self, video: jnp.ndarray, *, training: bool = True) -> jnp.ndarray:
        b, h, t, w, c = video.shape
        x = jnp.transpose(video, (0, 2, 1, 3, 4)).reshape(b * t, h, w, c)
        f = self.filter_size
        for i, filters in enumerate((f * 4, f * 8, f * 16)):
            x = Conv2D(
                filters=filters, kernel_size=(5, 5), strides=(2, 2),
                compute_dtype=self.compute_dtype, name=f"conv{i + 1}",
            )(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not training,
                    momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                    name=f"bn{i + 1}",
                )(x)
            x = leaky_relu(x)
        x = x.reshape(b, t, -1)
        x = LSTM(units=f * 8, compute_dtype=self.compute_dtype, remat=self.scan_remat, remat_policy=resolve_remat_policy(self.scan_remat_policy, "lstm1"), unroll=self.scan_unroll, kernel_impl=self.kernel_impl, name="lstm1")(x, training=training)
        if self.use_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=_BN_MOMENTUM, epsilon=_BN_EPS, name="rnn_bn1",
            )(x)
        x = LSTM(units=f * 4, compute_dtype=self.compute_dtype, remat=self.scan_remat, remat_policy=resolve_remat_policy(self.scan_remat_policy, "lstm2"), unroll=self.scan_unroll, kernel_impl=self.kernel_impl, name="lstm2")(x, training=training)
        if self.use_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=_BN_MOMENTUM, epsilon=_BN_EPS, name="rnn_bn2",
            )(x)
        x = LSTM(
            units=self.state_size, activation="sigmoid",
            compute_dtype=self.compute_dtype,
            remat=self.scan_remat,
            remat_policy=resolve_remat_policy(self.scan_remat_policy, "lstm3"),
            unroll=self.scan_unroll,
            kernel_impl=self.kernel_impl, name="lstm3",
        )(x, training=training)
        return x
