"""Train state: the four module variable trees, four Adam states, step,
and RNG key — the complete checkpointable unit.

Fixes the reference's checkpoint defects (optimizer state and step never
saved; resume crashes — `kernel_train.py:156-165,331-338`, quirk #4).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models import VideoDecoder, VideoDiscriminator, VideoEncoder
from .schedule import warmup_staircase_exponential_decay

__all__ = ["GanModules", "TrainState", "create_train_state", "make_optimizers"]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    rng: jax.Array
    enc_params: Any
    dec_params: Any
    h_params: Any
    m_params: Any
    h_stats: Any  # BatchNorm running stats (empty dict when bn off)
    m_stats: Any
    enc_opt: Any
    dec_opt: Any
    h_opt: Any
    m_opt: Any


class GanModules:
    """Constructs the four flax modules from config (shapes mirror
    `kernel_train.py:141-154`)."""

    def __init__(self, cfg: TrainConfig):
        m = cfg.model
        self.cfg = cfg
        kernel_impl = cfg.kernel_impl
        if kernel_impl == "auto":
            # Measured on TPU v5e-1 (PARITY.md "ConvLSTM recurrence
            # engine"): the fused Pallas recurrence loses end-to-end,
            # 236.6 vs 160.8 ms/step — XLA's scan + native conv emitter
            # is the faster TPU program at every flagship layer shape.
            # 'auto' therefore resolves to the measured winner on every
            # backend; 'pallas' stays available as an explicit opt-in.
            kernel_impl = "scan"
        self.kernel_impl = kernel_impl
        # Generator layout (cfg.time_major): the training step uses the
        # transpose-free time-major stack; rollout and the seq-parallel
        # wrappers construct batch-major twins via `generator_modules`
        # (the flax param trees are layout-independent, so one set of
        # params serves both).
        self.encoder, self.decoder = self.generator_modules(cfg.time_major)
        disc_kwargs = dict(
            state_size=m.d_state_size,
            filter_size=m.d_filter_size,
            use_batch_norm=m.use_norm,
            compute_dtype=cfg.compute_dtype,
            scan_remat=cfg.scan_remat,
            scan_remat_policy=cfg.scan_remat_policy,
            scan_unroll=cfg.scan_unroll,
            kernel_impl=kernel_impl,
        )
        self.disc_h = VideoDiscriminator(**disc_kwargs)
        self.disc_m = VideoDiscriminator(**disc_kwargs)

    def generator_modules(self, time_major: bool):
        """(encoder, decoder) pair in the requested layout — identical
        param trees either way."""
        cfg, m = self.cfg, self.cfg.model
        encoder = VideoEncoder(
            int_time_steps=cfg.int_time_steps,
            filter_size=m.g_filter_size,
            use_norm=m.use_norm,
            dropout=m.dropout,
            rnn_dropout=m.rnn_dropout,
            compute_dtype=cfg.compute_dtype,
            scan_remat=cfg.scan_remat,
            scan_remat_policy=cfg.scan_remat_policy,
            scan_unroll=cfg.scan_unroll,
            conv_packing=cfg.conv_packing,
            kernel_impl=self.kernel_impl,
            time_major=time_major,
        )
        decoder = VideoDecoder(
            x_height=m.x_height,
            x_width=m.x_width,
            nchannel=m.n_channels,
            filter_size=m.g_filter_size,
            use_norm=m.use_norm,
            dropout=m.dropout,
            rnn_dropout=m.rnn_dropout,
            output_activation=m.output_activation,
            compute_dtype=cfg.compute_dtype,
            scan_remat=cfg.scan_remat,
            scan_remat_policy=cfg.scan_remat_policy,
            scan_unroll=cfg.scan_unroll,
            conv_packing=cfg.conv_packing,
            kernel_impl=self.kernel_impl,
            time_major=time_major,
        )
        return encoder, decoder

    def z_shape(self, batch_size: int, time_steps: int) -> tuple:
        m = self.cfg.model
        return (batch_size, time_steps, m.z_height, m.z_width, m.z_channels)


def make_optimizers(cfg: TrainConfig):
    """Four Keras-3-exact Adam optimizers (eps 1e-7, Keras update rule
    and bias-correction cadence — see ``keras_adam``) on the warmup +
    staircase-decay schedule; offsets reproduce the reference's
    shared-optimizer double-apply cadence when
    ``keras_double_step_quirk`` (LR *and* bias-correction powers both
    advance 2x per train iteration, exactly like the two
    ``apply_gradients`` calls at `kernel_train.py:254-255,290-291`)."""
    from .keras_adam import keras_adam

    def adam(offset: int) -> optax.GradientTransformation:
        # RAW Keras-step schedule: keras_adam maps its per-group update
        # count to the shared Keras iteration (2n + offset) itself, so
        # the schedule and the bias-correction powers stay in lockstep.
        sched = warmup_staircase_exponential_decay(
            cfg.lr,
            cfg.warmup_steps,
            cfg.decay_steps,
            cfg.decay_rate,
        )
        return keras_adam(
            sched, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps,
            double_step=cfg.keras_double_step_quirk, offset=offset,
        )

    # First apply in each Keras-optimizer pair gets offset 0, second 1:
    # disc: h then m (`kernel_train.py:254-255`); gen: enc then dec (:290-291).
    return dict(enc=adam(0), dec=adam(1), h=adam(0), m=adam(1))


def create_train_state(cfg: TrainConfig, rng: jax.Array) -> TrainState:
    mods = GanModules(cfg)
    m = cfg.model
    b, t = cfg.batch_size, cfg.total_time_steps
    dummy_video = jnp.zeros((b, m.x_height, t, m.x_width, m.n_channels), jnp.float32)
    k_enc, k_dec, k_h, k_m, k_state = jax.random.split(rng, 5)
    # Dropout-mask keys for the training=True traces below (needed when
    # cfg.model.(rnn_)dropout > 0; no-ops otherwise).  Derived by fold_in
    # so the 5-way split above — and thus all param init values — stays
    # identical to dropout-free configs.
    kd_enc, kd_dec = jax.random.split(jax.random.fold_in(rng, 0xD0))

    enc_vars = mods.encoder.init(k_enc, dummy_video, training=False)
    pyramid = mods.encoder.apply(
        enc_vars, dummy_video, training=True, rngs={"dropout": kd_enc}
    )
    z = jnp.zeros(mods.z_shape(b, cfg.pred_time_steps), jnp.float32)
    dec_vars = mods.decoder.init(
        {"params": k_dec, "dropout": kd_dec}, pyramid, z, training=True
    )
    h_vars = mods.disc_h.init(k_h, dummy_video, training=False)
    m_vars = mods.disc_m.init(k_m, dummy_video, training=False)

    opts = make_optimizers(cfg)
    enc_p, dec_p = enc_vars["params"], dec_vars["params"]
    h_p, m_p = h_vars["params"], m_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        enc_params=enc_p,
        dec_params=dec_p,
        h_params=h_p,
        m_params=m_p,
        h_stats=h_vars.get("batch_stats", {}),
        m_stats=m_vars.get("batch_stats", {}),
        enc_opt=opts["enc"].init(enc_p),
        dec_opt=opts["dec"].init(dec_p),
        h_opt=opts["h"].init(h_p),
        m_opt=opts["m"].init(m_p),
    )
