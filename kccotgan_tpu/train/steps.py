"""Jitted GAN training step: discriminator phase then generator phase.

Re-derivation of `/root/reference/kernel_train.py:219-292` as ONE
compiled XLA program per iteration (the reference runs eager TF with
both ``@tf.function`` decorators commented out — `kernel_train.py:218,
258`).  Faithful semantics:

* disc phase: fresh z, full generator forward (teacher forcing),
  optional kernel smoothing of real+fake, both discriminators on both,
  mixed Sinkhorn loss, martingale penalty on ``m_real`` only;
  ``disc_loss = -sinkhorn + pM``; h and m updated by Adam with the
  double-apply schedule cadence (quirk ledger #8).
* gen phase: NEW z, full forward against the *updated* discriminators;
  ``gen_loss = sinkhorn``; encoder+decoder updated.
* Each phase re-runs the forward (quirk ledger #9) — 6 Sinkhorn solves
  per iteration, exactly like the reference.

TPU-first details: the whole two-phase step jits into a single XLA
program; state buffers are donated; smoothing/solver/cost choices are
static config.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..ot import compute_sinkhorn_loss, martingale_regularization
from ..smoothing import annealing_sigma, apply_smoothing
from .state import GanModules, TrainState, make_optimizers

__all__ = ["build_train_step", "gan_forward"]


def gan_forward(
    mods: GanModules,
    cfg: TrainConfig,
    enc_params,
    dec_params,
    h_params,
    m_params,
    h_stats,
    m_stats,
    real_data: jnp.ndarray,
    z: jnp.ndarray,
    sigma,
    dropout_rng: jax.Array | None = None,
    encode: Callable | None = None,
    decode: Callable | None = None,
    constrain_loss_inputs: Callable | None = None,
    pyramid=None,
    real_smoothed=None,
):
    """One full forward pass: encode, decode (teacher forcing), smooth,
    discriminate, mixed Sinkhorn + pM.  Returns (loss, pm, new_stats).

    ``dropout_rng`` seeds the Keras-style (rnn_)dropout masks in the
    encoder/decoder ConvLSTM stacks (`/root/reference/gan.py:40-41,
    57-62` via `kernel_train.py:393-395`); required when
    ``cfg.model.dropout>0`` or ``cfg.model.rnn_dropout>0``.

    ``encode(params, video, rngs) -> pyramid`` / ``decode(params,
    pyramid, z, rngs) -> frames`` override the generator forwards —
    the hook the sequence-parallel train step uses to route them
    through the ring-relay time-sharded wrappers (parallel/seqtrain.py)
    while everything else (smoothing, discriminators, loss) stays
    shared.

    ``pyramid`` supplies a precomputed context encoding, skipping the
    encoder forward entirely (``enc_params`` is then unused) — the
    share-context-encoding fast path computes it once per STEP and
    feeds both GAN phases (see ``build_train_step``).
    """
    tc = cfg.int_time_steps
    real_in = real_data[:, :, :tc]

    if dropout_rng is not None:
        k_enc_d, k_dec_d = jax.random.split(dropout_rng)
        enc_rngs = {"dropout": k_enc_d}
        dec_rngs = {"dropout": k_dec_d}
    else:
        enc_rngs = dec_rngs = None

    if pyramid is not None:
        pass
    elif encode is None:
        pyramid = mods.encoder.apply(
            {"params": enc_params}, real_data, training=True, rngs=enc_rngs
        )
    else:
        pyramid = encode(enc_params, real_data, enc_rngs)
    if decode is None:
        fake_pred = mods.decoder.apply(
            {"params": dec_params}, pyramid, z, training=True, rngs=dec_rngs
        )
    else:
        fake_pred = decode(dec_params, pyramid, z, dec_rngs)
    fake = jnp.concatenate([real_in, fake_pred], axis=2)

    if real_smoothed is not None:
        real_s = real_smoothed
    else:
        real_s = apply_smoothing(
            real_data, sigma, cfg.kernel,
            temporal_kernel=cfg.temporal_kernel_size,
            spatial_kernel=cfg.spatial_kernel_size,
        )
    fake_s = apply_smoothing(
        fake, sigma, cfg.kernel,
        temporal_kernel=cfg.temporal_kernel_size,
        spatial_kernel=cfg.spatial_kernel_size,
    )

    def disc_apply(module, params, stats, x):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        out, updates = module.apply(
            variables, x, training=True, mutable=["batch_stats"]
        )
        return out, updates.get("batch_stats", stats)

    if cfg.fused_discriminators:
        # ONE vmapped pass for all 4 discriminator evaluations (h/m x
        # fake/real): 4x fewer scan/conv launches at 4x batch.  Exact
        # w.r.t. the sequential reference order (`kernel_train.py:
        # 241-245`): training-mode BatchNorm normalizes each vmapped
        # instance by its own batch, identical to separate calls; the
        # running-stat CHAIN (h: fake then real; m: real then fake) is
        # reconstructed below from the two independent single-call
        # updates:  seq = mu*s_first + s_second - mu*old
        # (since s_i = mu*old + (1-mu)*batch_i).
        stacked_params = jax.tree_util.tree_map(
            lambda hp, mp: jnp.stack([hp, hp, mp, mp]), h_params, m_params
        )
        stacked_x = jnp.stack([fake_s, real_s, real_s, fake_s])
        if h_stats:
            stacked_stats = jax.tree_util.tree_map(
                lambda hs, ms: jnp.stack([hs, hs, ms, ms]), h_stats, m_stats
            )

            def one(p, s, x):
                return mods.disc_h.apply(
                    {"params": p, "batch_stats": s}, x,
                    training=True, mutable=["batch_stats"],
                )

            outs, upd = jax.vmap(one)(stacked_params, stacked_stats, stacked_x)
            new = upd["batch_stats"]
            from ..models.video import _BN_MOMENTUM as mu

            def chain(old, first, second):
                return mu * first + second - mu * old

            h_stats = jax.tree_util.tree_map(
                lambda old, n: chain(old, n[0], n[1]), h_stats, new
            )
            m_stats = jax.tree_util.tree_map(
                lambda old, n: chain(old, n[2], n[3]), m_stats, new
            )
        else:

            def one(p, x):
                out, _ = mods.disc_h.apply(
                    {"params": p}, x, training=True, mutable=["batch_stats"]
                )
                return out

            outs = jax.vmap(one)(stacked_params, stacked_x)
        h_fake, h_real, m_real, m_fake = outs[0], outs[1], outs[2], outs[3]
    else:
        # Sequential reference order (`kernel_train.py:241-245`):
        # h(fake), h(real), then m(real), m(fake) — running BN stats
        # chain through each call.
        h_fake, h_stats = disc_apply(mods.disc_h, h_params, h_stats, fake_s)
        h_real, h_stats = disc_apply(mods.disc_h, h_params, h_stats, real_s)
        m_real, m_stats = disc_apply(mods.disc_m, m_params, m_stats, real_s)
        m_fake, m_stats = disc_apply(mods.disc_m, m_params, m_stats, fake_s)

    if constrain_loss_inputs is not None:
        # Sharding hint for the mesh-parallel paths: pin the loss
        # inputs (smoothed videos + all four discriminator feature
        # stacks) to an explicit sharding — the seq-parallel train step
        # replicates them here, so the [B, B] Sinkhorn cost Grams below
        # compile to plain local matmuls fed by feature all-gathers
        # instead of GSPMD-chosen permute-resharded distributed dots.
        # Semantically a no-op; see parallel/seqtrain.py for why the
        # permute-free form matters (XLA:CPU rendezvous).
        real_s, fake_s, h_fake, m_real, h_real, m_fake = (
            constrain_loss_inputs(
                (real_s, fake_s, h_fake, m_real, h_real, m_fake)
            )
        )

    scaling = cfg.effective_scaling
    loss = compute_sinkhorn_loss(
        real_s, fake_s, scaling, h_fake, m_real, h_real, m_fake,
        video=True,
        epsilon=cfg.sinkhorn_eps,
        num_iters=cfg.sinkhorn_l,
        cost_method=cfg.cost_method,
        solver=cfg.sinkhorn_solver,
    )
    pm = martingale_regularization(m_real, cfg.reg_penalty, scaling)
    return loss, pm, h_stats, m_stats


def build_train_step(
    cfg: TrainConfig,
    mods: GanModules,
    *,
    jit: bool = True,
    donate: bool | None = None,
    axis_name: str | None = None,
    encode: Callable | None = None,
    decode: Callable | None = None,
    constrain_loss_inputs: Callable | None = None,
) -> Callable[[TrainState, jnp.ndarray], tuple[TrainState, dict[str, jnp.ndarray]]]:
    """Returns ``train_step(state, real_data) -> (state, metrics)``.

    ``real_data`` is the film-strip batch ``[B, H, T, W, C]`` (context +
    future along axis 2).

    ``axis_name`` enables the per-shard data-parallel mode (used under
    ``shard_map``): the batch is a local shard, the Sinkhorn divergence
    and pM are computed per device and gradients/metrics/BN-stats are
    ``pmean``-reduced over the mesh axis.  This changes the objective's
    semantics (mean of per-shard divergences instead of the global-batch
    divergence) — the exact global mode goes through GSPMD instead (see
    ``parallel.build_sharded_train_step``).
    """
    opts = make_optimizers(cfg)
    z_time = cfg.pred_time_steps

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    # Dropout masks need a PRNG stream; the split count is gated so the
    # default (dropout=0) path draws the exact same z keys as before.
    needs_dropout = cfg.model.dropout > 0.0 or cfg.model.rnn_dropout > 0.0

    def train_step(state: TrainState, real_data: jnp.ndarray):
        if needs_dropout:
            rng, k_disc, k_gen, kd_disc, kd_gen = jax.random.split(state.rng, 5)
        else:
            rng, k_disc, k_gen = jax.random.split(state.rng, 3)
            kd_disc = kd_gen = None
        if axis_name is not None:
            # independent z per device shard
            idx = jax.lax.axis_index(axis_name)
            k_disc = jax.random.fold_in(k_disc, idx)
            k_gen = jax.random.fold_in(k_gen, idx)
            if needs_dropout:
                # independent dropout masks per shard (per-sample masks)
                kd_disc = jax.random.fold_in(kd_disc, idx)
                kd_gen = jax.random.fold_in(kd_gen, idx)
        z_shape = mods.z_shape(real_data.shape[0], z_time)

        if cfg.decaying_sigma:
            # step is 1-based in the reference loop (`kernel_train.py:300`)
            sigma = annealing_sigma(cfg.init_sigma, state.step + 1)
        else:
            sigma = jnp.asarray(cfg.init_sigma, jnp.float32)

        # Context encoding, shared across both phases: the pyramid is
        # z-independent and enc/dec params only update at the END of
        # the gen phase, so (dropout off) the disc- and gen-phase
        # encoder forwards are the same computation.  Encode ONCE via
        # jax.vjp — the disc phase consumes the value as a constant
        # (it never differentiates the generator) and the gen phase
        # chains its pyramid cotangent through `enc_vjp`.  Exact; the
        # reference's per-phase re-forward (quirk #9) is preserved for
        # everything z-dependent (decoder, discriminators, loss).
        share_ctx = (
            cfg.share_context_encoding and not needs_dropout and encode is None
        )
        if share_ctx:
            pyramid, enc_vjp = jax.vjp(
                lambda p: mods.encoder.apply(
                    {"params": p}, real_data, training=True
                ),
                state.enc_params,
            )
            # The smoothed REAL video is param- and z-free: identical
            # in both phases, so compute it once too.
            real_s1 = apply_smoothing(
                real_data, sigma, cfg.kernel,
                temporal_kernel=cfg.temporal_kernel_size,
                spatial_kernel=cfg.spatial_kernel_size,
            )
        else:
            pyramid = enc_vjp = real_s1 = None

        # ---------------- discriminator phase -----------------
        z1 = jax.random.normal(k_disc, z_shape, jnp.float32)

        def disc_loss_fn(h_params, m_params):
            loss, pm, h_stats, m_stats = gan_forward(
                mods, cfg, state.enc_params, state.dec_params,
                h_params, m_params, state.h_stats, state.m_stats,
                real_data, z1, sigma, dropout_rng=kd_disc,
                encode=encode, decode=decode,
                constrain_loss_inputs=constrain_loss_inputs,
                pyramid=pyramid, real_smoothed=real_s1,
            )
            return -loss + pm, (loss, pm, h_stats, m_stats)

        (_, (_, pm, h_stats, m_stats)), (gh, gm) = jax.value_and_grad(
            disc_loss_fn, argnums=(0, 1), has_aux=True
        )(state.h_params, state.m_params)
        gh, gm, pm = pmean(gh), pmean(gm), pmean(pm)
        h_stats, m_stats = pmean(h_stats), pmean(m_stats)

        h_updates, h_opt = opts["h"].update(gh, state.h_opt, state.h_params)
        h_params = optax.apply_updates(state.h_params, h_updates)
        m_updates, m_opt = opts["m"].update(gm, state.m_opt, state.m_params)
        m_params = optax.apply_updates(state.m_params, m_updates)

        # ---------------- generator phase -----------------
        z2 = jax.random.normal(k_gen, z_shape, jnp.float32)

        if share_ctx:

            def gen_loss_fn(pyr, dec_params):
                loss, _, hs, ms = gan_forward(
                    mods, cfg, state.enc_params, dec_params,
                    h_params, m_params, h_stats, m_stats,
                    real_data, z2, sigma,
                    decode=decode,
                    constrain_loss_inputs=constrain_loss_inputs,
                    pyramid=pyr, real_smoothed=real_s1,
                )
                return loss, (hs, ms)

            (gen_loss, (h_stats, m_stats)), (g_pyr, gd) = jax.value_and_grad(
                gen_loss_fn, argnums=(0, 1), has_aux=True
            )(pyramid, state.dec_params)
            (ge,) = enc_vjp(g_pyr)
        else:

            def gen_loss_fn(enc_params, dec_params):
                loss, _, hs, ms = gan_forward(
                    mods, cfg, enc_params, dec_params,
                    h_params, m_params, h_stats, m_stats,
                    real_data, z2, sigma, dropout_rng=kd_gen,
                    encode=encode, decode=decode,
                    constrain_loss_inputs=constrain_loss_inputs,
                )
                return loss, (hs, ms)

            (gen_loss, (h_stats, m_stats)), (ge, gd) = jax.value_and_grad(
                gen_loss_fn, argnums=(0, 1), has_aux=True
            )(state.enc_params, state.dec_params)
        ge, gd, gen_loss = pmean(ge), pmean(gd), pmean(gen_loss)
        h_stats, m_stats = pmean(h_stats), pmean(m_stats)

        enc_updates, enc_opt = opts["enc"].update(ge, state.enc_opt, state.enc_params)
        enc_params = optax.apply_updates(state.enc_params, enc_updates)
        dec_updates, dec_opt = opts["dec"].update(gd, state.dec_opt, state.dec_params)
        dec_params = optax.apply_updates(state.dec_params, dec_updates)

        new_state = TrainState(
            step=state.step + 1,
            rng=rng,
            enc_params=enc_params,
            dec_params=dec_params,
            h_params=h_params,
            m_params=m_params,
            h_stats=h_stats,
            m_stats=m_stats,
            enc_opt=enc_opt,
            dec_opt=dec_opt,
            h_opt=h_opt,
            m_opt=m_opt,
        )
        metrics = {"sinkhorn_loss": gen_loss, "pm": pm, "sigma": sigma}
        return new_state, metrics

    if jit:
        donate = cfg.donate_buffers if donate is None else donate
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return train_step
