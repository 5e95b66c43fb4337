"""MULTI-STEP training-trajectory parity vs the executed reference.

The north star is "reproduce its losses" — not just per-forward, but
across full training iterations where gradients-through-everything,
the shared-optimizer double-apply cadence, and the LR-schedule binding
compose (round-4 VERDICT missing #1).  Two levels:

* ``test_keras_adam_oracle`` pins our ``keras_adam`` against an
  executed shared Keras-3 Adam + WarmUp(ExponentialDecay) on synthetic
  gradients — LR cadence, bias-correction powers (Keras uses
  ``local_step = iterations + 1``, advancing 2x per train iteration
  for a shared optimizer), and the eps-outside-sqrt(v) update rule.

* ``test_training_trajectory_parity`` runs BOTH implementations —
  our jitted two-phase train step vs a faithful driver of the
  reference's ``disc_training_step``/``gen_training_step``
  (`/root/reference/kernel_train.py:219-292`, double apply_gradients
  at `:254-255,290-291`) — from identical ported weights, identical
  injected z draws, and identical data for several full iterations,
  then asserts the per-step (loss, pM) sequences and the final
  parameter trees agree.

Geometry mirrors tests/test_model_parity.py (B=2, T=3+2, 64x64, f=2);
smoothing off, norm off, dropout 0 — those have their own parity
coverage.  Measured trajectory deltas are recorded in PARITY.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.config import ModelConfig, TrainConfig
from kccotgan_tpu.train import GanModules, build_train_step, create_train_state
from kccotgan_tpu.train.state import make_optimizers

pytestmark = pytest.mark.reference_oracle

B, TC, TP = 2, 3, 2
T = TC + TP
HW, C, F, J, ZC = 64, 1, 2, 3, 4
LR, WARMUP, N_STEPS = 5e-4, 4, 3

TRAJ = TrainConfig(
    dname="synthetic",
    batch_size=B,
    total_time_steps=T,
    int_time_steps=TC,
    compute_dtype="float32",
    kernel="none",
    sinkhorn_eps=1.0,   # reference-effective values (quirk #1)
    sinkhorn_l=100,
    lr=LR,
    warmup_steps=WARMUP,  # crosses the warmup boundary within 3 steps
    decay_steps=5000,
    decay_rate=0.975,
    model=ModelConfig(
        x_height=HW, x_width=HW, n_channels=C,
        g_filter_size=F, d_filter_size=F, d_state_size=J,
        z_channels=ZC, z_height=4, z_width=4,
        use_norm=False, dropout=0.0, rnn_dropout=0.0,
    ),
)


def test_keras_adam_oracle():
    """keras_adam (double_step, offsets 0/1) == one executed shared
    Keras-3 Adam applying to two parameter groups per iteration."""
    import tensorflow as tf

    from tests._reference_oracle import load_reference_module
    from kccotgan_tpu.train.keras_adam import keras_adam
    from kccotgan_tpu.train.schedule import (
        warmup_staircase_exponential_decay,
    )

    du = load_reference_module("data_utils")
    rng = np.random.default_rng(7)
    a0 = rng.normal(size=(3, 2)).astype(np.float32)
    b0 = rng.normal(size=(4,)).astype(np.float32)
    # gradients with a wide magnitude range to stress the eps placement
    grads = [
        (rng.normal(size=a0.shape).astype(np.float32) * 10.0 ** rng.integers(-3, 2),
         rng.normal(size=b0.shape).astype(np.float32))
        for _ in range(6)
    ]

    # --- reference: ONE shared Keras Adam, two apply calls per step ---
    lr_sched = tf.keras.optimizers.schedules.ExponentialDecay(
        LR, decay_steps=5, decay_rate=0.975, staircase=True
    )
    warm = du.WarmUp(
        initial_learning_rate=LR, decay_schedule_fn=lr_sched,
        warmup_steps=WARMUP,
    )
    opt = tf.keras.optimizers.Adam(warm, beta_1=0.5, beta_2=0.9)
    va, vb = tf.Variable(a0), tf.Variable(b0)
    # Keras 3 builds slots once; pre-register BOTH groups (Keras-2-era
    # shared optimizers built lazily per apply_gradients call — the
    # iteration/bias-correction cadence is identical either way).
    opt.build([va, vb])
    for ga, gb in grads:
        opt.apply_gradients([(tf.constant(ga), va)])
        opt.apply_gradients([(tf.constant(gb), vb)])

    # --- ours: two keras_adam instances, offsets 0 and 1 ---
    sched = warmup_staircase_exponential_decay(LR, WARMUP, 5, 0.975)
    oa = keras_adam(sched, b1=0.5, b2=0.9, eps=1e-7,
                    double_step=True, offset=0)
    ob = keras_adam(sched, b1=0.5, b2=0.9, eps=1e-7,
                    double_step=True, offset=1)
    pa, pb = jnp.asarray(a0), jnp.asarray(b0)
    sa, sb = oa.init(pa), ob.init(pb)
    import optax

    for ga, gb in grads:
        ua, sa = oa.update(jnp.asarray(ga), sa)
        pa = optax.apply_updates(pa, ua)
        ub, sb = ob.update(jnp.asarray(gb), sb)
        pb = optax.apply_updates(pb, ub)

    np.testing.assert_allclose(np.asarray(pa), va.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pb), vb.numpy(), rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def ref_mods():
    from tests._reference_oracle import load_reference_module

    gan = load_reference_module("gan")
    kw = dict(
        batch_size=B, state_size=J, x_width=HW, x_height=HW,
        filter_size=F, bn=False, nchannel=C, dropout=0.0, rnn_dropout=0.0,
    )
    enc = gan.VideoEncoderConvLSTM(
        int_time_steps=TC, pred_time_steps=TP, period=[1, 1, 1, 1], **kw
    )
    dec = gan.VideoDecoderConvLSTM(
        int_time_steps=TC, pred_time_steps=TP, period=[1, 1, 1, 1], **kw
    )
    dkw = {k: v for k, v in kw.items() if k not in ("dropout", "rnn_dropout")}
    disc_h = gan.VideoDiscriminator(time_steps=T, **dkw)
    disc_m = gan.VideoDiscriminator(time_steps=T, **dkw)
    return enc, dec, disc_h, disc_m


def test_training_trajectory_parity(ref_mods):
    import tensorflow as tf

    from tests._reference_oracle import load_reference_module
    from tests.test_model_parity import (
        _port_decoder, _port_discriminator, _port_encoder,
    )

    gu = load_reference_module("gan_utils")
    du = load_reference_module("data_utils")
    enc_r, dec_r, h_r, m_r = ref_mods

    rng = np.random.default_rng(42)
    video = rng.uniform(size=(B, HW, T, HW, C)).astype(np.float32)
    scaling = 1.0 / 15.0

    # Build the Keras variables (first call creates weights).
    _ = dec_r.call_all(enc_r.call_all(video, training=True),
                       np.zeros((B, TP, 4, 4, ZC), np.float32),
                       training=True)
    _ = h_r.call(video, training=True)
    _ = m_r.call(video, training=True)

    # ---- our state with the reference's initial weights ported in ----
    cfg = TRAJ
    mods = GanModules(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    enc_p = jax.tree_util.tree_map(jnp.asarray, _port_encoder(enc_r))
    dec_p = jax.tree_util.tree_map(jnp.asarray, _port_decoder(dec_r))
    h_p = jax.tree_util.tree_map(jnp.asarray, _port_discriminator(h_r))
    m_p = jax.tree_util.tree_map(jnp.asarray, _port_discriminator(m_r))
    opts = make_optimizers(cfg)
    state = state.replace(
        enc_params=enc_p, dec_params=dec_p, h_params=h_p, m_params=m_p,
        enc_opt=opts["enc"].init(enc_p), dec_opt=opts["dec"].init(dec_p),
        h_opt=opts["h"].init(h_p), m_opt=opts["m"].init(m_p),
    )

    # Pre-compute the z draws our train step WILL make (replaying its
    # RNG chain), so the identical arrays can be injected into the
    # reference driver — both sides see the same noise.
    zs = []
    chain = state.rng
    for _ in range(N_STEPS):
        chain, k_disc, k_gen = jax.random.split(chain, 3)
        z_shape = (B, TP, 4, 4, ZC)
        zs.append((
            np.asarray(jax.random.normal(k_disc, z_shape, jnp.float32)),
            np.asarray(jax.random.normal(k_gen, z_shape, jnp.float32)),
        ))

    # ---- run ours: N full (disc + gen) iterations ----
    train_step = build_train_step(cfg, mods, jit=True, donate=False)
    ours_hist = []
    for i in range(N_STEPS):
        state, metrics = train_step(state, jnp.asarray(video))
        ours_hist.append(
            (float(metrics["pm"]), float(metrics["sinkhorn_loss"]))
        )

    # ---- run the reference driver: kernel_train.py:219-292 exactly,
    # with z injected instead of dist_z.sample ----
    lr_sched = tf.keras.optimizers.schedules.ExponentialDecay(
        LR, decay_steps=cfg.decay_steps, decay_rate=cfg.decay_rate,
        staircase=True,
    )
    warm = du.WarmUp(
        initial_learning_rate=LR, decay_schedule_fn=lr_sched,
        warmup_steps=WARMUP,
    )
    gen_opt = tf.keras.optimizers.Adam(warm, beta_1=0.5, beta_2=0.9)
    disc_opt = tf.keras.optimizers.Adam(warm, beta_1=0.5, beta_2=0.9)
    # Keras 3: pre-register both variable groups of each shared
    # optimizer (Keras 2 built slots lazily; cadence is identical).
    gen_opt.build(
        list(enc_r.trainable_variables) + list(dec_r.trainable_variables)
    )
    disc_opt.build(
        list(h_r.trainable_variables) + list(m_r.trainable_variables)
    )

    real_in = tf.constant(video[:, :, :TC])
    real_pred = tf.constant(video[:, :, TC:])
    ref_hist = []
    for i in range(N_STEPS):
        z1, z2 = zs[i]
        # disc_training_step (`kernel_train.py:219-256`)
        with tf.GradientTape() as tape:
            real_inp = tf.concat((real_in, real_pred), axis=2)
            feats = enc_r.call(real_inp)
            fake_pred = dec_r.call(feats, tf.constant(z1))
            real = tf.concat((real_in, real_pred), axis=2)
            fake = tf.concat((real_in, fake_pred), axis=2)
            h_fake = h_r.call(fake)
            h_real = h_r.call(real)
            m_real = m_r.call(real)
            m_fake = m_r.call(fake)
            loss = gu.compute_sinkhorn_loss(
                real, fake, scaling, 1.0, 100, h_fake, m_real,
                h_real, m_fake, video=True,
            )
            pm1 = gu.scale_invariante_martingale_regularization(
                m_real, 1.0, scaling
            )
            disc_loss = -loss + pm1
        gh, gm = tape.gradient(
            disc_loss, [h_r.trainable_variables, m_r.trainable_variables]
        )
        disc_opt.apply_gradients(zip(gh, h_r.trainable_variables))
        disc_opt.apply_gradients(zip(gm, m_r.trainable_variables))

        # gen_training_step (`kernel_train.py:258-292`)
        with tf.GradientTape() as tape:
            real_inp = tf.concat((real_in, real_pred), axis=2)
            feats = enc_r.call(real_inp)
            fake_pred = dec_r.call(feats, tf.constant(z2))
            real = tf.concat((real_in, real_pred), axis=2)
            fake = tf.concat((real_in, fake_pred), axis=2)
            h_fake = h_r.call(fake)
            h_real = h_r.call(real)
            m_real = m_r.call(real)
            m_fake = m_r.call(fake)
            gloss = gu.compute_sinkhorn_loss(
                real, fake, scaling, 1.0, 100, h_fake, m_real,
                h_real, m_fake, video=True,
            )
        ge, gd = tape.gradient(
            gloss, [enc_r.trainable_variables, dec_r.trainable_variables]
        )
        gen_opt.apply_gradients(zip(ge, enc_r.trainable_variables))
        gen_opt.apply_gradients(zip(gd, dec_r.trainable_variables))
        ref_hist.append((float(pm1), float(gloss)))

    # ---- compare: per-step loss sequence ----
    ours = np.array(ours_hist)
    ref = np.array(ref_hist)
    np.testing.assert_allclose(
        ours, ref, rtol=2e-3, atol=1e-5,
        err_msg=f"trajectory (pm, loss) sequences diverged:\n"
                f"ours={ours_hist}\nref={ref_hist}",
    )

    # ---- compare: final parameter trees (after N full iterations) ----
    final_ref = {
        "enc": _port_encoder(enc_r),
        "dec": _port_decoder(dec_r),
        "h": _port_discriminator(h_r),
        "m": _port_discriminator(m_r),
    }
    final_ours = {
        "enc": state.enc_params, "dec": state.dec_params,
        "h": state.h_params, "m": state.m_params,
    }
    for group in final_ref:
        ref_leaves = jax.tree_util.tree_leaves_with_path(final_ref[group])
        ours_tree = final_ours[group]
        got_map = {
            jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(ours_tree)
        }
        assert len(ref_leaves) == len(got_map)
        for path, want in ref_leaves:
            got = got_map[jax.tree_util.keystr(path)]
            np.testing.assert_allclose(
                got, np.asarray(want), rtol=5e-4, atol=5e-6,
                err_msg=f"{group}{jax.tree_util.keystr(path)} diverged "
                        f"after {N_STEPS} iterations",
            )
