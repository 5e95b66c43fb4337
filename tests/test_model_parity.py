"""FULL-MODEL forward parity vs the reference implementation.

Ports weights from freshly-initialized reference Keras models
(`/root/reference/gan.py`) into our flax modules and checks every stage
of the GAN forward — encoder pyramid, decoder in both teacher-forcing
and inference modes, discriminator, and the complete mixed
causal-Sinkhorn loss + martingale penalty — agrees numerically.  This
is the end-to-end "loss parity" evidence for BASELINE.md's north star.

Config: bn=False (LayerNorm/BatchNorm off), dropout=0 — the norm/
dropout layers have their own unit parity coverage; here we pin the
wiring (skip order, concat order, teacher-forcing slicing, reshape
semantics) with exact weights.

Known ambiguity, pinned deliberately: the in-image Keras 3 ConvLSTM2D
defaults recurrent_activation='sigmoid' (Keras 2 used hard_sigmoid).
The oracle and our layers agree on sigmoid; `hard_sigmoid` remains a
flag for Keras-2-era checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.models import VideoDecoder, VideoDiscriminator, VideoEncoder
from kccotgan_tpu.ot import compute_sinkhorn_loss, martingale_regularization

pytestmark = pytest.mark.reference_oracle

B, TC, TP = 2, 3, 2
T = TC + TP
HW, C, F, J, ZC = 64, 1, 2, 3, 4
SCALING = 1.0 / 15.0


@pytest.fixture(scope="module")
def ref():
    from tests._reference_oracle import load_reference_module

    return load_reference_module("gan")


@pytest.fixture(scope="module")
def data(rng):
    video = rng.uniform(size=(B, HW, T, HW, C)).astype(np.float32)
    z = rng.normal(size=(B, TP, 4, 4, ZC)).astype(np.float32)
    z1 = rng.normal(size=(B, 1, 4, 4, ZC)).astype(np.float32)
    return video, z, z1


def _ref_models(ref):
    kw = dict(
        batch_size=B, state_size=J, x_width=HW, x_height=HW,
        filter_size=F, bn=False, nchannel=C, dropout=0.0, rnn_dropout=0.0,
    )
    # period=[1,1,1,1]: the constructor's own default ([1,2,4]) crashes
    # on period[3]; the trainer always passes 4 CSV ints
    # (`kernel_train.py:133-134`).
    enc = ref.VideoEncoderConvLSTM(
        int_time_steps=TC, pred_time_steps=TP, period=[1, 1, 1, 1], **kw
    )
    dec = ref.VideoDecoderConvLSTM(
        int_time_steps=TC, pred_time_steps=TP, period=[1, 1, 1, 1], **kw
    )
    disc = ref.VideoDiscriminator(
        time_steps=T, **{k: v for k, v in kw.items() if k not in ("dropout", "rnn_dropout")}
    )
    return enc, dec, disc


def _convlstm_params(layer):
    w = layer.get_weights()
    p = {"kernel": w[0], "recurrent_kernel": w[1]}
    if len(w) > 2:
        p["bias"] = w[2]
    return p


def _port_encoder(ref_enc):
    return {
        f"encoder{i}": _convlstm_params(getattr(ref_enc, f"encoder{i}"))
        for i in range(1, 5)
    }


def _port_decoder(ref_dec):
    p = {}
    for i in range(1, 6):
        (kern,) = getattr(ref_dec, f"conv_transpose{i}").get_weights()
        p[f"conv_transpose{i}"] = {"kernel": kern}
    for i in range(2, 6):
        p[f"decoder{i}"] = _convlstm_params(getattr(ref_dec, f"decoder{i}"))
    return p


def _port_discriminator(ref_disc):
    p = {}
    convs = [l for l in ref_disc.conv.layers if l.get_weights()]
    for i, layer in enumerate(convs, 1):
        k, b = layer.get_weights()
        p[f"conv{i}"] = {"kernel": k, "bias": b}
    lstms = [l for l in ref_disc.rnn.layers if l.get_weights()]
    for i, layer in enumerate(lstms, 1):
        k, rk, b = layer.get_weights()
        p[f"lstm{i}"] = {"kernel": k, "recurrent_kernel": rk, "bias": b}
    return p


@pytest.fixture(scope="module")
def built(ref, data):
    """Build+run the reference models once; port weights into ours."""
    video, z, z1 = data
    enc_r, dec_r, disc_r = _ref_models(ref)

    pyr_r = enc_r.call_all(video, training=True)
    fake_r = dec_r.call_all(pyr_r, z, training=True)
    pyr_inf_r = enc_r.call_all(video[:, :, :TC], training=False)
    fake_inf_r = dec_r.call_all(pyr_inf_r, z1, training=False)
    disc_in = np.concatenate(
        [video[:, :, :TC], np.asarray(fake_r)], axis=2
    )
    d_r = disc_r.call(disc_in, training=True)

    enc = VideoEncoder(int_time_steps=TC, filter_size=F, use_norm=False)
    dec = VideoDecoder(
        x_height=HW, x_width=HW, nchannel=C, filter_size=F, use_norm=False
    )
    disc = VideoDiscriminator(state_size=J, filter_size=F, use_batch_norm=False)
    params = {
        "enc": _port_encoder(enc_r),
        "dec": _port_decoder(dec_r),
        "disc": _port_discriminator(disc_r),
    }
    return {
        "modules": (enc, dec, disc),
        "params": params,
        "ref_out": {
            "pyr": [np.asarray(x) for x in pyr_r],
            "fake": np.asarray(fake_r),
            "fake_inf": np.asarray(fake_inf_r),
            "disc": np.asarray(d_r),
        },
    }


def test_encoder_pyramid_parity(built, data):
    video, _, _ = data
    enc, _, _ = built["modules"]
    pyr = enc.apply({"params": built["params"]["enc"]}, jnp.array(video), training=True)
    assert len(pyr) == len(built["ref_out"]["pyr"]) == 5
    for lvl, (got, want) in enumerate(zip(pyr, built["ref_out"]["pyr"])):
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=1e-5, err_msg=f"level {lvl}"
        )


def test_decoder_training_parity(built, data):
    video, z, _ = data
    enc, dec, _ = built["modules"]
    pyr = enc.apply({"params": built["params"]["enc"]}, jnp.array(video), training=True)
    fake = dec.apply(
        {"params": built["params"]["dec"]}, pyr, jnp.array(z), training=True
    )
    np.testing.assert_allclose(
        np.asarray(fake), built["ref_out"]["fake"], rtol=1e-4, atol=1e-5
    )


def test_decoder_inference_parity(built, data):
    video, _, z1 = data
    enc, dec, _ = built["modules"]
    pyr = enc.apply(
        {"params": built["params"]["enc"]},
        jnp.array(video[:, :, :TC]),
        training=False,
    )
    fake = dec.apply(
        {"params": built["params"]["dec"]}, pyr, jnp.array(z1), training=False
    )
    np.testing.assert_allclose(
        np.asarray(fake), built["ref_out"]["fake_inf"], rtol=1e-4, atol=1e-5
    )


def test_discriminator_parity(built, data):
    video, _, _ = data
    _, _, disc = built["modules"]
    disc_in = np.concatenate(
        [video[:, :, :TC], built["ref_out"]["fake"]], axis=2
    )
    got, _ = disc.apply(
        {"params": built["params"]["disc"]},
        jnp.array(disc_in),
        training=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(got), built["ref_out"]["disc"], rtol=1e-4, atol=1e-5
    )


def test_full_loss_parity(ref, built, data):
    """Mixed Sinkhorn divergence + pM computed by the REFERENCE's own
    gan_utils on the reference forward vs our ot stack on our forward —
    with ported weights the two full pipelines must agree."""
    import tensorflow as tf

    gu = load = __import__("tests._reference_oracle", fromlist=["load_reference_module"]).load_reference_module("gan_utils")
    video, z, _ = data
    enc, dec, disc = built["modules"]

    pyr = enc.apply({"params": built["params"]["enc"]}, jnp.array(video), training=True)
    fake_pred = dec.apply(
        {"params": built["params"]["dec"]}, pyr, jnp.array(z), training=True
    )
    real = jnp.array(video)
    fake = jnp.concatenate([real[:, :, :TC], fake_pred], axis=2)

    def d(x):
        out, _ = disc.apply(
            {"params": built["params"]["disc"]}, x,
            training=True, mutable=["batch_stats"],
        )
        return out

    h_fake, h_real, m_real, m_fake = d(fake), d(real), d(real), d(fake)
    # Quirk #1: the reference IGNORES its sinkhorn_eps/sinkhorn_l args
    # (mis-bound positionally inside compute_sinkhorn_loss), always
    # running eps=1.0, L=100 — ours uses those effective defaults.
    ours_loss = compute_sinkhorn_loss(
        real, fake, SCALING, h_fake, m_real, h_real, m_fake, video=True,
    )
    ours_pm = martingale_regularization(m_real, 1.0, SCALING)

    # reference pipeline on ITS forward (same weights -> same tensors)
    fake_r = tf.constant(built["ref_out"]["fake"])
    real_r = tf.constant(video)
    fake_full_r = tf.concat([real_r[:, :, :TC], fake_r], axis=2)
    hf = tf.constant(np.asarray(h_fake))
    hr = tf.constant(np.asarray(h_real))
    mr = tf.constant(np.asarray(m_real))
    mf = tf.constant(np.asarray(m_fake))
    ref_loss = gu.compute_sinkhorn_loss(
        real_r, fake_full_r, SCALING, 0.8, 30, hf, mr, hr, mf, video=True
    )  # 0.8/30 deliberately "wrong": proves they are ignored (quirk #1)
    ref_pm = gu.scale_invariante_martingale_regularization(mr, 1.0, SCALING)

    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(float(ours_pm), float(ref_pm), rtol=1e-5)
