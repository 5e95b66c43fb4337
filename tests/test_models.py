"""Shape, causality, and teacher-forcing tests for the model family.

Shape contracts mirror `/root/reference/gan.py` (encoder pyramid slicing
`gan.py:89-110`, decoder teacher-forcing switch `gan.py:268-272`,
discriminator `[B,T,J]` output `gan.py:427-428`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.models import VideoDecoder, VideoDiscriminator, VideoEncoder

B, H, W, C = 2, 32, 32, 1
T_TOTAL, T_CTX = 7, 3
T_PRED = T_TOTAL - T_CTX
FS = 4  # filter_size
ZC = 16


@pytest.fixture(scope="module")
def video():
    rng = np.random.default_rng(1)
    return jnp.array(rng.uniform(size=(B, H, T_TOTAL, W, C)).astype(np.float32))


@pytest.fixture(scope="module")
def enc_setup(video):
    enc = VideoEncoder(int_time_steps=T_CTX, filter_size=FS, use_norm=True)
    params = enc.init(jax.random.PRNGKey(0), video, training=False)
    return enc, params


def test_encoder_pyramid_shapes(video, enc_setup):
    enc, params = enc_setup
    pyr = enc.apply(params, video, training=False)
    assert len(pyr) == 5
    t_out = T_TOTAL - T_CTX + 1
    assert pyr[0].shape == (B, t_out, H, W, C)
    for lvl in range(1, 5):
        s = H // (2**lvl)
        assert pyr[lvl].shape == (B, t_out, s, s, FS * 4 * 2 ** (lvl - 1))


def test_encoder_causality(video, enc_setup):
    """Pyramid features at relative time k depend only on frames <= Tc-1+k."""
    enc, params = enc_setup
    pyr1 = enc.apply(params, video, training=False)
    perturbed = video.at[:, :, -1].add(50.0)  # change only the last frame
    pyr2 = enc.apply(params, perturbed, training=False)
    for a, b_ in zip(pyr1[1:], pyr2[1:]):
        np.testing.assert_allclose(
            np.asarray(a[:, :-1]), np.asarray(b_[:, :-1]), rtol=1e-5, atol=1e-6
        )
        assert not np.allclose(np.asarray(a[:, -1]), np.asarray(b_[:, -1]))


@pytest.fixture(scope="module")
def dec_setup(video, enc_setup):
    enc, enc_params = enc_setup
    pyr = enc.apply(enc_params, video, training=True)
    dec = VideoDecoder(
        x_height=H, x_width=W, nchannel=C, filter_size=FS, use_norm=True
    )
    z = jnp.zeros((B, T_PRED + 1 - 1, H // 16, W // 16, ZC))
    params = dec.init(jax.random.PRNGKey(1), pyr, z, training=True)
    return dec, params, pyr


def test_decoder_training_shape(dec_setup):
    dec, params, pyr = dec_setup
    z = jnp.zeros((B, T_PRED, H // 16, W // 16, ZC))
    y = dec.apply(params, pyr, z, training=True)
    assert y.shape == (B, H, T_PRED, W, C)
    y_np = np.asarray(y)
    assert (y_np >= 0).all() and (y_np <= 1).all()  # sigmoid output


def test_decoder_inference_shape(dec_setup):
    dec, params, pyr = dec_setup
    z = jnp.zeros((B, 1, H // 16, W // 16, ZC))
    y = dec.apply(params, pyr, z, training=False)
    assert y.shape == (B, H, 1, W, C)


def test_decoder_teacher_forcing_alignment(dec_setup):
    """Training frame k uses skip features up to index k (frames Tc-1+k);
    inference uses only the LAST feature frame."""
    dec, params, pyr = dec_setup
    z = jnp.zeros((B, T_PRED, H // 16, W // 16, ZC))
    y1 = dec.apply(params, pyr, z, training=True)
    # Perturb the last pyramid time index -> training output frames :-1 unchanged
    pyr2 = [p.at[:, -1].add(10.0) for p in pyr]
    y2 = dec.apply(params, pyr2, z, training=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)
    # Inference DOES use the last frame
    z1 = jnp.zeros((B, 1, H // 16, W // 16, ZC))
    ye1 = dec.apply(params, pyr, z1, training=False)
    ye2 = dec.apply(params, pyr2, z1, training=False)
    assert not np.allclose(np.asarray(ye1), np.asarray(ye2))


def test_discriminator_output(video):
    disc = VideoDiscriminator(state_size=6, filter_size=FS, use_batch_norm=False)
    params = disc.init(jax.random.PRNGKey(2), video, training=False)
    out = disc.apply(params, video, training=False)
    assert out.shape == (B, T_TOTAL, 6)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()  # sigmoid head


def test_discriminator_batchnorm_mutable(video):
    disc = VideoDiscriminator(state_size=6, filter_size=FS, use_batch_norm=True)
    variables = disc.init(jax.random.PRNGKey(2), video, training=True)
    assert "batch_stats" in variables
    out, updates = disc.apply(
        variables, video, training=True, mutable=["batch_stats"]
    )
    assert out.shape == (B, T_TOTAL, 6)
    # running stats moved
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(before, after)
    )


def test_discriminator_handles_shrunken_input():
    """Spatially-smoothed (VALID) inputs have smaller H,W — must work
    (the reference crashes here; we infer dims from the input)."""
    rng = np.random.default_rng(3)
    v = jnp.array(rng.uniform(size=(B, 26, T_TOTAL, 26, C)).astype(np.float32))
    disc = VideoDiscriminator(state_size=4, filter_size=FS)
    params = disc.init(jax.random.PRNGKey(0), v, training=False)
    out = disc.apply(params, v, training=False)
    assert out.shape == (B, T_TOTAL, 4)
