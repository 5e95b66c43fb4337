"""Video-prediction eval metrics vs the TF oracle + protocol tests.

The reference has no metrics at all (gifs only, `README.md:9-16`);
`kccotgan_tpu.eval` pins its PSNR/SSIM to `tf.image.psnr`/`tf.image.ssim`
semantics, oracle-checked here the same way the smoothing/OT parity
tests execute the reference stack directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kccotgan_tpu.eval import best_of_k, psnr, ssim, video_metrics


@pytest.fixture(scope="module")
def videos():
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (3, 24, 4, 20, 3)).astype(np.float32)  # [B,H,T,W,C]
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    return a, b


def _frames(v):
    # film-strip [B,H,T,W,C] -> [B,T,H,W,C] for the TF oracle
    return np.transpose(v, (0, 2, 1, 3, 4))


def test_psnr_matches_tf(videos):
    import tensorflow as tf

    a, b = videos
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    want = tf.image.psnr(_frames(a), _frames(b), max_val=1.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ssim_matches_tf(videos):
    import tensorflow as tf

    a, b = videos
    got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = tf.image.ssim(_frames(a), _frames(b), max_val=1.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_identity_and_bounds(videos):
    a, b = videos
    self_sim = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(self_sim, 1.0, atol=1e-6)
    cross = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(cross <= 1.0 + 1e-6) and np.all(cross > 0.0)


def test_metrics_are_jittable(videos):
    a, b = videos
    out = jax.jit(video_metrics)(jnp.asarray(a), jnp.asarray(b))
    assert out["psnr"].shape == () and out["ssim"].shape == ()
    assert out["psnr_per_step"].shape == (a.shape[2],)
    # noisier copy scores strictly below the clean self-comparison
    clean = jax.jit(video_metrics)(jnp.asarray(a), jnp.asarray(a))
    assert float(out["ssim"]) < float(clean["ssim"])


def test_best_of_k_protocol(videos):
    """best-of-K equals the per-sample max over the K individual
    rollouts, scored on the prediction region only."""
    a, _ = videos
    tc, tp = 2, 2
    truth = jnp.asarray(a[:, :, tc : tc + tp])

    def fake_rollout(state, context, key):
        noise = 0.3 * jax.random.uniform(key, truth.shape)
        pred = jnp.clip(truth + noise, 0, 1)
        return jnp.concatenate([jnp.asarray(context), pred], axis=2)

    rng, k = jax.random.PRNGKey(0), 4
    got = best_of_k(fake_rollout, None, jnp.asarray(a), tc, rng, k=k)
    assert got["psnr_per_step"].shape == (tp,)

    # manual replay of the protocol
    per_key_ps, per_key_ss = [], []
    for key in jax.random.split(rng, k):
        pred = fake_rollout(None, a[:, :, :tc], key)[:, :, tc : tc + tp]
        per_key_ps.append(np.asarray(psnr(pred, truth)).mean(axis=1))
        per_key_ss.append(np.asarray(ssim(pred, truth)).mean(axis=1))
    want_ps = np.stack(per_key_ps).max(axis=0).mean()
    want_ss = np.stack(per_key_ss).max(axis=0).mean()
    np.testing.assert_allclose(float(got["psnr"]), want_ps, rtol=1e-6)
    np.testing.assert_allclose(float(got["ssim"]), want_ss, rtol=1e-6)
