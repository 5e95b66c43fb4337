"""Parity + property tests for Gaussian kernel smoothing."""

import numpy as np
import pytest

import jax.numpy as jnp

from kccotgan_tpu.smoothing import (
    annealing_sigma,
    apply_smoothing,
    gaussian_kernel1d,
    smooth_spatial,
    smooth_spatio_temporal,
    smooth_temporal,
    spatial_output_size,
)

B, H, T, W, C = 2, 10, 8, 10, 3
SIGMA = 5.0


def _video(rng, c=C):
    return rng.uniform(size=(B, H, T, W, c)).astype(np.float32)


def test_kernel1d_normalized():
    k = np.asarray(gaussian_kernel1d(3, 5.0))
    assert k.shape == (7,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k, k[::-1], rtol=1e-6)  # symmetric


def test_temporal_shape_preserved(rng):
    v = _video(rng)
    out = np.asarray(smooth_temporal(jnp.array(v), SIGMA))
    assert out.shape == v.shape
    np.testing.assert_allclose(out.max(), 1.0, rtol=1e-5)  # max-normalized


def test_spatial_shrinks(rng):
    v = _video(rng)
    out = np.asarray(smooth_spatial(jnp.array(v), SIGMA))
    ho = spatial_output_size(H)
    assert out.shape == (B, ho, T, ho, C)
    np.testing.assert_allclose(out.max(), 1.0, rtol=1e-5)


def test_3d_shape_preserved(rng):
    v = _video(rng)
    out = np.asarray(smooth_spatio_temporal(jnp.array(v), SIGMA))
    assert out.shape == v.shape
    np.testing.assert_allclose(out.max(), 1.0, rtol=1e-5)


def test_annealing_sigma():
    np.testing.assert_allclose(annealing_sigma(5.0, 0), 5.0)
    np.testing.assert_allclose(annealing_sigma(5.0, 500), 5.0 * 0.975)
    np.testing.assert_allclose(annealing_sigma(5.0, 250), 5.0 * 0.975**0.5)


def test_apply_dispatch(rng):
    v = jnp.array(_video(rng))
    assert apply_smoothing(v, SIGMA, "none").shape == v.shape
    assert apply_smoothing(v, SIGMA, "1d").shape == v.shape
    assert apply_smoothing(v, SIGMA, "3d").shape == v.shape
    ho = spatial_output_size(H)
    assert apply_smoothing(v, SIGMA, "2d").shape == (B, ho, T, ho, C)


@pytest.mark.reference_oracle
@pytest.mark.parametrize("nc", [1, 3])
def test_parity_temporal(rng, nc):
    from tests._reference_oracle import load_reference_module

    du = load_reference_module("data_utils")
    ks = du.KernelSmoothing(temporal_kernel_size=6, spatial_kernel_size=6)
    v = _video(rng, c=nc)
    want = ks.temporal_convolution(v, SIGMA).numpy()
    got = np.asarray(smooth_temporal(jnp.array(v), SIGMA))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.reference_oracle
@pytest.mark.parametrize("nc", [1, 3])
def test_reference_spatial_is_broken_ours_matches_intent(rng, nc):
    """Quirk: the reference's spatial_convolution reshapes the
    VALID-shrunk conv output back to the ORIGINAL H,W
    (`data_utils.py:538,548`) and crashes unconditionally — `--kernel 2d`
    never worked.  We implement the intended semantics (shrunken output)
    and verify against the reference's conv core computed directly."""
    import tensorflow as tf

    from tests._reference_oracle import load_reference_module

    du = load_reference_module("data_utils")
    ks = du.KernelSmoothing(temporal_kernel_size=6, spatial_kernel_size=6)
    v = _video(rng, c=nc)
    with pytest.raises(Exception):
        ks.spatial_convolution(v, SIGMA)

    # Intended math: per (b, t, c) frame, 7x7 Gaussian VALID conv, then
    # global-max normalize — computed here with TF as an independent oracle.
    taps = ks.gaussian_kernel1d(3, SIGMA).numpy()
    kernel = np.tensordot(taps, taps, 0)[:, :, None, None]
    frames = np.transpose(v, (0, 2, 4, 1, 3)).reshape(B * T * nc, H, W, 1)
    sm = tf.nn.conv2d(frames, kernel, [1, 1, 1, 1], padding="VALID").numpy()
    ho = H - 6
    want = np.transpose(sm.reshape(B, T, nc, ho, ho), (0, 3, 1, 4, 2))
    want = want / want.max()
    got = np.asarray(smooth_spatial(jnp.array(v), SIGMA))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.reference_oracle
@pytest.mark.parametrize("nc", [1, 3])
def test_parity_3d(rng, nc):
    from tests._reference_oracle import load_reference_module

    du = load_reference_module("data_utils")
    ks = du.KernelSmoothing(temporal_kernel_size=6, spatial_kernel_size=6)
    v = _video(rng, c=nc)
    want = ks.gaussian_convolution3D(v, SIGMA).numpy()
    got = np.asarray(smooth_spatio_temporal(jnp.array(v), SIGMA))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
