"""Layer-level parity vs the in-image Keras oracle with ported weights.

These pin gate ordering, activations, stride/padding geometry, and
weight layouts for ConvLSTM2D / LSTM / Conv2D / Conv2DTranspose — the
building blocks the reference instantiates (`/root/reference/gan.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kccotgan_tpu.models.layers import LSTM, Conv2D, ConvLSTM2D, ConvTranspose2D


def _keras():
    tf = pytest.importorskip("tensorflow")
    return tf


@pytest.mark.reference_oracle
@pytest.mark.parametrize("strides,use_bias", [((2, 2), False), ((1, 1), True)])
def test_convlstm_parity(rng, strides, use_bias):
    tf = _keras()
    b, t, h, w, c, f = 2, 4, 8, 8, 3, 5
    x = rng.normal(size=(b, t, h, w, c)).astype(np.float32)

    ref = tf.keras.layers.ConvLSTM2D(
        f, kernel_size=(3, 3), strides=strides, padding="same",
        return_sequences=True, use_bias=use_bias, activation="tanh",
    )
    want = ref(x).numpy()
    weights = ref.get_weights()

    mod = ConvLSTM2D(
        filters=f, kernel_size=(3, 3), strides=strides, use_bias=use_bias
    )
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x), training=False)
    pd = {"kernel": weights[0], "recurrent_kernel": weights[1]}
    if use_bias:
        pd["bias"] = weights[2]
    got = np.asarray(
        mod.apply({"params": pd}, jnp.array(x), training=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.reference_oracle
@pytest.mark.parametrize("activation", ["tanh", "sigmoid"])
def test_lstm_parity(rng, activation):
    tf = _keras()
    b, t, feat, u = 3, 6, 10, 7
    x = rng.normal(size=(b, t, feat)).astype(np.float32)

    ref = tf.keras.layers.LSTM(u, return_sequences=True, activation=activation)
    want = ref(x).numpy()
    k, rk, bias = ref.get_weights()

    mod = LSTM(units=u, activation=activation)
    got = np.asarray(
        mod.apply(
            {"params": {"kernel": k, "recurrent_kernel": rk, "bias": bias}},
            jnp.array(x),
            training=False,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.reference_oracle
def test_conv2d_parity(rng):
    tf = _keras()
    b, h, w, c, f = 2, 9, 9, 3, 4
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ref = tf.keras.layers.Conv2D(f, (5, 5), strides=(2, 2), padding="same")
    want = ref(x).numpy()
    k, bias = ref.get_weights()
    mod = Conv2D(filters=f, kernel_size=(5, 5), strides=(2, 2))
    got = np.asarray(
        mod.apply({"params": {"kernel": k, "bias": bias}}, jnp.array(x))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.reference_oracle
@pytest.mark.parametrize(
    "ksize,strides",
    [((2, 2), (2, 2)), ((4, 4), (2, 2)), ((6, 6), (2, 2)), ((8, 8), (1, 1))],
)
def test_conv_transpose_parity(rng, ksize, strides):
    """All (kernel, stride) combos the decoder uses for square inputs
    (`gan.py:160-167,262`)."""
    tf = _keras()
    b, h, w, c, f = 2, 4, 4, 3, 5
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ref = tf.keras.layers.Conv2DTranspose(
        f, ksize, strides=strides, padding="same", use_bias=False
    )
    want = ref(x).numpy()
    (k,) = ref.get_weights()
    mod = ConvTranspose2D(
        filters=f, kernel_size=ksize, strides=strides, use_bias=False
    )
    got = np.asarray(mod.apply({"params": {"kernel": k}}, jnp.array(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convlstm_causality(rng):
    """Output at time t must not depend on inputs after t."""
    b, t, h, w, c, f = 1, 5, 4, 4, 2, 3
    x = rng.normal(size=(b, t, h, w, c)).astype(np.float32)
    mod = ConvLSTM2D(filters=f, kernel_size=(3, 3), use_bias=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x), training=False)
    y1 = mod.apply(params, jnp.array(x), training=False)
    x2 = x.copy()
    x2[:, 3:] += 100.0  # perturb the future
    y2 = mod.apply(params, jnp.array(x2), training=False)
    np.testing.assert_allclose(
        np.asarray(y1[:, :3]), np.asarray(y2[:, :3]), rtol=1e-6
    )
    assert not np.allclose(np.asarray(y1[:, 3:]), np.asarray(y2[:, 3:]))


def test_convlstm_dropout_path(rng):
    """Slow per-gate dropout path runs and differs from deterministic."""
    b, t, h, w, c, f = 2, 3, 4, 4, 2, 3
    x = jnp.array(rng.normal(size=(b, t, h, w, c)).astype(np.float32))
    mod = ConvLSTM2D(filters=f, kernel_size=(3, 3), dropout=0.5, recurrent_dropout=0.5)
    params = mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        training=True,
    )
    y_train = mod.apply(
        params, x, training=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    y_eval = mod.apply(params, x, training=False)
    assert y_train.shape == y_eval.shape
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))


@pytest.mark.parametrize("layer", ["convlstm", "lstm"])
def test_remat_policies_identical_grads(rng, layer):
    """remat policies are pure schedule choices: loss values and
    gradients must be IDENTICAL across no-remat / carry_only /
    save_recurrent (jax.checkpoint never changes math, only what the
    backward pass recomputes vs reloads)."""
    if layer == "convlstm":
        x = jnp.array(rng.normal(size=(2, 4, 6, 6, 3)).astype(np.float32))

        def build(remat, policy):
            return ConvLSTM2D(
                filters=4, kernel_size=(3, 3), remat=remat,
                remat_policy=policy,
            )
    else:
        x = jnp.array(rng.normal(size=(2, 5, 7)).astype(np.float32))

        def build(remat, policy):
            return LSTM(units=4, remat=remat, remat_policy=policy)

    ref_mod = build(False, "carry_only")
    params = ref_mod.init(jax.random.PRNGKey(0), x, training=False)

    def loss_fn(mod):
        def f(p):
            return jnp.sum(mod.apply(p, x, training=False) ** 2)
        return jax.value_and_grad(f)(params)

    ref_loss, ref_grad = loss_fn(ref_mod)
    for policy in ("carry_only", "save_recurrent"):
        loss, grad = loss_fn(build(True, policy))
        assert np.asarray(loss) == np.asarray(ref_loss), policy
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            grad, ref_grad,
        )


def test_resolve_remat_policy_spec():
    from kccotgan_tpu.models.layers import resolve_remat_policy

    # bare policy applies everywhere
    assert resolve_remat_policy("carry_only", "decoder5") == "carry_only"
    assert resolve_remat_policy("save_recurrent", "lstm1") == "save_recurrent"
    # per-layer overrides on top of a bare default
    spec = "carry_only,decoder4=save_recurrent, decoder5=save_recurrent"
    assert resolve_remat_policy(spec, "decoder4") == "save_recurrent"
    assert resolve_remat_policy(spec, "decoder5") == "save_recurrent"
    assert resolve_remat_policy(spec, "encoder1") == "carry_only"
    # overrides-only spec keeps the carry_only default elsewhere
    assert resolve_remat_policy("decoder5=save_recurrent", "lstm2") == "carry_only"
    # unknown policy values surface at trace time via _remat
    from kccotgan_tpu.models.layers import _remat

    with pytest.raises(ValueError):
        _remat(lambda c, x: (c, x), "not_a_policy", "rconv")


def test_parse_remat_spec_validation():
    """Specs are validated eagerly: unknown layer names, unknown
    policies, and duplicate bare defaults all raise (round-4 ADVICE —
    a typo like 'decodr5=save_recurrent' previously no-opped)."""
    from kccotgan_tpu.models.layers import parse_remat_spec

    assert parse_remat_spec("carry_only") == ("carry_only", {})
    default, over = parse_remat_spec("save_recurrent,decoder5=carry_only")
    assert default == "save_recurrent" and over == {"decoder5": "carry_only"}

    with pytest.raises(ValueError, match="unknown layer name"):
        parse_remat_spec("decodr5=save_recurrent")
    with pytest.raises(ValueError, match="unknown remat policy"):
        parse_remat_spec("carryonly")
    with pytest.raises(ValueError, match="unknown remat policy"):
        parse_remat_spec("decoder5=saverecurrent")
    with pytest.raises(ValueError, match="more than one bare default"):
        parse_remat_spec("carry_only,save_recurrent")


def test_per_layer_remat_spec_identical_grads():
    """A per-layer remat-policy spec is still a pure schedule choice:
    encoder loss + grads are bit-identical to uniform carry_only."""
    from kccotgan_tpu.models import VideoEncoder

    rng = np.random.default_rng(3)
    video = jnp.array(rng.uniform(size=(2, 16, 4, 16, 1)).astype(np.float32))

    def run(policy):
        enc = VideoEncoder(
            int_time_steps=2, filter_size=2, scan_remat=True,
            scan_remat_policy=policy,
        )
        params = enc.init(jax.random.PRNGKey(0), video, training=False)

        def f(p):
            pyr = enc.apply(p, video, training=False)
            return sum(jnp.sum(level ** 2) for level in pyr[1:])

        return jax.value_and_grad(f)(params)

    ref_loss, ref_grad = run("carry_only")
    loss, grad = run("carry_only,encoder2=save_recurrent,encoder4=save_recurrent")
    assert np.asarray(loss) == np.asarray(ref_loss)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        grad, ref_grad,
    )
