"""Dataclass configuration for training runs.

Replaces the reference's flat argparse namespace (~38 flags,
`/root/reference/kernel_train.py:361-413`) with typed dataclasses.
Semantics preserved or deliberately fixed:

* ``scaling_coef`` here is the *raw* flag value; the effective
  multiplier is ``1 / scaling_coef`` (`kernel_train.py:71`), exposed as
  the ``effective_scaling`` property.
* ``sinkhorn_eps`` / ``sinkhorn_l`` are REAL knobs (the reference
  silently ignored them — quirk ledger #1); defaults equal the
  reference's effective values (1.0, 100).
* boolean flags are real booleans (the reference's ``type=bool`` made
  every passed value truthy — quirk ledger #6).
* eval-rollout ``z_channels`` follows the config (the reference
  hardcoded 128 at eval, `kernel_train.py:348` — quirk ledger #5).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field

__all__ = ["ModelConfig", "TrainConfig", "config_from_dict"]


@dataclass(frozen=True)
class ModelConfig:
    x_height: int = 64
    x_width: int = 64
    n_channels: int = 1
    g_state_size: int = 8
    d_state_size: int = 8
    g_filter_size: int = 8
    d_filter_size: int = 8
    z_channels: int = 128
    z_height: int = 4
    z_width: int = 4
    use_norm: bool = True  # `--batch_norm` (LayerNorm in G, BatchNorm in D)
    dropout: float = 0.0
    rnn_dropout: float = 0.0
    output_activation: str = "sigmoid"


@dataclass(frozen=True)
class TrainConfig:
    # data
    dname: str = "mmnist"
    data_path: str = "../data"
    batch_size: int = 8
    total_time_steps: int = 15
    int_time_steps: int = 5
    n_epochs: int = 100

    # model
    model: ModelConfig = field(default_factory=ModelConfig)

    # objective
    sinkhorn_eps: float = 1.0  # reference-effective value (quirk #1)
    sinkhorn_l: int = 100
    scaling_coef: float = 15.0  # effective multiplier is 1/this
    reg_penalty: float = 1.0
    cost_method: str = "gram"  # 'gram' (MXU) or 'exact' (reference order)
    # 'auto' = fused Pallas kernel on TPU, XLA scan elsewhere (the
    # kernel wins every measured standalone regime — PARITY.md table).
    sinkhorn_solver: str = "auto"

    # kernel smoothing
    kernel: str = "none"  # {'1d','2d','3d','none'}
    init_sigma: float = 5.0
    decaying_sigma: bool = False
    temporal_kernel_size: int = 6
    spatial_kernel_size: int = 6

    # optimization
    lr: float = 5e-4
    warmup_steps: int = 10000
    decay_steps: int = 5000
    decay_rate: float = 0.975
    beta1: float = 0.5
    beta2: float = 0.9
    adam_eps: float = 1e-7  # Keras Adam default
    # The reference calls apply_gradients twice per optimizer per step
    # (h then m; enc then dec), advancing the Keras LR-schedule step 2x
    # per iteration.  True reproduces that cadence.
    keras_double_step_quirk: bool = True

    # parallelism
    num_devices: int = 1  # data-parallel mesh size
    # sequence-parallel mesh size: shard the TIME axis so per-device
    # generator activation memory scales O(T/S) (long horizons that
    # exceed one chip's HBM).  total_time_steps and pred_time_steps
    # must both divide by it.  Composes with num_devices>1 into a 2-D
    # (data x seq) mesh — batch over 'data', generator time over 'seq'
    # (parallel/seqtrain.py; exactness pinned in tests/test_seqpar.py).
    seq_devices: int = 1
    global_batch_sinkhorn: bool = True  # all-gather exact global Sinkhorn
    donate_buffers: bool = True

    # precision
    # MXU input precision for convs/matmuls ONLY (params, gate math,
    # Sinkhorn, reductions all stay f32).  Default bfloat16: training-
    # parity validated — the bf16-vs-f32 loss-curve gap is ~5x SMALLER
    # than the f32 seed-to-seed run noise (PARITY.md bf16 section), and
    # bf16 is measurably faster.  Set 'float32' for bit-level replication
    # of the f32 reference numerics.
    compute_dtype: str = "bfloat16"

    # recurrence compilation
    scan_remat: bool = True  # checkpoint scan bodies (residual HBM traffic
    #   dominates the step; recompute of the gate math is cheaper)
    # 'carry_only': backward recomputes the whole scan body (min HBM);
    # 'save_recurrent': also save the recurrent conv/matmul outputs so
    # backward recomputes only gate math (HBM-vs-FLOPs tradeoff;
    # mathematically identical — models/layers.py::_remat).  The
    # tradeoff flips with layer geometry, so per-layer overrides are
    # supported: 'carry_only,decoder4=save_recurrent,decoder5=
    # save_recurrent' (models/layers.py::resolve_remat_policy).
    scan_remat_policy: str = "carry_only"
    scan_unroll: int = 1     # lax.scan unroll factor for ConvLSTM/LSTM
    # 'auto': run stride-1 small-filter ConvLSTMs (decoder5 at default
    # g_state_size=8: 4f=32 of 128 MXU lanes) on space-to-depth-packed
    # tensors — the same linear map with r^2-fatter channels
    # (models/conv_packing.py; reduction order differs at ULP level,
    # 'off' restores bit-exact unpacked numerics).  History: measured
    # SLOWER under the batch-major layout (165.6 vs 161.3 ms — the
    # relayouts it forced added ~10 GB/step of HBM traffic), but the r5
    # time-major plumbing removed that relayout population and the
    # verdict FLIPPED: 145.5/145.9 vs 148.2 ms/step paired runs
    # (+1.8 %, MFU 18.7 % — PARITY.md).  Default 'auto' since r5.
    conv_packing: str = "auto"
    # ConvLSTM recurrence engine: 'scan' = lax.scan over T (the
    # bit-replication oracle), 'pallas' = fused single-kernel recurrence
    # ((h, c) VMEM-resident for all T, no B<->T transposes —
    # models/pallas_convlstm.py), 'auto' = the measured winner, which
    # on v5e is 'scan' everywhere (end-to-end 160.8 vs 236.6 ms/step —
    # PARITY.md "ConvLSTM recurrence engine").  Layers the kernel does
    # not cover (dropout>0, packing, seq_axis, dense-LSTM gate width
    # under one 128-lane vreg) silently fall back to scan per-layer.
    kernel_impl: str = "scan"

    # Time-major generator layout: the encoder pyramid and the whole
    # U-Net decoder stack run on [T, B, ...] tensors, so every hoisted
    # ConvLSTM conv fold and scan is transpose-free (batch-major
    # materializes ~3 GB/step of pure B<->T layout copies at the
    # flagship shape — tools/hlo_report.py).  The forward is bit-exact
    # (row-permuted identical per-frame convs; pinned in
    # tests/test_train.py); backward differs only by dL/dW reduction
    # order (<= 2e-07 relative).  Rollout and sequence parallelism keep
    # the batch-major modules (same param trees).  Default ON: measured
    # 148.2 vs 150.6 ms/step on the v5e flagship (+1.6 %, consistent
    # across paired 20- and 40-step runs — PARITY.md r5).
    time_major: bool = True

    # Run the 4 discriminator passes (h/m x real/fake) as ONE vmapped
    # call over stacked params: 4x fewer scan launches at 4x batch.
    # Exact: vmapped BatchNorm normalizes each instance by its own
    # batch (same as sequential calls) and the sequential running-stat
    # chain is reconstructed algebraically (see train/steps.py).
    # Default OFF: measured SLOWER on v5e (3387 vs 3554 frames/sec) —
    # vmap over conv KERNELS lowers to batched-kernel convs that the
    # TPU backend handles worse than 4 separate fused convs.
    fused_discriminators: bool = False

    # Encode the context frames ONCE per step instead of once per GAN
    # phase.  The encoder pyramid is z-independent and the generator
    # params do not change between the disc and gen phases (enc/dec
    # update only at the END of the gen phase — train/steps.py), so
    # the two phases' encoder forwards are the same computation: the
    # disc phase consumes the value as a constant and the gen phase
    # chains its cotangent through one jax.vjp.  Mathematically exact;
    # auto-disabled when dropout>0 (the phases then draw different
    # masks, matching the reference's per-phase forwards —
    # /root/reference/kernel_train.py:226,266) and under the
    # sequence-parallel encode hook.  OFF = bit-replication of the
    # two-forward trace.
    share_context_encoding: bool = True

    # failure recovery (SURVEY §5.3 "checkpoint-based restart"): on a
    # non-finite loss the trainer restores the last verified-finite
    # checkpoint, re-seeds the step RNG (fold_in of the retry counter),
    # skips past the offending batch, and continues — up to this many
    # times per run.  0 = the reference's sentinel behavior (append to
    # train_notes and stop, `kernel_train.py:323-329`).
    nan_recovery_retries: int = 0

    # bookkeeping
    seed: int = 1
    save_freq: int = 10
    ckpt_freq: int = 10000
    out_dir: str = "trained"
    run_name: str = ""
    checkpoint: bool = False
    ckpt_path: str = ""

    @property
    def pred_time_steps(self) -> int:
        return self.total_time_steps - self.int_time_steps

    @property
    def effective_scaling(self) -> float:
        return 1.0 / self.scaling_coef

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def config_from_dict(d: dict) -> TrainConfig:
    model_d = d.pop("model", {})
    known_m = {f.name for f in dataclasses.fields(ModelConfig)}
    known_t = {f.name for f in dataclasses.fields(TrainConfig)} - {"model"}
    model = ModelConfig(**{k: v for k, v in model_d.items() if k in known_m})
    return TrainConfig(
        model=model, **{k: v for k, v in d.items() if k in known_t}
    )
