"""TPU-first neural layers with Keras-pinned semantics.

These are brand-new implementations designed for XLA/TPU, not ports:

* ``ConvLSTM2D`` — the input-to-hidden convolution for **all timesteps
  is hoisted out of the recurrence** and computed as one big strided
  conv over the time-folded batch ``[B*T, H, W, C]`` (one large MXU
  pass).  The ``lax.scan`` over time then performs only the
  hidden-to-hidden conv + gate math per step.  This is the single
  biggest structural win over the reference's per-step Keras ConvLSTM
  (`/root/reference/gan.py:50-85` uses stock ConvLSTM2D).

* ``LSTM`` — same hoisting for the dense input projection
  (``[B*T, F] @ [F, 4U]`` on the MXU), scan does the ``[B,U] @ [U,4U]``
  recurrence.

* ``ConvTranspose2D`` — fractionally-strided conv with TF/Keras 'SAME'
  semantics (``out = in * stride``), expressed via ``lhs_dilation`` so
  XLA lowers it onto the MXU directly.

Gate semantics pinned to the Keras layers the reference instantiates
(verified against the in-image Keras 3.13 oracle by tests):
gate order [i, f, c, o]; activation tanh; recurrent_activation sigmoid;
unit forget bias.  Dropout masks are shared across time (Keras rule);
per-gate input-dropout falls back to a non-hoisted path only when
dropout > 0 (all reference configs default to 0.0).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.ad_checkpoint import checkpoint_name


def _remat(step, policy_name: str, saved_name: str):
    """Wrap a scan body in jax.checkpoint under the given policy.

    ``'carry_only'`` saves nothing but the carry — the backward pass
    recomputes the whole body, including the recurrent conv/matmul
    (minimum HBM, maximum recompute FLOPs).  ``'save_recurrent'`` also
    saves the tagged recurrent-projection output (``saved_name``), so
    the backward pass recomputes only the cheap elementwise gate math —
    it trades [T, B, H', W', 4f] of HBM for skipping the single
    FLOPs-heavy op in the recompute.  Which wins is a pure
    bandwidth-vs-FLOPs tradeoff; both are mathematically identical.
    """
    policy = None
    if policy_name == "save_recurrent":
        policy = jax.checkpoint_policies.save_only_these_names(saved_name)
    elif policy_name != "carry_only":
        raise ValueError(f"unknown remat policy: {policy_name!r}")
    return jax.checkpoint(step, prevent_cse=False, policy=policy)


REMAT_POLICIES = frozenset({"carry_only", "save_recurrent"})
# The flax module names of every remat-wrapped recurrence across the
# four models (encoder pyramid, U-Net decoder, discriminator LSTMs).
REMAT_LAYER_NAMES = frozenset(
    {f"encoder{i}" for i in range(1, 5)}
    | {f"decoder{i}" for i in range(2, 6)}
    | {f"lstm{i}" for i in range(1, 4)}
)


def parse_remat_spec(spec: str) -> tuple[str, dict[str, str]]:
    """Parse + validate a remat-policy spec into (default, overrides).

    Raises ``ValueError`` on unknown policy tokens, unknown layer names,
    or more than one bare default token — a typo like
    ``'decodr5=save_recurrent'`` or ``'carryonly'`` fails HERE (CLI /
    config time) instead of silently no-opping or erroring mid-trace.
    """
    default = "carry_only"
    seen_bare = False
    overrides: dict[str, str] = {}
    for tok in str(spec).split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "=" in tok:
            name, _, pol = tok.partition("=")
            name, pol = name.strip(), pol.strip()
            if name not in REMAT_LAYER_NAMES:
                raise ValueError(
                    f"unknown layer name in remat spec: {name!r} "
                    f"(known: {sorted(REMAT_LAYER_NAMES)})"
                )
            if pol not in REMAT_POLICIES:
                raise ValueError(
                    f"unknown remat policy {pol!r} for layer {name!r} "
                    f"(choices: {sorted(REMAT_POLICIES)})"
                )
            overrides[name] = pol
        else:
            if tok not in REMAT_POLICIES:
                raise ValueError(
                    f"unknown remat policy: {tok!r} "
                    f"(choices: {sorted(REMAT_POLICIES)})"
                )
            if seen_bare:
                raise ValueError(
                    "remat spec has more than one bare default token "
                    f"({spec!r}); use name=policy overrides"
                )
            default, seen_bare = tok, True
    return default, overrides


def resolve_remat_policy(spec: str, layer_name: str) -> str:
    """Resolve a (possibly per-layer) remat-policy spec for one layer.

    The HBM-vs-recompute tradeoff of ``_remat``'s two policies flips
    with layer geometry (compute-heavy big-kernel layers prefer
    ``save_recurrent``; bandwidth-heavy ones ``carry_only``), so the
    config spec supports per-layer overrides:

    * ``'carry_only'`` / ``'save_recurrent'`` — one policy everywhere;
    * a comma list mixing a bare default with ``name=policy``
      overrides, e.g.
      ``'carry_only,decoder4=save_recurrent,decoder5=save_recurrent'``.

    Layer names are the flax module names (``REMAT_LAYER_NAMES``):
    ``encoder1..4``, ``decoder2..5``, ``lstm1..3``.  Specs are
    validated eagerly by ``parse_remat_spec``: unknown layer names,
    unknown policies, and duplicate bare defaults raise ``ValueError``.
    """
    default, overrides = parse_remat_spec(spec)
    return overrides.get(layer_name, default)

__all__ = [
    "ConvLSTM2D",
    "LSTM",
    "parse_remat_spec",
    "resolve_remat_policy",
    "ConvTranspose2D",
    "Conv2D",
    "hard_sigmoid",
    "leaky_relu",
]


_PALLAS_FALLBACK_WARNED: set = set()


def _warn_pallas_fallback(layer: str | None, reason: str) -> None:
    """One-time host-side (trace-time) notice that an explicit
    ``kernel_impl='pallas'`` request fell back to the scan body for this
    layer — without it, a user benchmarking 'pallas' may unknowingly
    measure scan performance for some layers (round-4 ADVICE)."""
    import logging

    key = (layer, reason)
    if key not in _PALLAS_FALLBACK_WARNED:
        _PALLAS_FALLBACK_WARNED.add(key)
        logging.getLogger(__name__).warning(
            "kernel_impl='pallas': layer %s falls back to the lax.scan "
            "body (%s)", layer or "<unnamed>", reason
        )


def hard_sigmoid(x):
    """Keras-3 hard sigmoid: relu6(x + 3) / 6."""
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def leaky_relu(x, negative_slope: float = 0.3):
    """Keras LeakyReLU default slope 0.3 (`gan.py:397` passes no alpha)."""
    return jnp.where(x >= 0, x, negative_slope * x)


_ACTIVATIONS: dict[str, Callable] = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "hard_sigmoid": hard_sigmoid,
    "linear": lambda x: x,
}


def _act(name: str | Callable) -> Callable:
    if callable(name):
        return name
    return _ACTIVATIONS[name]


def _compute_dtype(name: str):
    if name == "bfloat16":
        return jnp.bfloat16
    if name == "float32":
        return jnp.float32
    raise ValueError(f"unsupported compute_dtype: {name!r}")


def _same_conv(x, kernel, strides, dtype=jnp.float32, out_dtype=jnp.float32):
    """NHWC 'SAME' conv (TF semantics).

    ``dtype`` is the MXU input precision: bfloat16 halves HBM traffic and
    doubles systolic-array throughput (params and all gate/norm math
    remain f32 — the output is cast back immediately).  ``out_dtype``
    controls the returned precision: when the result is STREAMED through
    HBM (the hoisted [T,B,H',W',4f] scan stacks), upcasting a bf16 conv
    result to f32 adds zero information but doubles the bytes of the
    biggest copies in the program (tools/hlo_report.py) — pass
    ``out_dtype=dtype`` there and upcast at the consumer.
    """
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), strides, "SAME",
        dimension_numbers=dn,
    )
    # Gate/norm math downstream stays f32.  (No preferred_element_type:
    # its conv transpose rule rejects mixed f32-cotangent/bf16-operand;
    # the TPU MXU accumulates in f32 internally either way.)
    return out.astype(out_dtype)


class ConvLSTM2D(nn.Module):
    """Keras-semantics ConvLSTM2D, scan-based, input conv hoisted.

    Input ``[B, T, H, W, C]`` -> output sequence ``[B, T, H', W', filters]``
    with ``H' = ceil(H / stride)`` ('SAME').
    """

    filters: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    unit_forget_bias: bool = True
    activation: str = "tanh"
    recurrent_activation: str = "sigmoid"
    dropout: float = 0.0
    recurrent_dropout: float = 0.0
    compute_dtype: str = "float32"
    remat: bool = False      # checkpoint the scan body
    remat_policy: str = "carry_only"  # see _remat
    unroll: int = 1          # lax.scan unroll factor
    # Sequence parallelism: when set, the time axis of ``x_seq`` is a
    # SHARD of a global sequence distributed over this mesh axis, and
    # the recurrence runs as a ring-relay scan (parallel/seqpar.py).
    # The module must then be applied inside shard_map with the axis
    # bound and time sharded over it.
    seq_axis: str | None = None
    # MXU-lane packing: 'auto' runs stride-1 small-filter layers (the
    # full-resolution decoder ConvLSTM: 4f = 32 of 128 MXU lanes) on
    # space-to-depth-by-2 tensors — same linear map, 4x fatter
    # channels, ~2.3x fewer MXU tile-passes (models/conv_packing.py).
    # 'off' = bit-replication mode (packing changes reduction order).
    conv_packing: str = "off"
    # Recurrence engine: 'scan' = lax.scan over T (the bit-replication
    # oracle); 'pallas' = the fused single-kernel recurrence
    # (models/pallas_convlstm.py — (h, c) VMEM-resident for all T, no
    # B<->T transposes).  'pallas' silently falls back to 'scan' for
    # the paths the kernel does not cover (dropout, packing, seq_axis,
    # non-sigmoid/tanh activations).
    kernel_impl: str = "scan"
    # Time-major plumbing: when True, ``x_seq`` is ``[T, B, H, W, C]``
    # and the output sequence is returned ``[T, B, H', W', f]`` — the
    # hoisted-conv fold and the scan then need NO B<->T transposes at
    # all (at HEAD those transpose pairs materialize ~3 GB/step of pure
    # layout copies in the flagship program — tools/hlo_report.py).
    # The forward is bit-identical to the batch-major path (the fold is
    # a row permutation of the same per-frame convs); the weight-grad
    # reductions sum rows in a different order (ULP-level).  The
    # carry-state API is unchanged ([B, ...]).
    time_major: bool = False

    def _pack_factor(self, h: int, w: int, training: bool) -> int:
        if (
            self.conv_packing == "auto"
            and self.strides == (1, 1)
            and self.filters <= 16           # 4f <= 64: lane-starved
            and h % 2 == 0 and w % 2 == 0
            and min(h, w) >= 8
            and not (training and (self.dropout > 0.0
                                   or self.recurrent_dropout > 0.0))
        ):
            return 2
        return 1

    @nn.compact
    def __call__(
        self,
        x_seq: jnp.ndarray,
        *,
        training: bool = True,
        initial_state: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        return_state: bool = False,
    ):
        if self.time_major:
            t, b, h, w, c = x_seq.shape
        else:
            b, t, h, w, c = x_seq.shape
        kh, kw = self.kernel_size
        f = self.filters
        act = _act(self.activation)
        rec_act = _act(self.recurrent_activation)
        cdt = _compute_dtype(self.compute_dtype)

        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (kh, kw, c, 4 * f)
        )
        rec_kernel = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (kh, kw, f, 4 * f)
        )
        if self.use_bias:
            if self.unit_forget_bias:
                def bias_init(key, shape, dtype=jnp.float32):
                    del key
                    bz = jnp.zeros((f,), dtype)
                    return jnp.concatenate([bz, jnp.ones((f,), dtype), bz, bz])

                bias = self.param("bias", bias_init, (4 * f,))
            else:
                bias = self.param("bias", nn.initializers.zeros, (4 * f,))
        else:
            bias = None

        use_in_dropout = training and self.dropout > 0.0
        use_rec_dropout = training and self.recurrent_dropout > 0.0

        r = self._pack_factor(h, w, training)
        if r > 1:
            # Space-to-depth packing (models/conv_packing.py): both the
            # hoisted input conv and the per-step recurrent conv run in
            # block space with (gate, group, f)-ordered outputs, so the
            # scan body below is unchanged — each gate slice is the s2d
            # layout the next step's rconv consumes.  One d2s on the
            # output stack (and the final carry) restores frame layout.
            from .conv_packing import (
                gate_major, pack_kernel, packed_same_conv, space_to_depth,
            )

            k_packed = gate_major(pack_kernel(kernel, r), r * r)
            rk_packed = gate_major(pack_kernel(rec_kernel, r), r * r)
            if bias is not None:
                bias_eff = jnp.broadcast_to(
                    bias.reshape(4, 1, f), (4, r * r, f)
                ).reshape(4 * r * r * f)
            else:
                bias_eff = None
            fold = (
                x_seq.reshape(t * b, h, w, c)
                if self.time_major
                else x_seq.reshape(b * t, h, w, c)
            )
            xconv = packed_same_conv(
                space_to_depth(fold, r),
                k_packed, (kh, kw), r, cdt, out_dtype=cdt,
            )
            ho, wo = xconv.shape[1], xconv.shape[2]
            fr = f * r * r  # per-gate packed channel count
            if self.time_major:
                xconv = xconv.reshape(t, b, ho, wo, 4 * fr)
            else:
                xconv = (
                    xconv.reshape(b, t, ho, wo, 4 * fr).transpose(1, 0, 2, 3, 4)
                )

            def rconv_fn(h_prev):
                return packed_same_conv(
                    h_prev, rk_packed, (kh, kw), r, cdt
                )
        elif use_in_dropout:
            # Keras: 4 independent input-dropout masks (one per gate),
            # shared across time.  Linearity of conv lets us apply the
            # masks pre-conv; requires per-gate convs (slow path).
            rng = self.make_rng("dropout")
            keys = jax.random.split(rng, 4)
            masks = [
                jax.random.bernoulli(k, 1.0 - self.dropout, (b, h, w, c)).astype(
                    x_seq.dtype
                )
                / (1.0 - self.dropout)
                for k in keys
            ]
            # Time-major fold here: `tile` repeats the [B,...] mask
            # block T times, so row j*b+i gets sample i's mask ONLY when
            # T is the outer fold axis (a B-major fold would misalign
            # masks across samples).  A time-major input is already in
            # that layout — no transpose needed.
            xf = (
                x_seq.reshape(t * b, h, w, c)
                if self.time_major
                else x_seq.transpose(1, 0, 2, 3, 4).reshape(t * b, h, w, c)
            )
            parts = []
            for g in range(4):
                kg = kernel[..., g * f : (g + 1) * f]
                mg = jnp.tile(masks[g], (t, 1, 1, 1))
                parts.append(_same_conv(xf * mg, kg, self.strides, cdt))
            xconv = jnp.concatenate(parts, axis=-1)
            ho, wo = xconv.shape[1], xconv.shape[2]
            xconv = xconv.reshape(t, b, ho, wo, 4 * f)
            fr, bias_eff, rconv_fn = f, bias, None
        else:
            # Stream the hoisted stack at conv-output precision and add
            # the bias inside the scan body instead: values are identical
            # ((conv + bias) + rconv either way), and under bf16 it
            # halves the program's largest HBM copies (the [T,B,H',W',4f]
            # scan input stack and its transpose — tools/hlo_report.py).
            # (A time-major fold that transposes the small input instead
            # was measured SLOWER end-to-end: 169.0 vs 161.5 ms — XLA
            # lays out the B-major fold + output transpose better.)
            xconv = _same_conv(
                x_seq.reshape(t * b if self.time_major else b * t, h, w, c),
                kernel, self.strides, cdt,
                out_dtype=cdt,
            )
            ho, wo = xconv.shape[1], xconv.shape[2]
            use_pallas = (
                self.kernel_impl == "pallas"
                and not use_rec_dropout
                and self.seq_axis is None
                and not self.time_major  # the kernel speaks [B, T, ...]
                and self.activation == "tanh"
                and self.recurrent_activation == "sigmoid"
            )
            if self.kernel_impl == "pallas" and not use_pallas:
                _warn_pallas_fallback(
                    self.name,
                    "recurrent dropout, a seq_axis, time_major layout, or "
                    "non-default activations are not covered by the fused "
                    "kernel",
                )
            if use_pallas:
                # Scoped-VMEM feasibility: fat-channel layers whose
                # weight copy / dW accumulator exceed Mosaic's stack
                # limit fall back to the scan body (e.g. encoder4 at
                # filter_size=16: the bf16 rk copy alone is 105 MiB).
                from .pallas_convlstm import fits_vmem

                use_pallas = fits_vmem(
                    ho, wo, f,
                    self.kernel_size[0], self.kernel_size[1],
                    jnp.dtype(cdt).itemsize,
                )
                if not use_pallas:
                    _warn_pallas_fallback(
                        self.name,
                        f"shape [b={b}, {ho}x{wo}, f={f}, "
                        f"k={self.kernel_size[0]}x{self.kernel_size[1]}] "
                        "exceeds the Mosaic scoped-VMEM stack model "
                        "(pallas_convlstm.fits_vmem)",
                    )
            if use_pallas:
                # Fused single-kernel recurrence: consumes the hoisted
                # stack in its natural [B, T, ...] layout (no B<->T
                # transpose pair) and keeps (h, c) in VMEM for all T.
                from .pallas_convlstm import convlstm_scan_pallas

                xconv_bt = xconv.reshape(b, t, ho, wo, 4 * f)
                if initial_state is None:
                    h0p = jnp.zeros((b, ho, wo, f), jnp.float32)
                    c0p = jnp.zeros((b, ho, wo, f), jnp.float32)
                else:
                    h0p, c0p = initial_state
                bias_p = (
                    bias if bias is not None
                    else jnp.zeros((4 * f,), jnp.float32)
                )
                out, carry = convlstm_scan_pallas(
                    xconv_bt, h0p, c0p, rec_kernel, bias_p,
                    self.activation, self.recurrent_activation,
                )
                out = out.astype(jnp.float32)
                if return_state:
                    return out, carry
                return out
            if self.time_major:
                # already [T*B, ...]: the scan stack needs NO transpose
                xconv = xconv.reshape(t, b, ho, wo, 4 * f)
            else:
                # [B*T, H', W', 4f] -> [T, B, H', W', 4f] for scan
                xconv = xconv.reshape(b, t, ho, wo, 4 * f).transpose(1, 0, 2, 3, 4)
            fr, bias_eff, rconv_fn = f, bias, None

        if use_rec_dropout:
            rng = self.make_rng("dropout")
            keys = jax.random.split(rng, 4)
            rec_masks = jnp.stack(
                [
                    jax.random.bernoulli(
                        k, 1.0 - self.recurrent_dropout, (b, ho, wo, f)
                    ).astype(x_seq.dtype)
                    / (1.0 - self.recurrent_dropout)
                    for k in keys
                ]
            )
        else:
            rec_masks = None

        def step(carry, xt):
            h_prev, c_prev = carry
            if rconv_fn is not None:
                rconv = rconv_fn(h_prev)
            elif rec_masks is None:
                rconv = _same_conv(h_prev, rec_kernel, (1, 1), cdt)
            else:
                parts = []
                for g in range(4):
                    kg = rec_kernel[..., g * f : (g + 1) * f]
                    parts.append(_same_conv(h_prev * rec_masks[g], kg, (1, 1), cdt))
                rconv = jnp.concatenate(parts, axis=-1)
            rconv = checkpoint_name(rconv, "rconv")
            xt32 = xt.astype(jnp.float32)
            if bias_eff is not None:
                xt32 = xt32 + bias_eff
            z = xt32 + rconv
            zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
            i = rec_act(zi)
            fg = rec_act(zf)
            cc = fg * c_prev + i * act(zc)
            o = rec_act(zo)
            hh = o * act(cc)
            # ys streams through HBM (and one layout transpose) at
            # compute precision; every consumer is an MXU conv that
            # casts back down anyway.  The (h, c) carry stays f32.
            return (hh, cc), hh.astype(cdt)

        if self.remat:
            # The scan's saved residuals ([T, B, H', W', ~10f] activation
            # stacks) dominate HBM traffic; checkpointing trades them for
            # recompute in the backward pass (policy controls how much).
            step = _remat(step, self.remat_policy, "rconv")

        if initial_state is None:
            h0 = jnp.zeros((b, ho, wo, fr), dtype=jnp.float32)
            c0 = jnp.zeros((b, ho, wo, fr), dtype=jnp.float32)
        else:
            h0, c0 = initial_state
            if r > 1:
                # carry-state API speaks frame layout at the boundary
                from .conv_packing import space_to_depth as _s2d

                h0, c0 = _s2d(h0, r), _s2d(c0, r)
        if self.seq_axis is not None:
            # Deferred import: ..parallel's package __init__ pulls in
            # train.steps -> models -> this module (cycle at import time).
            from ..parallel.seqpar import time_sharded_scan

            carry, out = time_sharded_scan(
                step, (h0, c0), xconv, axis_name=self.seq_axis
            )
        else:
            carry, out = lax.scan(step, (h0, c0), xconv, unroll=self.unroll)
        # Transpose in compute precision, hand back f32 at the module
        # boundary (consumers' casts fuse with this convert).  Under
        # time_major the scan's natural [T, B, ...] output IS the
        # boundary layout — no transpose.
        if self.time_major:
            out = out.astype(jnp.float32)
        else:
            out = out.transpose(1, 0, 2, 3, 4).astype(jnp.float32)
        if r > 1:
            from .conv_packing import depth_to_space as _d2s

            out = _d2s(out, r)
            if return_state:
                hn, cn = carry
                return out, (_d2s(hn, r), _d2s(cn, r))
        if return_state:
            return out, carry
        return out


class LSTM(nn.Module):
    """Keras-semantics dense LSTM over ``[B, T, F]`` -> ``[B, T, units]``.

    Input projection hoisted to one ``[B*T, F] @ [F, 4U]`` matmul.
    Mirrors the discriminator's RNN stack (`gan.py:411-418`).
    """

    units: int
    activation: str = "tanh"
    recurrent_activation: str = "sigmoid"
    unit_forget_bias: bool = True
    compute_dtype: str = "float32"
    remat: bool = False
    remat_policy: str = "carry_only"  # see _remat
    unroll: int = 1
    seq_axis: str | None = None  # same contract as ConvLSTM2D.seq_axis
    # Recurrence engine: 'scan' = lax.scan over T (bit-replication
    # oracle); 'pallas' = the fused single-kernel recurrence
    # (models/pallas_lstm.py).  'pallas' silently falls back to 'scan'
    # for paths the kernel does not cover (seq_axis, activations other
    # than tanh/sigmoid over a sigmoid recurrent activation).
    kernel_impl: str = "scan"

    @nn.compact
    def __call__(self, x_seq: jnp.ndarray, *, training: bool = True) -> jnp.ndarray:
        b, t, feat = x_seq.shape
        u = self.units
        act = _act(self.activation)
        rec_act = _act(self.recurrent_activation)
        cdt = _compute_dtype(self.compute_dtype)

        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (feat, 4 * u)
        )
        rec_kernel = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (u, 4 * u)
        )

        def bias_init(key, shape, dtype=jnp.float32):
            del key
            bz = jnp.zeros((u,), dtype)
            fb = jnp.ones((u,), dtype) if self.unit_forget_bias else bz
            return jnp.concatenate([bz, fb, bz, bz])

        bias = self.param("bias", bias_init, (4 * u,))

        # Streamed at matmul-output precision, bias added in the body
        # (identical values; halves the stack bytes under bf16 — same
        # rationale as ConvLSTM2D's hoisted stack).
        xproj = lax.dot_general(
            x_seq.reshape(b * t, feat).astype(cdt),
            kernel.astype(cdt),
            dimension_numbers=(((1,), (0,)), ((), ())),
        )

        use_pallas = (
            self.kernel_impl == "pallas"
            and self.seq_axis is None
            and self.activation in ("tanh", "sigmoid")
            and self.recurrent_activation == "sigmoid"
            # Mosaic can't lay out the [bt, 4u] <-> [bt, 1, 1, 4u]
            # stores when the gate width is under one 128-lane vreg
            # ("infer-vector-layout: unsupported shape cast", measured
            # at u=8 on v5e) — and the per-step work there is too small
            # for the fused kernel to win anyway, so fall back to scan.
            # TPU-only: interpret mode (how tests exercise the kernel
            # on CPU) has no such layout constraint.
            and (4 * self.units >= 128 or jax.default_backend() != "tpu")
        )
        if self.kernel_impl == "pallas" and not use_pallas:
            _warn_pallas_fallback(
                self.name,
                "a seq_axis, non-default activations, or a gate width "
                "under one 128-lane vreg is not covered by the fused "
                "LSTM kernel",
            )
        if use_pallas:
            # Fused single-kernel recurrence: consumes the hoisted
            # projection in its natural [B, T, 4U] layout (no B<->T
            # transpose pair) and keeps (h, c) in VMEM for all T.
            from .pallas_lstm import lstm_scan_pallas

            h0 = jnp.zeros((b, u), dtype=jnp.float32)
            c0 = jnp.zeros((b, u), dtype=jnp.float32)
            out, _ = lstm_scan_pallas(
                xproj.reshape(b, t, 4 * u), h0, c0, rec_kernel, bias,
                self.activation, self.recurrent_activation,
            )
            return out.astype(jnp.float32)

        xproj = xproj.reshape(b, t, 4 * u).transpose(1, 0, 2)

        def step(carry, xt):
            h_prev, c_prev = carry
            rproj = checkpoint_name(
                lax.dot_general(
                    h_prev.astype(cdt), rec_kernel.astype(cdt),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                ).astype(jnp.float32),
                "rproj",
            )
            z = (xt.astype(jnp.float32) + bias) + rproj
            zi, zf, zc, zo = jnp.split(z, 4, axis=-1)
            i = rec_act(zi)
            fg = rec_act(zf)
            cc = fg * c_prev + i * act(zc)
            o = rec_act(zo)
            hh = o * act(cc)
            return (hh, cc), hh.astype(cdt)

        if self.remat:
            step = _remat(step, self.remat_policy, "rproj")
        h0 = jnp.zeros((b, u), dtype=jnp.float32)
        c0 = jnp.zeros((b, u), dtype=jnp.float32)
        if self.seq_axis is not None:
            from ..parallel.seqpar import time_sharded_scan

            _, out = time_sharded_scan(
                step, (h0, c0), xproj, axis_name=self.seq_axis
            )
        else:
            _, out = lax.scan(step, (h0, c0), xproj, unroll=self.unroll)
        return out.transpose(1, 0, 2).astype(jnp.float32)


class Conv2D(nn.Module):
    """TF-'SAME' Conv2D on ``[N, H, W, C]`` (Keras weight layout)."""

    filters: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (kh, kw, x.shape[-1], self.filters),
        )
        out = _same_conv(x, kernel, self.strides, _compute_dtype(self.compute_dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            out = out + bias
        return out


class ConvTranspose2D(nn.Module):
    """Transposed conv with TF/Keras 'SAME' semantics: ``out = in * stride``.

    Expressed as an input-dilated conv so XLA maps it straight onto the
    MXU.  Kernel stored in Keras Conv2DTranspose layout
    ``(kh, kw, filters, in_ch)`` so oracle weights port 1:1.
    """

    filters: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = True
    activation: str | None = None
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        sh, sw = self.strides
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (kh, kw, self.filters, c_in),
        )
        # Gradient-of-conv formulation: flip spatial taps, swap in/out.
        k = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)

        def pad_for(ksize, stride):
            # forward-'SAME' total pad for out=in*s is k - s (here k >= s)
            pad_total = max(ksize - stride, 0)
            pb = pad_total // 2
            pa = pad_total - pb
            return (ksize - 1 - pb, ksize - 1 - pa)

        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        cdt = _compute_dtype(self.compute_dtype)
        out = lax.conv_general_dilated(
            x.astype(cdt),
            k.astype(cdt),
            window_strides=(1, 1),
            padding=[pad_for(kh, sh), pad_for(kw, sw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=dn,
        ).astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            out = out + bias
        if self.activation is not None:
            out = _act(self.activation)(out)
        return out
