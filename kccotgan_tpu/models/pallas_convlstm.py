"""Fused Pallas ConvLSTM recurrence: the whole T-loop in one kernel.

Why this exists (PARITY.md roofline): ~90% of the flagship train step is
the encoder/decoder ConvLSTM scans, at 17% MFU / 36% HBM — i.e. bound by
per-step latency, not by FLOPs or bandwidth.  Under ``lax.scan`` every
timestep round-trips the (h, c) carry through HBM and re-launches the
fused loop body; the B<->T transposes around the scan add the largest
layout copies in the program (tools/hlo_report.py).  This kernel runs
the ENTIRE recurrence in one ``pallas_call``:

* grid = (batch_tiles, T) — TPU executes the grid sequentially, so the
  (h, c) state lives in VMEM scratch across all T steps of a batch tile
  (zero carry HBM traffic);
* the hoisted input-conv stack streams in per step straight from its
  natural ``[B, T, H', W', 4f]`` layout (Pallas block indexing replaces
  the [B,T]<->[T,B] transpose pair the scan needed);
* the recurrent conv runs as kh*kw shifted MXU matmuls accumulated in
  f32, rounded once to the compute dtype — bit-matching
  ``layers._same_conv``'s conv(bf16)->f32 semantics;
* gate math (sigmoid/tanh, Keras order [i, f, c, o]) fuses on the VPU
  with everything resident.

Semantics pinned to ``layers.ConvLSTM2D``'s scan body (the no-dropout,
no-packing path — the only configs the reference defaults to;
`/root/reference/gan.py:50-85` uses stock Keras ConvLSTM2D).  Exactness
vs the scan path is pinned in tests/test_pallas_convlstm.py.

The backward pass is a second reverse-T kernel under ``jax.custom_vjp``:
it recomputes the gates from the saved (h, c) stacks (the classic RNN
adjoint; cuDNN saves gates instead — at these shapes recompute is cheap
and the stacks are already needed as layer outputs), accumulating dW/db
in VMEM across the whole grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["convlstm_scan_pallas", "fits_vmem"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Mosaic's default scoped-VMEM stack limit is 16 MiB
# (--xla_tpu_scoped_vmem_limit_kib); the fused recurrence needs more for
# its double-buffered time blocks + f32 gate temporaries at the large
# encoder shapes (measured 28.6 MiB at enc1 bt=4).  v5e/v6e cores have
# 128 MiB of VMEM; cap well under that so prefetch/infeed keep headroom.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# The reverse-time kernel carries the dW accumulator (plus the rk block
# and the drk output) resident for the whole grid — at enc4's f=256
# that fixed set alone is ~92 MiB of stack, so the bwd gets a higher
# ceiling and its own batch-tile model (below).
_VMEM_LIMIT_BWD = pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024)

# Feasibility/tiling budgets DERIVED from the compiler limits above (so
# the predicate and the compiler params cannot drift apart — round-4
# ADVICE).  The headroom margins are the v5e calibration slack: the
# stack models below underestimate Mosaic's true accounting by a few
# MiB at the measured anchor shapes, so the budgets sit 5 / 7 / 17 MiB
# under the respective limits (fwd: 95 MiB vs the 100 MiB limit; bwd
# stack: 105 MiB vs 112; bwd batch-tile: 95 MiB vs 112 — the tile
# model's per-sample terms carry the larger error).
_FWD_STACK_BUDGET = _VMEM_LIMIT.vmem_limit_bytes - 5 * 1024 * 1024
_BWD_STACK_BUDGET = _VMEM_LIMIT_BWD.vmem_limit_bytes - 7 * 1024 * 1024
_BWD_TILE_BUDGET = _VMEM_LIMIT_BWD.vmem_limit_bytes - 17 * 1024 * 1024


def _bwd_batch_tile(
    b: int, ho: int, wo: int, f: int, kh: int, kw: int, itemsize: int
) -> int:
    """Batch tile for the reverse-time kernel.

    Calibrated against Mosaic's measured stack sizes on v5e (enc4
    f=256: 118.6 MiB at bt=32; dec5 f=8 k=8: 126 MiB at bt=2): a fixed
    weight term ~3.5x the lane-padded drk bytes (rk block + drk output
    + drk scratch and their buffers), plus a per-sample term covering
    the double-buffered sequence blocks, state blocks/scratch, and the
    f32 gate temporaries.  Channel dims are billed at >=128 lanes.
    """
    lane = 128
    s = ho * wo
    f4p, fp = max(4 * f, lane), max(f, lane)
    per = s * (
        4 * itemsize * f4p      # x_t double buffer
        + 4 * itemsize * f4p    # dx double buffer
        + 4 * itemsize * fp     # y_prev + dy double buffers
        + 8 * fp                # cs_prev f32 double buffer
        + 32 * fp               # h0/c0/dhn/dcn/dh0/dc0 f32 blocks
        + 8 * fp                # dh/dc f32 scratch
        + 16 * f4p              # z/dz/acc/gate f32 live set
        + 2 * itemsize * f4p    # padded hp/dzp temporaries
    )
    per *= 1.3  # measured-vs-model safety (dec5: 126 MiB actual at bt=2)
    fixed = 3.5 * 4 * kh * kw * f * f4p
    budget = _BWD_TILE_BUDGET - fixed
    bt = b
    while bt > 1 and per * bt > budget:
        bt -= 1
        while b % bt:
            bt -= 1
    return bt


def fits_vmem(
    ho: int, wo: int, f: int, kh: int, kw: int, itemsize: int
) -> bool:
    """Can the fused kernels fit Mosaic's scoped-VMEM stack at this
    layer shape (any batch tile)?

    The models mirror the measured stack accounting that calibrated
    `_batch_tile`/`_bwd_batch_tile`:

    * fwd: the dominant fixed term is the compute-dtype copy of the
      whole recurrent kernel [kh, kw, f, 4f] (measured: enc4 at
      f=512/k=5/bf16 → 105 MiB weight copy, 108.54 MiB total stack vs
      the 100 MiB limit — the OOM this predicate exists to pre-empt),
      plus the per-sample double-buffered blocks at bt=1.
    * bwd: the fixed ~3.5× f32-weight term from `_bwd_batch_tile`
      plus its per-sample set at bt=1.

    Layers that don't fit fall back to the lax.scan body (dispatch in
    layers.ConvLSTM2D) — same math, different schedule.
    """
    lane = 128
    f4p, fp = max(4 * f, lane), max(f, lane)
    s = ho * wo
    # fwd
    fwd_fixed = kh * kw * f * f4p * itemsize  # cdt weight copy
    fwd_per = s * (
        4 * itemsize * f4p     # x_t double buffer
        + 2 * itemsize * fp    # y_t double buffer
        + 8 * fp               # cs f32 double buffer
        + 24 * fp              # h0/c0/hn/cn blocks + h/c scratch (f32)
        + 8 * f4p              # f32 gate accumulator + z live set
        + 2 * itemsize * f4p   # padded-h temporary
    )
    if 1.1 * fwd_fixed + fwd_per > _FWD_STACK_BUDGET:
        return False
    # bwd (terms from _bwd_batch_tile; calibration anchors: enc4-f8
    # fixed 91.75 MiB + per(bt<=32) fits under the 112 MiB limit,
    # dec5-f8 per(bt=1) ~63 MiB fits, enc4-f16 fixed 367 MiB must not)
    bwd_fixed = 3.5 * 4 * kh * kw * f * f4p
    bwd_per = 1.3 * s * (
        4 * itemsize * f4p + 4 * itemsize * f4p + 4 * itemsize * fp
        + 8 * fp + 32 * fp + 8 * fp + 16 * f4p + 2 * itemsize * f4p
    )
    return bwd_fixed + bwd_per <= _BWD_STACK_BUDGET


def _act(name: str):
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "hard_sigmoid":
        return lambda x: jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)
    if name == "linear":
        return lambda x: x
    raise ValueError(f"unsupported activation for pallas convlstm: {name!r}")


def _same_pads(k: int) -> tuple[int, int]:
    # TF/XLA 'SAME', stride 1: total = k-1, low = floor((k-1)/2).
    lo = (k - 1) // 2
    return lo, (k - 1) - lo


def _batch_tile(b: int, ho: int, wo: int, f: int, itemsize: int) -> int:
    """Largest divisor of b keeping the resident VMEM well under budget.

    Per-sample resident bytes: x_t [ho,wo,4f] cdt (double-buffered),
    y_t [ho,wo,f] cdt, h/c scratch f32 x2, rconv accumulator [ho,wo,4f]
    f32, padded-h temp.  Lane padding: a minor dim under 128 still
    occupies full (8, 128) VMEM tiles, so bill every channel dim at
    max(ch, 128 per 8 sublanes) -- approximated here by the x4 worst
    case for f < 32.
    """
    pad = max(1.0, 32.0 / f)  # crude lane-padding inflation factor
    per = ho * wo * (
        4 * f * itemsize * 2      # x_t double buffer
        + f * itemsize            # y_t
        + 2 * f * 4 * 2 * pad     # h,c scratch + padded-h temp
        + 4 * f * 4               # f32 gate accumulator
    )
    budget = 10 * 1024 * 1024
    bt = b
    while bt > 1 and per * bt > budget:
        # walk down through divisors of b
        bt -= 1
        while b % bt:
            bt -= 1
    return bt


def _fwd_kernel(x_ref, h0_ref, c0_ref, rk_ref, b_ref, y_ref, cs_ref,
                hn_ref, cn_ref, h_scr, c_scr, *,
                kh, kw, act, rec_act, cdt, t_total):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    bt, ho, wo, f = h.shape

    # Recurrent 'SAME' conv as kh*kw shifted matmuls, f32-accumulated,
    # rounded ONCE to the compute dtype — identical reduction semantics
    # to lax.conv(bf16) -> .astype(f32) in layers._same_conv.
    plo_h, phi_h = _same_pads(kh)
    plo_w, phi_w = _same_pads(kw)
    hp = jnp.pad(
        h.astype(cdt), ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0))
    )
    rk = rk_ref[:]  # [kh, kw, f, 4f]
    acc = jnp.zeros((bt * ho * wo, 4 * f), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            sl = hp[:, ky:ky + ho, kx:kx + wo, :].reshape(bt * ho * wo, f)
            acc = acc + jnp.dot(
                sl, rk[ky, kx].astype(cdt),
                preferred_element_type=jnp.float32,
            )
    rconv = acc.astype(cdt).astype(jnp.float32).reshape(bt, ho, wo, 4 * f)

    z = x_ref[:, 0].astype(jnp.float32) + b_ref[:] + rconv
    zi = z[..., :f]
    zf = z[..., f:2 * f]
    zc = z[..., 2 * f:3 * f]
    zo = z[..., 3 * f:]
    i = rec_act(zi)
    fg = rec_act(zf)
    cc = fg * c + i * act(zc)
    o = rec_act(zo)
    hh = o * act(cc)

    h_scr[:] = hh
    c_scr[:] = cc
    y_ref[:, 0] = hh.astype(cdt)
    cs_ref[:, 0] = cc

    @pl.when(t == t_total - 1)
    def _():
        hn_ref[:] = hh
        cn_ref[:] = cc


def _fwd(xconv, h0, c0, rec_kernel, bias, activation, recurrent_activation):
    b, t, ho, wo, f4 = xconv.shape
    f = f4 // 4
    cdt = xconv.dtype
    bt = _batch_tile(b, ho, wo, f, jnp.dtype(cdt).itemsize)
    nb = b // bt

    kh, kw = rec_kernel.shape[0], rec_kernel.shape[1]
    kern = partial(
        _fwd_kernel,
        kh=kh, kw=kw,
        act=_act(activation), rec_act=_act(recurrent_activation),
        cdt=cdt, t_total=t,
    )
    y, c_stack, h_n, c_n = pl.pallas_call(
        kern,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((bt, 1, ho, wo, f4), lambda i, tt: (i, tt, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, f), lambda i, tt: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, f), lambda i, tt: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rec_kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [4f]
        ],
        out_specs=[
            pl.BlockSpec((bt, 1, ho, wo, f), lambda i, tt: (i, tt, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, ho, wo, f), lambda i, tt: (i, tt, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, f), lambda i, tt: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, ho, wo, f), lambda i, tt: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, ho, wo, f), cdt),          # y
            jax.ShapeDtypeStruct((b, t, ho, wo, f), jnp.float32),  # c_stack
            jax.ShapeDtypeStruct((b, ho, wo, f), jnp.float32),     # h_n
            jax.ShapeDtypeStruct((b, ho, wo, f), jnp.float32),     # c_n
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, ho, wo, f), jnp.float32),
            pltpu.VMEM((bt, ho, wo, f), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=_interpret(),
    )(xconv, h0, c0, rec_kernel, bias)
    return y, c_stack, h_n, c_n


def _bwd_kernel(x_ref, y_ref, cs_ref, h0_ref, c0_ref, rk_ref, b_ref,
                dy_ref, dhn_ref, dcn_ref,
                dx_ref, dh0_ref, dc0_ref, drk_ref, db_ref,
                dh_scr, dc_scr, drk_scr, db_scr, *,
                kh, kw, act, rec_act, cdt, t_total):
    """Reverse-time adjoint.  Grid = (nb, T); step tt visits global time
    t = T-1-tt.  Recomputes the gates from (x_t, h_{t-1}, c_{t-1}) — the
    saved stacks — then pushes cotangents through the cell.  dW/db
    accumulate in f32 VMEM scratch across the ENTIRE grid (all batch
    tiles and steps) and are written once at the last grid step.
    """
    tt = pl.program_id(1)
    ib = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(jnp.logical_and(ib == 0, tt == 0))
    def _():
        drk_scr[:] = jnp.zeros_like(drk_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    @pl.when(tt == 0)
    def _():
        dh_scr[:] = dhn_ref[:]
        dc_scr[:] = dcn_ref[:]

    # h_{t-1}, c_{t-1}: block index maps deliver y/cs at t-1 (clamped at
    # t=0); substitute (h0, c0) when this is the first step.
    first = tt == t_total - 1
    h_prev = jnp.where(first, h0_ref[:], y_ref[:, 0].astype(jnp.float32))
    c_prev = jnp.where(first, c0_ref[:], cs_ref[:, 0])

    bt, ho, wo, f = h_prev.shape
    plo_h, phi_h = _same_pads(kh)
    plo_w, phi_w = _same_pads(kw)
    rk = rk_ref[:]

    # ---- recompute forward gates for step t ----
    hp = jnp.pad(
        h_prev.astype(cdt), ((0, 0), (plo_h, phi_h), (plo_w, phi_w), (0, 0))
    )
    acc = jnp.zeros((bt * ho * wo, 4 * f), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            sl = hp[:, ky:ky + ho, kx:kx + wo, :].reshape(bt * ho * wo, f)
            acc = acc + jnp.dot(
                sl, rk[ky, kx].astype(cdt),
                preferred_element_type=jnp.float32,
            )
    rconv = acc.astype(cdt).astype(jnp.float32).reshape(bt, ho, wo, 4 * f)
    z = x_ref[:, 0].astype(jnp.float32) + b_ref[:] + rconv
    i = rec_act(z[..., :f])
    fg = rec_act(z[..., f:2 * f])
    g = act(z[..., 2 * f:3 * f])
    o = rec_act(z[..., 3 * f:])
    c_t = fg * c_prev + i * g
    tc = act(c_t)

    # ---- adjoint of the cell ----
    dh = dh_scr[:] + dy_ref[:, 0].astype(jnp.float32)
    dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
    do = dh * tc
    di = dc * g
    dfg = dc * c_prev
    dg = dc * i
    # sigmoid'(z) = s(1-s); tanh'(z) = 1-t^2 (rec_act/act are fixed to
    # these two by the layer's use_pallas dispatch condition).
    dzi = di * i * (1.0 - i)
    dzf = dfg * fg * (1.0 - fg)
    dzc = dg * (1.0 - g * g)
    dzo = do * o * (1.0 - o)
    dz = jnp.concatenate([dzi, dzf, dzc, dzo], axis=-1)  # [bt,ho,wo,4f]

    dx_ref[:, 0] = dz.astype(dx_ref.dtype)
    db_scr[0, :] = db_scr[0, :] + jnp.sum(
        dz.reshape(bt * ho * wo, 4 * f), axis=0
    )

    # dh_prev = 'transposed conv': correlate dz with rk flipped, summing
    # over output channels.  out[y] = sum_ky dz[y + lo - ky] @ rk[ky].T
    dzp = jnp.pad(
        dz.astype(cdt),
        ((0, 0), (phi_h, plo_h), (phi_w, plo_w), (0, 0)),
    )
    dacc = jnp.zeros((bt * ho * wo, f), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            sl = dzp[:, kh - 1 - ky:kh - 1 - ky + ho,
                     kw - 1 - kx:kw - 1 - kx + wo, :]
            dacc = dacc + jnp.dot(
                sl.reshape(bt * ho * wo, 4 * f),
                rk[ky, kx].astype(cdt).T,
                preferred_element_type=jnp.float32,
            )
    dh_prev = dacc.reshape(bt, ho, wo, f)

    # dW[ky,kx] += shifted(h_prev)^T @ dz   (contraction over bt*ho*wo)
    dzf32 = dz.reshape(bt * ho * wo, 4 * f).astype(cdt)
    for ky in range(kh):
        for kx in range(kw):
            sl = hp[:, ky:ky + ho, kx:kx + wo, :].reshape(bt * ho * wo, f)
            drk_scr[ky, kx] = drk_scr[ky, kx] + jax.lax.dot_general(
                sl, dzf32,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    dh_scr[:] = dh_prev
    dc_scr[:] = dc * fg

    @pl.when(tt == t_total - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]

    @pl.when(jnp.logical_and(ib == nb - 1, tt == t_total - 1))
    def _():
        drk_ref[:] = drk_scr[:]
        db_ref[:] = db_scr[:]


def _bwd(xconv, h0, c0, rec_kernel, bias, y, c_stack,
         dy, dh_n, dc_n, activation, recurrent_activation):
    b, t, ho, wo, f4 = xconv.shape
    f = f4 // 4
    cdt = xconv.dtype
    kh, kw = rec_kernel.shape[0], rec_kernel.shape[1]
    bt = _bwd_batch_tile(b, ho, wo, f, kh, kw, jnp.dtype(cdt).itemsize)
    nb = b // bt

    kern = partial(
        _bwd_kernel,
        kh=kh, kw=kw,
        act=_act(activation), rec_act=_act(recurrent_activation),
        cdt=cdt, t_total=t,
    )

    def rev(i, tt):
        return (i, t - 1 - tt, 0, 0, 0)

    def rev_prev(i, tt):
        # block at global t-1 (clamped; t=0 substitutes h0/c0 in-kernel)
        return (i, jnp.maximum(t - 2 - tt, 0), 0, 0, 0)

    state_spec = pl.BlockSpec(
        (bt, ho, wo, f), lambda i, tt: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    seq_spec = lambda imap, ch: pl.BlockSpec(  # noqa: E731
        (bt, 1, ho, wo, ch), imap, memory_space=pltpu.VMEM
    )

    dx, dh0, dc0, drk, db = pl.pallas_call(
        kern,
        grid=(nb, t),
        in_specs=[
            seq_spec(rev, f4),        # x_t
            seq_spec(rev_prev, f),    # y at t-1  (h_prev)
            seq_spec(rev_prev, f),    # c_stack at t-1
            state_spec,               # h0
            state_spec,               # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rec_kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            seq_spec(rev, f),         # dy
            state_spec,               # dh_n
            state_spec,               # dc_n
        ],
        out_specs=[
            seq_spec(rev, f4),        # dx
            state_spec,               # dh0
            state_spec,               # dc0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # drk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, ho, wo, f4), cdt),
            jax.ShapeDtypeStruct((b, ho, wo, f), jnp.float32),
            jax.ShapeDtypeStruct((b, ho, wo, f), jnp.float32),
            jax.ShapeDtypeStruct((kh, kw, f, 4 * f), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * f), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, ho, wo, f), jnp.float32),
            pltpu.VMEM((bt, ho, wo, f), jnp.float32),
            pltpu.VMEM((kh, kw, f, 4 * f), jnp.float32),
            pltpu.VMEM((1, 4 * f), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT_BWD,
        interpret=_interpret(),
    )(xconv, y, c_stack, h0, c0, rec_kernel, bias, dy, dh_n, dc_n)
    return dx, dh0, dc0, drk, db[0]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def convlstm_scan_pallas(
    xconv, h0, c0, rec_kernel, bias,
    activation="tanh", recurrent_activation="sigmoid",
):
    """Fused ConvLSTM recurrence over ``xconv [B, T, H', W', 4f]``.

    ``xconv`` is the hoisted input conv (+ nothing else: bias is added
    in-kernel, matching ``layers.ConvLSTM2D``'s streamed-stack path) at
    compute precision.  Returns ``(y [B,T,H',W',f] cdt,
    (h_n, c_n) f32)`` — the same contract as the layer's lax.scan.
    """
    y, _, h_n, c_n = _fwd(
        xconv, h0, c0, rec_kernel, bias, activation, recurrent_activation
    )
    return y, (h_n, c_n)


def _vjp_fwd(xconv, h0, c0, rec_kernel, bias, activation, recurrent_activation):
    y, c_stack, h_n, c_n = _fwd(
        xconv, h0, c0, rec_kernel, bias, activation, recurrent_activation
    )
    res = (xconv, h0, c0, rec_kernel, bias, y, c_stack)
    return (y, (h_n, c_n)), res


def _vjp_bwd(activation, recurrent_activation, res, cots):
    xconv, h0, c0, rec_kernel, bias, y, c_stack = res
    dy, (dh_n, dc_n) = cots
    dx, dh0, dc0, drk, db = _bwd(
        xconv, h0, c0, rec_kernel, bias, y, c_stack,
        dy.astype(xconv.dtype), dh_n, dc_n,
        activation, recurrent_activation,
    )
    return dx, dh0, dc0, drk.astype(rec_kernel.dtype), db.astype(bias.dtype)


convlstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)
