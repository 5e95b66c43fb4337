"""Space-to-depth packing for small-channel stride-1 convs (MXU lanes).

The TPU MXU is a 128x128 systolic array: a conv whose output-channel
count N is far below 128 uses only N of the 128 lanes no matter how
large its spatial extent is.  The reference model's full-resolution
ConvLSTM (`/root/reference/gan.py:260-267` — `filters=g_state_size=8`,
8x8 kernel at 64x64) emits 4f = 32 gate channels: a <=25 % lane ceiling
on the two convs that dominate the most expensive layer in the network
(bench.py roofline: the full step runs at ~17 % MFU, ~90 % of it
ConvLSTM scans).

This module re-expresses such a conv on space-to-depth-by-r tensors,
where it is *exactly* the same linear map but with r^2-fold fatter
channels:

    conv_{k,SAME,stride 1}(x; W)  ==  d2s_r( conv_{k',pads}( s2d_r(x); W' ) )

with ``k' = len(a-range)`` below, input channels C*r^2, output channels
N*r^2.  For the f=8 layer at r=2 this turns an [M=B*H*W, K=k^2*C, N=32]
matmul into [M/4, K', N=128]: ~2.3x fewer 128x128 MXU tile-passes.

Derivation (r=2, TF 'SAME', stride 1; P0 = (k-1)//2 top/left pad):

    y[2I+s, ...] = sum_p x[2I+s+p-P0] W[p]       (per spatial axis)
    s+p-P0 = 2a+d,  d in {0,1}  =>  a = floor((s+p-P0)/2)
    a ranges over [floor(-P0/2), floor((k-P0)/2)]  ->  k' taps

so output sub-position s and input sub-position d index extra channel
groups, and the transformed kernel W'[a, (d,c), (s,n)] is a zero-padded
rearrangement of W — built here with 4 pad+reshape ops, so gradients
flow through to the original parameter automatically (the packing is a
fixed linear op on the weights, hoisted out of the scan by XLA).

Exactness: same multiply set, different summation order — bitwise-equal
in the common case (the MXU accumulates each output in f32 regardless of
grouping) up to reduction-order effects; pinned by
`tests/test_conv_packing.py` at <=1e-5 relative in f32.

Used by `ConvLSTM2D(conv_packing=...)` (models/layers.py) for layers
with stride 1, even H/W, and 4*filters*r^2 <= 128-aligned gains.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "pack_kernel",
    "packed_conv_geometry",
    "packed_same_conv",
    "gate_major",
]


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """``[..., H, W, C] -> [..., H/r, W/r, C*r^2]`` (blocks to channels).

    Channel order is ``(dy, dx, c)`` — the order `pack_kernel` expects.
    """
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // r, r, w // r, r, c)
    # [..., H/r, W/r, dy, dx, c]
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    x = x.transpose(perm)
    return x.reshape(*lead, h // r, w // r, c * r * r)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of `space_to_depth` (channel order ``(dy, dx, c)``)."""
    *lead, hh, ww, cc = x.shape
    c = cc // (r * r)
    x = x.reshape(*lead, hh, ww, r, r, c)
    # [..., H/r, dy, W/r, dx, c]
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    x = x.transpose(perm)
    return x.reshape(*lead, hh * r, ww * r, c)


def packed_conv_geometry(k: int, r: int = 2) -> tuple[int, int, int]:
    """(k', a_min, P0) for one spatial axis of a k-tap SAME stride-1 conv.

    ``a`` is the block-space tap index: a in [a_min, floor((k-P0)/r)].
    """
    p0 = (k - 1) // 2  # TF SAME top/left pad for stride 1
    a_min = int(np.floor(-p0 / r))
    a_max = int(np.floor((r - 1 + k - 1 - p0) / r))
    return a_max - a_min + 1, a_min, p0


def pack_kernel(w: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """``[kh, kw, C, N] -> [kh', kw', C*r^2, N*r^2]`` packed kernel.

    Output-channel order ``(sy, sx, n)``; input-channel order
    ``(dy, dx, c)`` — matching `space_to_depth`.
    """
    kh, kw, c, n = w.shape
    kh2, ah_min, ph0 = packed_conv_geometry(kh, r)
    kw2, aw_min, pw0 = packed_conv_geometry(kw, r)
    out = []
    for sy in range(r):
        for sx in range(r):
            # u = (s + p - P0) - r*a_min  in [0, r*k'):  u = r*(a-a_min)+d
            uy0 = sy - ph0 - r * ah_min
            ux0 = sx - pw0 - r * aw_min
            wp = jnp.pad(
                w,
                (
                    (uy0, r * kh2 - kh - uy0),
                    (ux0, r * kw2 - kw - ux0),
                    (0, 0),
                    (0, 0),
                ),
            )
            # [kh', dy, kw', dx, C, N] -> [kh', kw', dy, dx, C, N]
            wp = wp.reshape(kh2, r, kw2, r, c, n)
            wp = wp.transpose(0, 2, 1, 3, 4, 5)
            out.append(wp.reshape(kh2, kw2, r * r * c, n))
    # stack (sy, sx) as leading factor of the output channel
    return jnp.concatenate(out, axis=-1)


def packed_same_conv(
    x_packed: jnp.ndarray,
    w_packed: jnp.ndarray,
    k: tuple[int, int],
    r: int = 2,
    dtype=jnp.float32,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """The block-space conv equivalent to SAME/stride-1 conv with the
    original ``k`` taps.  ``x_packed``: ``[B, H/r, W/r, C*r^2]``;
    ``w_packed``: from `pack_kernel`.  Padding is the a-range offset,
    asymmetric for even ``k`` (explicit pad list).
    """
    kh2, ah_min, _ = packed_conv_geometry(k[0], r)
    kw2, aw_min, _ = packed_conv_geometry(k[1], r)
    pads = [(-ah_min, kh2 - 1 + ah_min), (-aw_min, kw2 - 1 + aw_min)]
    dn = lax.conv_dimension_numbers(
        x_packed.shape, w_packed.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = lax.conv_general_dilated(
        x_packed.astype(dtype),
        w_packed.astype(dtype),
        (1, 1),
        pads,
        dimension_numbers=dn,
    )
    return out.astype(out_dtype)


def gate_major(w_packed: jnp.ndarray, groups: int, gates: int = 4) -> jnp.ndarray:
    """Reorder packed OUTPUT channels ``(group, gate, f) -> (gate,
    group, f)`` so a ConvLSTM's 4-way gate split (``jnp.split(z, 4,
    -1)``) works unchanged on packed tensors — each gate's slice then
    carries ``(group, f)`` channels, which is exactly the
    `space_to_depth` layout the next step's recurrent conv consumes."""
    kh, kw, ci, co = w_packed.shape
    f = co // (groups * gates)
    w = w_packed.reshape(kh, kw, ci, groups, gates, f)
    return w.transpose(0, 1, 2, 4, 3, 5).reshape(kh, kw, ci, co)
