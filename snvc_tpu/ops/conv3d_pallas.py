"""Implicit-GEMM Pallas kernel for the hot 3D convolution shape.

The stereo 3D stack (reference analog: the conv3d/hourglass stack of
snvc/models/submodule.py:85-315) is dominated by k=3^3, stride-1 NDHWC
convolutions at C=32..64.  XLA's lowerings leave the MXU mostly idle
there: the per-depth-tap conv2d decomposition (models/layers.Conv3d)
contracts only kh*kw*C=288 with C=32-lane operands, and the channel-fold
variant fixes occupancy but triples HBM traffic by materializing the
kd-fold volume (BENCH.md optimization log #9: a measured 19% model-level
regression).

This kernel gets the full 27*C-deep contraction at ~1x HBM traffic by
folding the window INSIDE VMEM: each grid step DMAs one (3, TH+2, W, C)
halo window of the depth/height-padded input, builds the implicit-im2col
tile [TH*W, 27C] with 27 shifted in-register views, and runs ONE MXU
matmul against the [27C, F] reshaped weights.  No folded volume ever
exists in HBM.

Forward only; gradients fall back to the XLA formulation through
custom_vjp exactly like ops/cost_volume.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be unavailable on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def conv3d_xla(x, w):
    """Reference formulation: native lax 3D convolution, SAME padding.

    x: [N, D, H, W, C]; w: [3, 3, 3, C, F] -> [N, D, H, W, F] in x.dtype.
    """
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def _kernel(x_hbm, w_ref, out_ref, xwin, sem, *, TH, W, C, F):
    """Grid (N, D, H//TH).  x_hbm: [N, D+2, H+2, W, C] (ANY/HBM);
    w_ref: [27C, F] VMEM; out block: [1, 1, TH, W, F]."""
    n = pl.program_id(0)
    d = pl.program_id(1)
    h = pl.program_id(2)
    copy = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(d, 3), pl.ds(h * TH, TH + 2)], xwin, sem
    )
    copy.start()
    copy.wait()
    v = jnp.pad(xwin[...], ((0, 0), (0, 0), (1, 1), (0, 0)))
    # implicit im2col: 27 shifted views concatenated on the lane axis,
    # ordered (kd, kh, kw) to match w.reshape(27*C, F)
    cols = [
        v[kd, kh : kh + TH, kw : kw + W, :].reshape(TH * W, C)
        for kd in range(3)
        for kh in range(3)
        for kw in range(3)
    ]
    a = jnp.concatenate(cols, axis=-1)  # [TH*W, 27C]
    out = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.reshape(TH, W, F).astype(out_ref.dtype)


def _tile_rows(C: int) -> int:
    """Output rows per grid step: bound the im2col tile (~TH*W*27C*2 B)
    plus the halo window to a comfortable VMEM share."""
    return 8 if C <= 32 else 4


def conv3d_k3_available(x_shape, w_shape, stride=(1, 1, 1), dilation=1):
    """Shape gate for the kernel: k=3^3, stride 1, dilation 1, H
    divisible by the row tile, lane-sane widths.

    The channel minor must be a whole number of 128-lane tiles: the
    kernel's manual halo DMA slices an HBM memref whose minor dim Mosaic
    lays out in 128-wide tiles, and it rejects sub-tile slice extents
    ("Slice shape along dimension 4 must be aligned to tiling (128)" —
    measured on the flagship A/B, BENCH.md 2026-08-19).  The model's
    C=32/64 stacks therefore never take this path on hardware; it
    remains exercised in interpret mode and available for >=128-channel
    shapes."""
    if not _HAS_PLTPU:
        return False
    if tuple(w_shape[:3]) != (3, 3, 3) or tuple(stride) != (1, 1, 1):
        return False
    if dilation != 1:
        return False
    N, D, H, W, C = x_shape
    F = w_shape[-1]
    if C % 128 != 0 or F > 128:
        return False
    return H % _tile_rows(C) == 0


def _conv3d_pallas_fwd(x, w, interpret: bool = False):
    N, D, H, W, C = x.shape
    F = w.shape[-1]
    TH = _tile_rows(C)
    assert H % TH == 0, (H, TH)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    wmat = w.reshape(27 * C, F).astype(x.dtype)
    kernel = functools.partial(_kernel, TH=TH, W=W, C=C, F=F)
    return pl.pallas_call(
        kernel,
        grid=(N, D, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((27 * C, F), lambda n, d, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TH, W, F), lambda n, d, h: (n, d, h, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((N, D, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, TH + 2, W, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xpad, wmat)


@jax.custom_vjp
def conv3d_k3(x, w):
    """k=3^3 / stride-1 / SAME 3D conv: Pallas implicit-GEMM forward,
    XLA backward (exact — both formulations compute the same sums)."""
    return _conv3d_pallas_fwd(x, w)


def _fwd(x, w):
    return _conv3d_pallas_fwd(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(conv3d_xla, x, w)
    dx, dw = vjp(g.astype(x.dtype))
    return dx, dw.astype(w.dtype)


conv3d_k3.defvjp(_fwd, _bwd)
