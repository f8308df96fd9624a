"""Pallas TPU kernel for the stereo voxel gather.

The instance path's hottest op samples ~150k grid projections per instance
from each view's feature map (reference vernier.py:323-349).  XLA lowers
the 4-tap gather to scalar dynamic-gathers (~1% of HBM roofline on v5e,
measured 94 ms for the 'small' config).  TPUs have no hardware gather, but
they have an MXU: this kernel builds, per block of points, the sparse
bilinear interpolation matrix W (4 nonzeros per row) as a sum of masked
one-hot comparisons on the VPU and computes  W @ feat  on the MXU —
measured ~30x faster than the XLA gather at equal semantics (zeros
padding, align_corners=False).

Both views are fused: one kernel invocation writes the concatenated
[P, 2C] voxel features.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_BLOCK = 256  # points per kernel instance


def _fractional(p):
    p0 = jnp.floor(p)
    return p0.astype(jnp.int32), (p - p0).astype(jnp.float32)


def _axis_weights(i0, f, size, B):
    """Two-tap interpolation weights [B, size] (zero outside = padding)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, size), 1)
    d = cols - i0[:, None]
    return jnp.where(d == 0, (1.0 - f)[:, None], 0.0) + jnp.where(
        d == 1, f[:, None], 0.0
    )


def _sample_one_view(g, feat2d, Hf, Wf, C, scale):
    """g: [B, 2] ROI-pixel coords; feat2d: [Hf, Wf*C] (rows are image rows,
    lanes interleave (x, channel)).

    All-2D separable bilinear (Mosaic cannot reshape across the lane dim):
      1. rows  = Wy @ feat2d          (MXU; Wy two-tap one-hot over Hf)
      2. mixed = rows * wx_full       (VPU; lane k belongs to x = k // C)
      3. out   = mixed @ S            (MXU; S[k, c] = (k mod C == c))
    """
    B = g.shape[0]
    WfC = Wf * C
    # ROI pixels -> feature pixels (torch align_corners=False convention):
    # g = p/R*2-1 ; x_f = ((g+1)*Wf - 1)/2 = p * (Wf/R) - 0.5
    x0, fx = _fractional(g[:, 0] * scale[0] - 0.5)
    y0, fy = _fractional(g[:, 1] * scale[1] - 0.5)
    Wy = _axis_weights(y0, fy, Hf, B)
    rows = jnp.dot(Wy, feat2d.astype(jnp.float32),
                   preferred_element_type=jnp.float32)  # [B, Wf*C]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, WfC), 1)
    xl = lanes // C
    d = xl - x0[:, None]
    wx_full = jnp.where(d == 0, (1.0 - fx)[:, None], 0.0) + jnp.where(
        d == 1, fx[:, None], 0.0
    )
    mixed = rows * wx_full
    k = jax.lax.broadcasted_iota(jnp.int32, (WfC, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (WfC, C), 1)
    S = (k % C == c).astype(jnp.float32)
    return jnp.dot(mixed, S, preferred_element_type=jnp.float32)


def _kernel(gl_ref, gr_ref, lf_ref, rf_ref, out_ref, *, Hf, Wf, C, scale):
    """Grid (N, P/B).  gl/gr: [1, B, 2] ROI-pixel coords; lf/rf:
    [1, Hf, Wf*C]; out: [1, B, 2C]."""
    out_ref[0, :, :C] = _sample_one_view(
        gl_ref[0], lf_ref[0], Hf, Wf, C, scale
    ).astype(out_ref.dtype)
    out_ref[0, :, C:] = _sample_one_view(
        gr_ref[0], rf_ref[0], Hf, Wf, C, scale
    ).astype(out_ref.dtype)


def sample_stereo_voxel_pallas(
    left_feat, right_feat, grid_proj_left, grid_proj_right, roi_hw,
    grid_resolution,
):
    """Drop-in Pallas replacement for ops.grid_sample.sample_stereo_voxel
    (concat aggregation).  Returns [N, nh, nw, nl, 2C]."""
    N, Hf, Wf, C = left_feat.shape
    nh, nw, nl = grid_resolution
    P = nh * nw * nl
    Pp = ((P + _BLOCK - 1) // _BLOCK) * _BLOCK
    pad = Pp - P
    gl = jnp.pad(grid_proj_left.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)),
                 constant_values=-1e4)
    gr = jnp.pad(grid_proj_right.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)),
                 constant_values=-1e4)
    H, W = roi_hw
    scale = (Wf / W, Hf / H)
    kernel = functools.partial(_kernel, Hf=Hf, Wf=Wf, C=C, scale=scale)
    lf2 = left_feat.reshape(N, Hf, Wf * C)
    rf2 = right_feat.reshape(N, Hf, Wf * C)
    out = pl.pallas_call(
        kernel,
        grid=(N, Pp // _BLOCK),
        in_specs=[
            pl.BlockSpec((1, _BLOCK, 2), lambda n, b: (n, b, 0)),
            pl.BlockSpec((1, _BLOCK, 2), lambda n, b: (n, b, 0)),
            pl.BlockSpec((1, Hf, Wf * C), lambda n, b: (n, 0, 0)),
            pl.BlockSpec((1, Hf, Wf * C), lambda n, b: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK, 2 * C), lambda n, b: (n, b, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Pp, 2 * C), left_feat.dtype),
    )(gl, gr, lf2, rf2)
    return out[:, :P].reshape(N, nh, nw, nl, 2 * C)


def pallas_sampling_available(feat_shape, roi_hw) -> bool:
    """The kernel needs the whole feature map VMEM-resident and a TPU."""
    if not _HAS_PLTPU:
        return False
    if jax.default_backend() == "cpu":
        return False
    Hf, Wf, C = feat_shape[-3:]
    vmem_bytes = Hf * Wf * C * 4 * 2  # both views, f32 upper bound
    return vmem_bytes < 8 * 1024 * 1024
