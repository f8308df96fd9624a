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

_BLOCK = 1024  # points per kernel instance


def _sample_one_view(g, feat2d, Hf, Wf, C, scale):
    """g: [B, 2] ROI-pixel coords; feat2d: [Hf, Wf*C] (rows are image rows,
    lanes interleave (x, channel)).

    All-2D separable bilinear (Mosaic cannot reshape across the lane dim):
      1. rows  = Wy @ feat2d          (MXU; Wy = bilinear hat over rows)
      2. mixed = rows * wx_full       (VPU; lane k belongs to x = k // C)
      3. out   = mixed @ S            (MXU; S[k, c] = (k mod C == c))

    Interpolation weights are the hat function relu(1 - |p - i|): one
    subtract/abs/relu per element, zero outside the image = zeros padding.
    bf16 matmuls with f32 accumulation keep the MXU at full rate.
    """
    B = g.shape[0]
    WfC = Wf * C
    # ROI pixels -> feature pixels (torch align_corners=False convention):
    # g = p/R*2-1 ; x_f = ((g+1)*Wf - 1)/2 = p * (Wf/R) - 0.5
    px = g[:, 0] * scale[0] - 0.5
    py = g[:, 1] * scale[1] - 0.5
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Hf), 1).astype(jnp.float32)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, None] - rows_iota)).astype(
        feat2d.dtype
    )
    rows = jnp.dot(Wy, feat2d, preferred_element_type=jnp.float32).astype(
        feat2d.dtype
    )  # [B, Wf*C]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, WfC), 1)
    xl = (lanes // C).astype(jnp.float32)
    wx_full = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, None] - xl)).astype(
        feat2d.dtype
    )
    mixed = rows * wx_full
    k = jax.lax.broadcasted_iota(jnp.int32, (WfC, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (WfC, C), 1)
    S = (k % C == c).astype(feat2d.dtype)
    return jnp.dot(mixed, S, preferred_element_type=jnp.float32)


def _kernel(gl_ref, gr_ref, lf_ref, rf_ref, out_l_ref, out_r_ref, *, Hf, Wf,
            C, scale):
    """Grid (N, P/B).  gl/gr: [1, B, 2] ROI-pixel coords; lf/rf:
    [1, Hf, Wf*C]; separate per-view outputs [1, B, C] — a fused [B, 2C]
    output would need partial-lane stores, which Mosaic serializes."""
    out_l_ref[0] = _sample_one_view(
        gl_ref[0], lf_ref[0], Hf, Wf, C, scale
    ).astype(out_l_ref.dtype)
    out_r_ref[0] = _sample_one_view(
        gr_ref[0], rf_ref[0], Hf, Wf, C, scale
    ).astype(out_r_ref.dtype)


def _sample_stereo_voxel_impl(
    left_feat, right_feat, grid_proj_left, grid_proj_right, roi_hw,
    grid_resolution, interpret: bool = False,
):
    """Kernel dispatch body; ``interpret=True`` runs the Pallas interpreter
    for CPU-backed parity tests."""
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
    out_l, out_r = pl.pallas_call(
        kernel,
        grid=(N, Pp // _BLOCK),
        in_specs=[
            pl.BlockSpec((1, _BLOCK, 2), lambda n, b: (n, b, 0)),
            pl.BlockSpec((1, _BLOCK, 2), lambda n, b: (n, b, 0)),
            pl.BlockSpec((1, Hf, Wf * C), lambda n, b: (n, 0, 0)),
            pl.BlockSpec((1, Hf, Wf * C), lambda n, b: (n, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, _BLOCK, C), lambda n, b: (n, b, 0)),
            pl.BlockSpec((1, _BLOCK, C), lambda n, b: (n, b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, Pp, C), left_feat.dtype),
            jax.ShapeDtypeStruct((N, Pp, C), left_feat.dtype),
        ),
        interpret=interpret,
    )(gl, gr, lf2, rf2)
    out = jnp.concatenate([out_l[:, :P], out_r[:, :P]], axis=-1)
    return out.reshape(N, nh, nw, nl, 2 * C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sample_stereo_voxel_pallas(
    left_feat, right_feat, grid_proj_left, grid_proj_right, roi_hw,
    grid_resolution,
):
    """Drop-in Pallas replacement for ops.grid_sample.sample_stereo_voxel
    (concat aggregation).  Returns [N, nh, nw, nl, 2C].

    Differentiable: Pallas kernels have no automatic VJP, so the backward
    pass is the VJP of the numerically-equivalent XLA formulation
    (deterministic segment-sum scatter, no atomics — SURVEY.md §5 race
    notes).  Without this rule, any training step through the encoder on
    TPU dies with "Linearization failed"."""
    return _sample_stereo_voxel_impl(
        left_feat, right_feat, grid_proj_left, grid_proj_right, roi_hw,
        grid_resolution,
    )


def _sample_fwd(left_feat, right_feat, gl, gr, roi_hw, grid_resolution):
    out = sample_stereo_voxel_pallas(
        left_feat, right_feat, gl, gr, roi_hw, grid_resolution
    )
    return out, (left_feat, right_feat, gl, gr)


def _sample_bwd(roi_hw, grid_resolution, res, g):
    from snvc_tpu.ops.grid_sample import sample_stereo_voxel

    left_feat, right_feat, gl, gr = res
    _, vjp = jax.vjp(
        lambda lf, rf, a, b: sample_stereo_voxel(
            lf, rf, a, b, roi_hw, grid_resolution
        ),
        left_feat, right_feat, gl, gr,
    )
    return vjp(g)


sample_stereo_voxel_pallas.defvjp(_sample_fwd, _sample_bwd)


def pallas_sampling_available(feat_shape, roi_hw) -> bool:
    """The kernel needs the whole feature map VMEM-resident and a TPU."""
    if not _HAS_PLTPU:
        return False
    if jax.default_backend() == "cpu":
        return False
    Hf, Wf, C = feat_shape[-3:]
    vmem_bytes = Hf * Wf * C * 4 * 2  # both views, f32 upper bound
    return vmem_bytes < 8 * 1024 * 1024
