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

Row-banded variant (SNVC_SAMPLE_BAND=auto|always): the h-major grid ravel
gives each 1024-point block a tiny image-row span (measured p99 = 12 of 64
feature rows, tools/probe_band_span.py), so the kernel can load just two
adjacent 16-row windows of a TRANSPOSED feature layout [Wf, Hf*C] steered
by scalar-prefetched per-block window indices — halving the lane extent
(and so the MXU tile count) of both matmuls.  A per-call fit check
dispatches the full kernel via lax.cond whenever any block's span exceeds
the window, so the banded path is always exact.

SNVC_SAMPLE_BAND=always is a TEST-ONLY hatch: it skips the fit check, and
any block whose row span exceeds the 2x16-row window silently loses the
out-of-window taps.  Production perf tuning should use auto/never only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_BLOCK = 1024  # points per kernel instance
_BAND = 16  # rows per banded window (two adjacent windows are loaded)


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


def _sample_one_view_banded(g, t0, t1, i0, Hf, Wf, C, scale):
    """Banded variant of ``_sample_one_view`` on a TRANSPOSED feature
    layout.  t0/t1: [Wf, _BAND*C] adjacent row windows of
    featT[x, y*C + c] starting at row _BAND*i0; the h-major grid ravel
    gives each point block a tiny image-row span (probe: p99 = 12 of 64
    rows), so two 16-row windows replace the full Hf*C lane extent —
    halving the tile count of BOTH matmuls (their N / K dim is the lane
    axis; shrinking the Hf contraction of the untransposed form would
    not help, as K <= 128 is one MXU pass either way).
      1. rows  = Wx @ [t0 | t1]      (MXU; Wx = bilinear hat over columns)
      2. mixed = rows * wy_full      (VPU; lane k -> row BAND*i0 + k // C)
      3. out   = mixed @ S           (MXU; S[k, c] = (k mod C == c))
    Exact whenever every weight-carrying row of every valid point lies in
    the 2*_BAND window — the dispatcher verifies this per call and falls
    back to the full kernel otherwise."""
    B = g.shape[0]
    KC = 2 * _BAND * C
    px = g[:, 0] * scale[0] - 0.5
    py = g[:, 1] * scale[1] - 0.5
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (B, Wf), 1).astype(
        jnp.float32
    )
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, None] - cols_iota)).astype(
        t0.dtype
    )
    t = jnp.concatenate([t0, t1], axis=-1)  # [Wf, 2*BAND*C]
    rows = jnp.dot(Wx, t, preferred_element_type=jnp.float32).astype(t0.dtype)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, KC), 1)
    yl = (_BAND * i0 + lanes // C).astype(jnp.float32)
    wy_full = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, None] - yl)).astype(
        t0.dtype
    )
    mixed = rows * wy_full
    k = jax.lax.broadcasted_iota(jnp.int32, (KC, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (KC, C), 1)
    S = (k % C == c).astype(t0.dtype)
    return jnp.dot(mixed, S, preferred_element_type=jnp.float32)


def _kernel_banded(band_ref, gl_ref, gr_ref, lt0_ref, lt1_ref, rt0_ref,
                   rt1_ref, out_l_ref, out_r_ref, *, Hf, Wf, C, scale):
    """Grid (N, P/B); band_ref [2, N, nblocks] scalar-prefetched window
    indices (view axis FIRST — see the SMEM-padding note at the stack
    site; units of _BAND rows) steering the window DMAs via the BlockSpec
    index maps below."""
    n = pl.program_id(0)
    b = pl.program_id(1)
    out_l_ref[0] = _sample_one_view_banded(
        gl_ref[0], lt0_ref[0], lt1_ref[0], band_ref[0, n, b], Hf, Wf, C,
        scale,
    ).astype(out_l_ref.dtype)
    out_r_ref[0] = _sample_one_view_banded(
        gr_ref[0], rt0_ref[0], rt1_ref[0], band_ref[1, n, b], Hf, Wf, C,
        scale,
    ).astype(out_r_ref.dtype)


def _band_indices(g, Hf, scale_y, nblocks):
    """Per-block banded-window index and fit flag for one view.

    g: [N, Pp, 2] padded ROI-pixel coords.  Returns (i0 [N, nblocks] int32,
    ok [N, nblocks] bool).  A point carries weight on rows
    {floor(py), floor(py)+1} ∩ [0, Hf); padded/out-of-view points (hat
    weight 0 everywhere) are excluded from the band stats."""
    py = g[:, :, 1] * scale_y - 0.5  # [N, Pp] f32
    py = py.reshape(py.shape[0], nblocks, _BLOCK)
    valid = (py > -1.0) & (py < Hf)
    lo = jnp.clip(jnp.floor(py), 0, Hf - 1)
    hi = jnp.clip(jnp.floor(py) + 1, 0, Hf - 1)
    big = jnp.float32(1e9)
    rmin = jnp.min(jnp.where(valid, lo, big), axis=-1)
    rmax = jnp.max(jnp.where(valid, hi, -big), axis=-1)
    any_valid = valid.any(axis=-1)
    rmin = jnp.where(any_valid, rmin, 0.0)
    rmax = jnp.where(any_valid, rmax, 0.0)
    i0 = jnp.clip((rmin // _BAND).astype(jnp.int32), 0, Hf // _BAND - 2)
    ok = rmax <= (_BAND * i0 + 2 * _BAND - 1).astype(jnp.float32)
    return i0, ok


def _band_mode() -> str:
    # default "auto": the same-window flagship model-level A/B measured
    # 10.78 -> 11.58 inst/s (+7.4 %, artifacts/perf_r4/flagship_band.json
    # vs flagship_base.json, 2026-08-20) — the realistic grid projections
    # keep every block inside its band so the cond takes the banded branch
    return os.environ.get("SNVC_SAMPLE_BAND", "auto")


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
    nblocks = Pp // _BLOCK
    kernel = functools.partial(_kernel, Hf=Hf, Wf=Wf, C=C, scale=scale)
    lf2 = left_feat.reshape(N, Hf, Wf * C)
    rf2 = right_feat.reshape(N, Hf, Wf * C)
    out_shape = (
        jax.ShapeDtypeStruct((N, Pp, C), left_feat.dtype),
        jax.ShapeDtypeStruct((N, Pp, C), left_feat.dtype),
    )

    def full_call(args):
        gl, gr, lf2, rf2, _lt, _rt, _band = args
        return pl.pallas_call(
            kernel,
            grid=(N, nblocks),
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
            out_shape=out_shape,
            interpret=interpret,
        )(gl, gr, lf2, rf2)

    # Banding requires 16-row-aligned windows and 128-lane-aligned blocks.
    band_possible = (
        _HAS_PLTPU  # banded_call needs pltpu.PrefetchScalarGridSpec
        and _band_mode() != "never"
        and Hf % _BAND == 0
        and Hf >= 2 * _BAND
        and (_BAND * C) % 128 == 0
    )
    if not band_possible:
        return _finish(full_call((gl, gr, lf2, rf2, None, None, None)), P, N,
                       grid_resolution, C)

    kernel_b = functools.partial(_kernel_banded, Hf=Hf, Wf=Wf, C=C,
                                 scale=scale)
    # featT[n, x, y*C + c] = feat[n, y, x, c]
    lt = jnp.transpose(left_feat, (0, 2, 1, 3)).reshape(N, Wf, Hf * C)
    rt = jnp.transpose(right_feat, (0, 2, 1, 3)).reshape(N, Wf, Hf * C)
    i0l, okl = _band_indices(gl, Hf, scale[1], nblocks)
    i0r, okr = _band_indices(gr, Hf, scale[1], nblocks)
    # view axis FIRST: SMEM operands pad the minor dim to 128, so a
    # [N, nblocks, 2] layout would blow the 1 MiB SMEM budget 64x over
    # (measured: 2.36 MB for the flagship's [4, 1152, 2])
    band = jnp.stack([i0l, i0r], axis=0)  # [2, N, nblocks] int32
    all_ok = jnp.all(okl & okr)

    def banded_call(args):
        gl, gr, _lf2, _rf2, lt, rt, band = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, nblocks),
            in_specs=[
                pl.BlockSpec((1, _BLOCK, 2), lambda n, b, s: (n, b, 0)),
                pl.BlockSpec((1, _BLOCK, 2), lambda n, b, s: (n, b, 0)),
                pl.BlockSpec((1, Wf, _BAND * C),
                             lambda n, b, s: (n, 0, s[0, n, b])),
                pl.BlockSpec((1, Wf, _BAND * C),
                             lambda n, b, s: (n, 0, s[0, n, b] + 1)),
                pl.BlockSpec((1, Wf, _BAND * C),
                             lambda n, b, s: (n, 0, s[1, n, b])),
                pl.BlockSpec((1, Wf, _BAND * C),
                             lambda n, b, s: (n, 0, s[1, n, b] + 1)),
            ],
            out_specs=(
                pl.BlockSpec((1, _BLOCK, C), lambda n, b, s: (n, b, 0)),
                pl.BlockSpec((1, _BLOCK, C), lambda n, b, s: (n, b, 0)),
            ),
        )
        return pl.pallas_call(
            kernel_b,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(band, gl, gr, lt, lt, rt, rt)

    args = (gl, gr, lf2, rf2, lt, rt, band)
    if _band_mode() == "always":  # tests: force the banded path
        out = banded_call(args)
    else:
        out = jax.lax.cond(all_ok, banded_call, full_call, args)
    return _finish(out, P, N, grid_resolution, C)


def _finish(out_lr, P, N, grid_resolution, C):
    out_l, out_r = out_lr
    nh, nw, nl = grid_resolution
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
