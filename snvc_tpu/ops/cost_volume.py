"""Plane-sweep stereo cost volume.

TPU-native equivalent of the reference's build_cost_volume CUDA op
(snvc/extension/build_cost_volume/BuildCostVolume_cuda.cu:64-98): for each
disparity hypothesis d the output concatenates the (strided) left features
with the right features sampled at x - shift[d] (bilinear in x, zero
outside).  The CUDA backward's atomicAdd scatter (:152-205) is replaced by
the deterministic transpose XLA derives from the gather formulation.

Two implementations:
  * ``plane_sweep_volume``  — pure XLA gather + lerp; differentiable,
    works for any integer ``downsample``.
  * ``plane_sweep_volume_pallas`` — Pallas TPU kernel for the hot
    downsample=1 case: a constant shift per plane makes the bilinear read
    two dynamic W-slices + a lerp, so each (batch, disparity) grid cell
    streams one H x W x C tile through VMEM with no gather at all.
    Forward only; wrapped in custom_vjp with the XLA path as backward.

Layouts are NHWC; the volume is [N, D, H', W', 2C] (depth-major NDHWC) so
the downstream 3D convs see channels last.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be unavailable on CPU tests
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def plane_sweep_volume(left, right, shifts, downsample: int = 1):
    """left/right: [N, H, W, C]; shifts: [D] float disparities (>= 0).

    Returns [N, D, H//ds, W//ds, 2C].
    """
    N, H, W, C = left.shape
    ds = downsample
    Ho, Wo = H // ds, W // ds
    xs = jnp.arange(Wo, dtype=shifts.dtype) * ds  # output column centers
    x_src = xs[None, :] - shifts[:, None]  # [D, Wo]
    x0 = jnp.floor(x_src)
    frac = (x_src - x0).astype(left.dtype)
    x0i = x0.astype(jnp.int32)

    def tap(xi):
        valid = (xi >= 0) & (xi < W)
        g = jnp.take(right, jnp.clip(xi, 0, W - 1), axis=2)  # [N, H, D, Wo, C]
        return g * valid[None, None, :, :, None].astype(left.dtype)

    r = tap(x0i) * (1.0 - frac)[None, None, :, :, None] + tap(x0i + 1) * frac[
        None, None, :, :, None
    ]
    r = r[:, ::ds]  # stride rows -> [N, Ho, D, Wo, C]
    r = jnp.moveaxis(r, 2, 1)  # [N, D, Ho, Wo, C]
    l = left[:, ::ds, ::ds, :][:, None]  # [N, 1, Ho, Wo, C]
    l = jnp.broadcast_to(l, r.shape)
    return jnp.concatenate([l, r], axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernel (downsample == 1)
# ---------------------------------------------------------------------------


def _psv_kernel(shift_ref, rpad_ref, out_ref, *, S, W):
    """Grid (N, D, HC/128).  rpad block: [S+W, 128] left-zero-padded,
    column-major (sublanes = image columns); out block: [1, W, 128].

    With a constant shift s per depth plane, the bilinear read
        out[x] = fs * right[x - ks - 1] + (1 - fs) * right[x - ks]
    (ks = floor(s), fs = s - ks) is two W-row dynamic slices + a lerp — no
    gather at all.  Zero padding on the left supplies the out-of-range
    taps (CUDA semantics, BuildCostVolume_cuda.cu:15-61).

    Blocks are f32 with exactly 128 lanes: Mosaic rejects dynamic sublane
    slices on bf16 refs (16-sublane packing) and on >128-lane blocks.

    shift_ref is the full [N, D] SMEM table (per-sample shifts: the
    stereo model derives them from each frame's calibration) — indexing
    it by both grid ids keeps batched inputs out of pallas's vmap rule,
    whose Squeezed() SMEM blocks Mosaic rejects.
    """
    n = pl.program_id(0)
    d = pl.program_id(1)
    s = shift_ref[n, d]
    ks = jnp.floor(s).astype(jnp.int32)
    fs = s - jnp.floor(s)
    a = rpad_ref[pl.ds(S - ks - 1, W)]  # taps x - ks - 1
    b = rpad_ref[pl.ds(S - ks, W)]  # taps x - ks
    out_ref[0] = a * fs + b * (1.0 - fs)


def _psv_pallas_fwd(
    left, right, shifts, max_shift: Optional[int] = None,
    interpret: bool = False,
):
    N, H, W, C = left.shape
    D = shifts.shape[-1]
    shifts2 = jnp.broadcast_to(
        shifts if shifts.ndim == 2 else shifts[None], (N, D)
    )
    S = int(max_shift) + 2 if max_shift is not None else W
    HC = H * C
    assert HC % 128 == 0, "H*C must be lane-aligned (128)"
    # column-major f32 layout, frames folded into the sublane axis
    # (lane-merging reshapes happen outside pallas)
    rT = right.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(N, W, HC)
    rpad = jnp.pad(rT, ((0, 0), (S, 0), (0, 0))).reshape(N * (S + W), HC)
    kernel = functools.partial(_psv_kernel, S=S, W=W)
    out_r = pl.pallas_call(
        kernel,
        grid=(N, D, HC // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S + W, 128), lambda n, d, j: (n, j)),
        ],
        out_specs=pl.BlockSpec((1, W, 128), lambda n, d, j: (n * D + d, 0, j)),
        out_shape=jax.ShapeDtypeStruct((N * D, W, HC), jnp.float32),
        interpret=interpret,
    )(shifts2, rpad)
    right_part = (
        out_r.reshape(N, D, W, H, C).transpose(0, 1, 3, 2, 4).astype(left.dtype)
    )
    left_part = jnp.broadcast_to(left[:, None], (N, D, H, W, C))
    return jnp.concatenate([left_part, right_part], axis=-1)


def _plane_sweep_xla_any(left, right, shifts, downsample: int = 1):
    """XLA path for shared [D] or per-sample [N, D] shift tables."""
    if shifts.ndim == 2:
        return jax.vmap(
            lambda l, r, s: plane_sweep_volume(
                l[None], r[None], s, downsample
            )[0]
        )(left, right, shifts)
    return plane_sweep_volume(left, right, shifts, downsample)


@jax.custom_vjp
def plane_sweep_volume_pallas(left, right, shifts):
    """Pallas forward, XLA-transpose backward; downsample fixed to 1.

    shifts: [D] (shared) or [N, D] (per-sample, e.g. per-frame calib)."""
    return _psv_pallas_fwd(left, right, shifts)


def _psv_fwd(left, right, shifts):
    return _psv_pallas_fwd(left, right, shifts), (left, right, shifts)


def _psv_bwd(res, g):
    left, right, shifts = res
    _, vjp = jax.vjp(
        lambda l, r: _plane_sweep_xla_any(l, r, shifts, 1), left, right
    )
    dl, dr = vjp(g)
    return dl, dr, jnp.zeros_like(shifts)


plane_sweep_volume_pallas.defvjp(_psv_fwd, _psv_bwd)


def build_cost_volume(left, right, shifts, downsample: int = 1, use_pallas=None):
    """Dispatcher mirroring the reference API
    (build_cost_volume/__init__.py:7-26; asserts shift >= 0 there).

    shifts may be [D] (one table for the batch) or [N, D] (per-sample);
    call this directly with the batched table rather than vmapping —
    pallas_call's batching rule produces SMEM block shapes Mosaic
    rejects."""
    if use_pallas is None:
        use_pallas = (
            _HAS_PLTPU
            and downsample == 1
            and jax.default_backend() not in ("cpu",)
        )
    if use_pallas:
        return plane_sweep_volume_pallas(left, right, shifts)
    return _plane_sweep_xla_any(left, right, shifts, downsample)
