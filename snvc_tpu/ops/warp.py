"""Device-side affine ROI extraction.

The reference crops every instance ROI on the host with cv2.warpAffine
(KITTIRefinement_dataset.py:514-518) — a throughput killer for a TPU input
pipeline.  Here the full stereo images go to the device once and all ROIs
are resampled on-device: for each output pixel we map through the inverse
crop affine and sample bilinearly with constant-zero border, which is
exactly cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT) semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snvc_tpu.ops.grid_sample import _gather_hw


def _resample_one(img, inv_t, out_hw):
    """img [H, W, C]; inv_t [2, 3] output-pixel -> source-pixel affine."""
    H, W, C = img.shape
    oh, ow = out_hw
    oy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    ox = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    sx = inv_t[0, 0] * ox + inv_t[0, 1] * oy + inv_t[0, 2]
    sy = inv_t[1, 0] * ox + inv_t[1, 1] * oy + inv_t[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).reshape(-1).astype(img.dtype)
    fy = (sy - y0).reshape(-1).astype(img.dtype)
    x0i = x0.reshape(-1).astype(jnp.int32)
    y0i = y0.reshape(-1).astype(jnp.int32)
    flat = img.reshape(H * W, C)
    v00 = _gather_hw(flat, y0i, x0i, H, W)
    v01 = _gather_hw(flat, y0i, x0i + 1, H, W)
    v10 = _gather_hw(flat, y0i + 1, x0i, H, W)
    v11 = _gather_hw(flat, y0i + 1, x0i + 1, H, W)
    out = (
        v00 * ((1 - fy) * (1 - fx))[:, None]
        + v01 * ((1 - fy) * fx)[:, None]
        + v10 * (fy * (1 - fx))[:, None]
        + v11 * (fy * fx)[:, None]
    )
    return out.reshape(oh, ow, C)


def invert_affine_jnp(t):
    """Invert 2x3 affine(s) [..., 2, 3]."""
    a, b, c = t[..., 0, 0], t[..., 0, 1], t[..., 0, 2]
    d, e, f = t[..., 1, 0], t[..., 1, 1], t[..., 1, 2]
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _bilinear_matrix(src, size, dtype):
    """[P] fractional source coordinates -> [P, size] bilinear weight rows.

    Row p holds the two-tap interpolation weights max(0, 1 - |src_p - i|);
    out-of-range coordinates produce all-zero rows (= zero padding).
    """
    idx = jax.lax.broadcasted_iota(dtype, (src.shape[0], size), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - idx))


def _resample_separable(img, inv_t, out_hw):
    """Axis-separable resampling for scale+translate affines.

    The ROI crop affine is always diagonal (geometry.imgproc.crop_affine),
    so bilinear warping factorizes into two interpolation matmuls:
        roi = A_y @ img @ A_x^T
    This runs on the MXU and — unlike a per-pixel gather over a 3-channel
    image — compiles quickly on TPU (gathers with a 3-wide minor dimension
    hit a pathological Mosaic layout).
    """
    H, W, C = img.shape
    oh, ow = out_hw
    oy = jax.lax.broadcasted_iota(jnp.float32, (oh, 1), 0)[:, 0]
    ox = jax.lax.broadcasted_iota(jnp.float32, (ow, 1), 0)[:, 0]
    sy = inv_t[1, 1] * oy + inv_t[1, 2]
    sx = inv_t[0, 0] * ox + inv_t[0, 2]
    Ay = _bilinear_matrix(sy, H, img.dtype)  # [oh, H]
    Ax = _bilinear_matrix(sx, W, img.dtype)  # [ow, W]
    tmp = jnp.einsum("oh,hwc->owc", Ay, img, precision="highest")
    return jnp.einsum("pw,owc->opc", Ax, tmp, precision="highest")


def affine_resample(img, trans, out_hw, separable: bool = True):
    """Extract ROIs from a single image with forward crop affine(s).

    img: [H, W, C]; trans: [R, 2, 3] source->ROI affines (as produced by
    geometry.imgproc.crop_affine); out_hw: (oh, ow) static output size.
    Returns [R, oh, ow, C].

    separable=True (default) requires diagonal affines (no rotation/shear —
    always true for the ROI crops) and uses the matmul formulation; set
    False for general affines (per-pixel gather).
    """
    inv = invert_affine_jnp(trans)
    if separable:
        return jax.vmap(lambda t: _resample_separable(img, t, out_hw))(inv)
    return jax.vmap(lambda t: _resample_one(img, t, out_hw))(inv)


def affine_resample_batch(imgs, trans, out_hw, separable: bool = True):
    """imgs: [N, H, W, C]; trans: [N, 2, 3] one ROI per image."""
    inv = invert_affine_jnp(trans)
    if separable:
        return jax.vmap(lambda im, t: _resample_separable(im, t, out_hw))(
            imgs, inv
        )
    return jax.vmap(lambda im, t: _resample_one(im, t, out_hw))(imgs, inv)
