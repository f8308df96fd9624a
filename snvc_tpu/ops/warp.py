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


def affine_resample(img, trans, out_hw):
    """Extract ROIs from a single image with forward crop affine(s).

    img: [H, W, C]; trans: [R, 2, 3] source->ROI affines (as produced by
    geometry.imgproc.crop_affine); out_hw: (oh, ow) static output size.
    Returns [R, oh, ow, C].
    """
    inv = invert_affine_jnp(trans)
    return jax.vmap(lambda t: _resample_one(img, t, out_hw))(inv)


def affine_resample_batch(imgs, trans, out_hw):
    """imgs: [N, H, W, C]; trans: [N, 2, 3] one ROI per image."""
    inv = invert_affine_jnp(trans)
    return jax.vmap(lambda im, t: _resample_one(im, t, out_hw))(imgs, inv)
