"""Bilinear feature sampling on TPU.

This is the hottest gather of the instance path: the Vernier model samples
2D CNN features at the projection of every voxel of an nh x nw x nl grid in
both stereo views (reference: snvc/models/vernier.py:323-349, which calls
torch grid_sample with default align_corners=False / zeros padding).

Semantics match torch.nn.functional.grid_sample exactly:
  * normalized coord g in [-1, 1] maps to pixel x = ((g + 1) * S - 1) / 2,
  * bilinear weights from the 4 neighbors,
  * out-of-range taps contribute 0 (zeros padding); the reference does NOT
    mask out-of-view points (vernier.py:328 TODO) so neither do we.

Layout is NHWC (TPU-native).  The gather is expressed as a flat
jnp.take over [H*W, C] per batch element, which XLA lowers to an efficient
dynamic-gather; the 4 taps + weighting fuse into the surrounding ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(feat_flat, iy, ix, H, W):
    """Gather feat_flat [H*W, C] at (iy, ix) [P] with zero padding."""
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iyc = jnp.clip(iy, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    vals = jnp.take(feat_flat, iyc * W + ixc, axis=0)  # [P, C]
    return vals * valid[:, None].astype(feat_flat.dtype)


def _grid_sample_one(feat, gx, gy):
    """feat [H, W, C]; gx, gy [P] normalized coords. Returns [P, C].

    Coordinates and weights stay float32 regardless of the feature dtype —
    bf16 coordinates would quantize sample positions by ~0.1 px.
    """
    H, W, C = feat.shape
    x = ((gx.astype(jnp.float32) + 1.0) * W - 1.0) * 0.5
    y = ((gy.astype(jnp.float32) + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(feat.dtype)
    fy = (y - y0).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = feat.reshape(H * W, C)
    v00 = _gather_hw(flat, y0i, x0i, H, W)
    v01 = _gather_hw(flat, y0i, x0i + 1, H, W)
    v10 = _gather_hw(flat, y0i + 1, x0i, H, W)
    v11 = _gather_hw(flat, y0i + 1, x0i + 1, H, W)
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    return (
        v00 * w00[:, None]
        + v01 * w01[:, None]
        + v10 * w10[:, None]
        + v11 * w11[:, None]
    )


def grid_sample_2d(feat, grid):
    """Batched bilinear sampling with torch grid_sample semantics.

    feat: [N, H, W, C] (NHWC); grid: [N, P, 2] normalized (x, y) in [-1, 1].
    Returns [N, P, C].
    """
    return jax.vmap(lambda f, g: _grid_sample_one(f, g[:, 0], g[:, 1]))(feat, grid)


def sample_stereo_voxel(
    left_feat,
    right_feat,
    grid_proj_left,
    grid_proj_right,
    roi_hw,
    grid_resolution,
    aggregate: str = "concat",
):
    """Build the object-centric voxel by sampling both views.

    left_feat/right_feat: [N, Hf, Wf, C] backbone features of the ROIs.
    grid_proj_*: [N, P, 2] projected grid points in *ROI pixel* coordinates
      at the full ROI resolution (the backbone stride cancels out in the
      normalized convention, exactly as in the reference).
    roi_hw: (H, W) full ROI resolution used for normalization
      (reference vernier.py:335-338: p / resolution * 2 - 1).
    grid_resolution: (nh, nw, nl).

    Returns voxel [N, nh, nw, nl, 2C] (channels-last NDHWC).
    aggregate="concat-atten" additionally gates channels by the clamped
    cosine similarity of the two views (vernier.py:341-344).
    """
    H, W = roi_hw
    nh, nw, nl = grid_resolution
    scale = jnp.array([2.0 / W, 2.0 / H], dtype=jnp.float32)
    gl = grid_proj_left.astype(jnp.float32) * scale - 1.0
    gr = grid_proj_right.astype(jnp.float32) * scale - 1.0
    sl = grid_sample_2d(left_feat, gl)  # [N, P, C]
    sr = grid_sample_2d(right_feat, gr)
    if aggregate == "concat-atten":
        num = jnp.sum(sl * sr, axis=-1, keepdims=True)
        den = jnp.linalg.norm(sl, axis=-1, keepdims=True) * jnp.linalg.norm(
            sr, axis=-1, keepdims=True
        )
        atten = jnp.clip(num / jnp.maximum(den, 1e-8), 0.0, None)
        sl = sl * atten
        sr = sr * atten
    elif aggregate != "concat":
        raise NotImplementedError(aggregate)
    vox = jnp.concatenate([sl, sr], axis=-1)  # [N, P, 2C]
    N = vox.shape[0]
    return vox.reshape(N, nh, nw, nl, -1)
