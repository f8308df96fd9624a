"""Batched pose update from neural confidence fields (jit-able).

The reference converts NCF heatmaps to a refined pose on the host with
numpy argmax + SVD Procrustes per instance (vernier.py:665-738,
transformation.py:153-188).  Here the whole update is a batched closed-form
computation on device: for d=2 the weighted rigid fit has an arctan
solution, so no SVD, no host sync, and it vmaps over instances.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from snvc_tpu.ops.heatmaps import hard_argmax_2d, soft_argmax_2d_ref

# object-frame part coordinates of a unit box, matching
# geometry.boxes._PART_X/_PART_Z (reference vernier.py:744-751)
_PART_X = jnp.array([0.0, 0.5, 0.5, 0.5, 0.5, -0.5, -0.5, -0.5, -0.5])
_PART_Z = jnp.array([0.0, 0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])


def rigid_transform_2d_batch(src, dst, weights=None):
    """Weighted 2D rigid fit, batched.

    src, dst: [..., 2, P]; weights: [..., P] or None.
    Returns (R [..., 2, 2], t [..., 2, 1]).  Matches the reference SVD
    solution (unweighted centroids, weighted covariance,
    transformation.py:153-188) in closed form: theta = atan2(b, a) with
    a = sum w (xs.xd), b = sum w (xs x xd).
    """
    mu_s = jnp.mean(src, axis=-1, keepdims=True)
    mu_d = jnp.mean(dst, axis=-1, keepdims=True)
    xs = src - mu_s
    xd = dst - mu_d
    w = jnp.ones_like(src[..., 0, :]) if weights is None else weights
    a = jnp.sum(w * (xs[..., 0, :] * xd[..., 0, :] + xs[..., 1, :] * xd[..., 1, :]), axis=-1)
    b = jnp.sum(w * (xs[..., 0, :] * xd[..., 1, :] - xs[..., 1, :] * xd[..., 0, :]), axis=-1)
    theta = jnp.arctan2(b, a)
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    R = jnp.stack([row0, row1], axis=-2)
    t = mu_d - _rot2(R, mu_s)
    return R, t


def _rot2(R, pts):
    """Apply [..., 2, 2] rotations to [..., 2, P] points elementwise.

    Deliberately avoids a matmul: on TPU the MXU's default bf16 precision
    would inject ~0.3% relative error into world coordinates (~0.1 m at
     40 m range).  Four VPU multiplies keep full f32 accuracy.
    """
    x = R[..., 0, 0:1] * pts[..., 0, :] + R[..., 0, 1:2] * pts[..., 1, :]
    y = R[..., 1, 0:1] * pts[..., 0, :] + R[..., 1, 1:2] * pts[..., 1, :]
    return jnp.stack([x, y], axis=-2)


class NcfUpdate(NamedTuple):
    one_part: jnp.ndarray  # [N, 7] refined boxes (center move only)
    all_parts: jnp.ndarray  # [N, 7] refined boxes (rigid registration)
    confidence: jnp.ndarray  # [N, P] per-part heatmap peak
    keep: jnp.ndarray  # [N] bool filter decision


def ncf_to_update(
    ncf,
    samples,
    x_range: Tuple[float, float],
    z_range: Tuple[float, float],
    coordinates: Optional[jnp.ndarray] = None,
    filter_min: float = -1.0,
    filter_max: float = 2.0,
    decode: str = "argmax",
) -> NcfUpdate:
    """Batched equivalent of the reference's ncf_to_update_2d
    (vernier.py:665-738) + Filter gate (tools/inference_agnostic.py:94-105).

    ncf: [N, P, nl, nw] BEV heatmaps (rows = z/length, cols = x/width).
    samples: [N, 7] current proposals (h, w, l, x, y, z, ry).
    coordinates: optional [N, P, 2] normalized (x, z) part coordinates from
      the coord head (vernier.py:688-692).
    decode selects the part-position source:
      * "coordinates" — use the coord head when its output is given,
        falling back to heatmap argmax when it is not.  This is the
        reference CLI's behavior (inference_agnostic.py:396-402 passes
        `coordinates` whenever the head exists).
      * "argmax" (reference img_proc.get_max_preds) or "soft-argmax"
        (img_proc.soft_arg_max:656-692 — sub-voxel expectation): decode
        the NCF heatmaps even when a coord head is present.  The argmax
        is winner-take-all, so it stays informative in regimes where a
        small-noise-trained regression head collapses to the mean.
    filter_min/filter_max are the Filter gate's plausible-heatmap-value
    range (tools/inference_agnostic.py:94-105), surfaced through
    cfg.filter_min/filter_max.
    Returns refined boxes; where the filter rejects, the sample is
    returned unchanged.
    """
    samples = jnp.asarray(samples)
    N, P = ncf.shape[0], ncf.shape[1]
    nl, nw = ncf.shape[2], ncf.shape[3]
    flat = ncf.reshape(N, P, -1)
    confidence = jnp.max(flat, axis=-1)
    keep = jnp.all((flat >= filter_min) & (flat <= filter_max), axis=(1, 2))

    x0, x1 = x_range
    z0, z1 = z_range
    if coordinates is not None and decode == "coordinates":
        off_x = x0 + coordinates[..., 0] * (x1 - x0)
        off_z = z0 + coordinates[..., 1] * (z1 - z0)
    else:
        if decode == "soft-argmax":
            xy, _ = soft_argmax_2d_ref(ncf)
        else:
            xy, _ = hard_argmax_2d(ncf)  # x = col = w idx, y = row = l idx
        # voxel index -> metric offset via the grid linspace
        off_x = x0 + xy[..., 0] * (x1 - x0) / (nw - 1)
        off_z = z0 + xy[..., 1] * (z1 - z0) / (nl - 1)

    h, w, l = samples[:, 0], samples[:, 1], samples[:, 2]
    ry = samples[:, 6]
    c, s = jnp.cos(ry), jnp.sin(ry)
    # object -> camera: off_cam = local @ basis.T with basis cols
    # w=(-s,0,-c), l=(c,0,-s)  (y component of the BEV offset is 0)
    cam_x = -off_x * s[:, None] + off_z * c[:, None]
    cam_z = -off_x * c[:, None] - off_z * s[:, None]
    center_x = samples[:, 3]
    center_y = samples[:, 4] - 0.5 * h
    center_z = samples[:, 5]

    # --- one_part: move the center to the predicted part-0 position -----
    new_x = center_x + cam_x[:, 0]
    new_z = center_z + cam_z[:, 0]
    one_part = samples.at[:, 3].set(new_x).at[:, 5].set(new_z)

    # --- all_parts: rigid registration of all 9 parts in BEV ------------
    src_x = _PART_X[None, :P] * l[:, None]
    src_z = _PART_Z[None, :P] * w[:, None]
    # rotate source parts into camera BEV (rot_y on (x, z))
    src_cam_x = src_x * c[:, None] + src_z * s[:, None] + center_x[:, None]
    src_cam_z = -src_x * s[:, None] + src_z * c[:, None] + center_z[:, None]
    src = jnp.stack([src_cam_x, src_cam_z], axis=1)  # [N, 2, P]
    dst = jnp.stack(
        [center_x[:, None] + cam_x, center_z[:, None] + cam_z], axis=1
    )
    R, t = rigid_transform_2d_batch(src, dst, weights=confidence)
    moved = _rot2(R, src) + t  # [N, 2, P]
    # orientation: rigid fit from the canonical (unrotated, origin) parts
    canon = jnp.stack([src_x, src_z], axis=1)
    Rc, _ = rigid_transform_2d_batch(canon, moved)
    angle = jnp.arctan2(Rc[:, 1, 0], Rc[:, 0, 0])
    all_parts = (
        samples.at[:, 3].set(moved[:, 0, 0])
        .at[:, 5].set(moved[:, 1, 0])
        .at[:, 6].set(-angle)
    )

    keep_col = keep[:, None]
    one_part = jnp.where(keep_col, one_part, samples)
    all_parts = jnp.where(keep_col, all_parts, samples)
    return NcfUpdate(one_part, all_parts, confidence, keep)
