"""Point-in-rotated-box predicates, occupancy targets, RoI-aware pooling.

TPU-native equivalents of the reference's roiaware_pool3d CUDA extension
(snvc/extension/roiaware_pool3d/) and the Mesh.in_mesh occupancy target
generation (snvc/utils/bounding_box.py:286-297,
KITTIRefinement_dataset.py:779-826).  The CUDA kernels' atomic scatters
become deterministic segment reductions.

All functions take fixed-shape padded point sets with validity masks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _local_coords(points, center, ry):
    """Rotate camera-frame points into the (w=x, h=y, l=z ... ) object frame.

    Matches the convention of geometry.boxes.object_basis: returns
    (offset @ basis) with basis = rot_y(ry) @ B.
    """
    off = points - center[None, :]
    c, s = jnp.cos(ry), jnp.sin(ry)
    # basis columns in camera coords (geometry.boxes.object_basis):
    # w = (-s, 0, -c), h = (0, 1, 0), l = (c, 0, -s)
    x = -(off[:, 0] * s + off[:, 2] * c)
    y = off[:, 1]
    z = off[:, 0] * c - off[:, 2] * s
    return jnp.stack([x, y, z], axis=1)


def points_in_cuboid_jnp(points, box3d, extra_dims=None):
    """Mask [P] of points inside an upright box3d [7] = (h,w,l,x,y,z,ry).

    extra_dims: optional (h, w, l) overriding the box dims (used for the
    ROI cuboid, which reuses the sample's pose with the refinement range,
    KITTIRefinement_dataset.py:784-786).
    Same semantics as the CUDA check (roiaware_pool3d_kernel.cu:16-36) and
    the Mesh half-space test.
    """
    h, w, l = (box3d[0], box3d[1], box3d[2]) if extra_dims is None else extra_dims
    # The ROI cuboid in the reference occupancy path keeps the sample's
    # *bottom* y and its own (larger) height, so its center sits at
    # y - h_roi/2 (KITTIRefinement_dataset.py:784-786 does not re-anchor y).
    center = jnp.stack([box3d[3], box3d[4] - 0.5 * h, box3d[5]])
    local = _local_coords(points, center, box3d[6])
    return (
        (jnp.abs(local[:, 0]) < 0.5 * w)
        & (jnp.abs(local[:, 1]) < 0.5 * h)
        & (jnp.abs(local[:, 2]) < 0.5 * l)
    )


def occupancy_targets(
    points,
    points_valid,
    sample,
    gt_box,
    grid_local,
    grid_resolution: Tuple[int, int, int],
    grid_range: Tuple[float, float, float],
):
    """Foreground/background/undefined occupancy for the Vernier grid.

    points: [P, 3] LiDAR points in the rect camera frame (padded).
    points_valid: [P] bool mask of real points.
    sample: [7] the proposal box; gt_box: [7] the ground-truth box.
    grid_local: [nh*nw*nl, 3] grid points in the object frame (h-major
      ravel order), used for the background test.
    Returns occupancy [nh, nw, nl] float32 with 1 fg / 0 bg / -1 undefined
      (reference: KITTIRefinement_dataset.py:779-826; background overrides
      foreground exactly as the reference's write order does).
    """
    nh, nw, nl = grid_resolution
    gh, gw, gl = grid_range
    # voxel pitch follows the linspace grid convention: n points span the
    # range, so pitch = range / (n - 1); index = local/pitch + (n-1)/2
    # lands point k of the grid exactly on index k
    spa = jnp.array([gh / (nh - 1), gw / (nw - 1), gl / (nl - 1)])

    in_roi = points_in_cuboid_jnp(points, sample, extra_dims=(gh, gw, gl))
    in_gt = points_in_cuboid_jnp(points, gt_box)
    fg = in_roi & in_gt & points_valid

    center = jnp.stack([sample[3], sample[4] - 0.5 * sample[0], sample[5]])
    local = _local_coords(points, center, sample[6])  # (x=w, y=h, z=l)
    half = 0.5 * (jnp.array([nh, nw, nl], dtype=jnp.float32) - 1.0)
    i = jnp.floor(local[:, 1] / spa[0] + half[0])
    j = jnp.floor(local[:, 0] / spa[1] + half[1])
    k = jnp.floor(local[:, 2] / spa[2] + half[2])
    # clamp both sides (the reference clamps only the high side and lets
    # negative indices wrap — a host-side bug we do not reproduce)
    i = jnp.clip(i, 0, nh - 1).astype(jnp.int32)
    j = jnp.clip(j, 0, nw - 1).astype(jnp.int32)
    k = jnp.clip(k, 0, nl - 1).astype(jnp.int32)
    flat = (i * nw + j) * nl + k
    counts = jnp.zeros(nh * nw * nl, dtype=jnp.int32).at[flat].add(
        fg.astype(jnp.int32)
    )
    fg_mask = (counts > 0).reshape(nh, nw, nl)

    # background: grid voxels whose center is outside the GT box
    gt_corners_test = points_in_cuboid_jnp(
        grid_to_cam_jnp(grid_local, sample), gt_box
    ).reshape(nh, nw, nl)
    occ = jnp.where(fg_mask, 1.0, -1.0)
    occ = jnp.where(~gt_corners_test, 0.0, occ)
    return occ


def grid_to_cam_jnp(grid_local, box3d):
    """jnp mirror of geometry.boxes.grid_to_cam for a single box.

    grid_local: [N, 3] (x=w, y=h, z=l axes); the grid heads "front" before
    rotation, hence ry + pi/2 (KITTIRefinement_dataset.py:828-846).
    """
    ry = box3d[6] + 0.5 * jnp.pi
    c, s = jnp.cos(ry), jnp.sin(ry)
    x = grid_local[:, 0] * c + grid_local[:, 2] * s
    y = grid_local[:, 1]
    z = -grid_local[:, 0] * s + grid_local[:, 2] * c
    center = jnp.stack([box3d[3], box3d[4] - 0.5 * box3d[0], box3d[5]])
    return jnp.stack([x, y, z], axis=1) + center[None, :]


def roiaware_pool3d(
    points,
    features,
    points_valid,
    boxes,
    out_size: Tuple[int, int, int],
    mode: str = "max",
):
    """RoI-aware voxel pooling of point features into per-box grids.

    points: [P, 3]; features: [P, C]; points_valid: [P] bool;
    boxes: [B, 7] (h, w, l, x, y, z, ry) bottom-centered.
    out_size: (ox, oy, oz) voxels along the (l, h, w) object axes.
    Returns [B, ox, oy, oz, C]; empty voxels are 0.

    Deterministic segment-max/mean replaces the reference's atomic CUDA
    scatters (roiaware_pool3d_kernel.cu:111-232).
    """
    ox, oy, oz = out_size
    B = boxes.shape[0]
    C = features.shape[1]
    nseg = B * ox * oy * oz

    def per_box(box, b_idx):
        inside = points_in_cuboid_jnp(points, box) & points_valid
        center = jnp.stack([box[3], box[4] - 0.5 * box[0], box[5]])
        local = _local_coords(points, center, box[6])  # (w, h, l)
        # voxel indices: x along length, y along height, z along width
        ix = jnp.floor((local[:, 2] + 0.5 * box[2]) / (box[2] / ox))
        iy = jnp.floor((local[:, 1] + 0.5 * box[0]) / (box[0] / oy))
        iz = jnp.floor((local[:, 0] + 0.5 * box[1]) / (box[1] / oz))
        ix = jnp.clip(ix, 0, ox - 1).astype(jnp.int32)
        iy = jnp.clip(iy, 0, oy - 1).astype(jnp.int32)
        iz = jnp.clip(iz, 0, oz - 1).astype(jnp.int32)
        seg = ((b_idx * ox + ix) * oy + iy) * oz + iz
        return jnp.where(inside, seg, nseg)  # invalid -> dropped segment

    segs = jax.vmap(per_box)(boxes, jnp.arange(B))  # [B, P]
    segs = segs.reshape(-1)
    feats = jnp.tile(features, (B, 1))
    if mode == "max":
        pooled = jax.ops.segment_max(feats, segs, num_segments=nseg + 1)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    elif mode == "avg":
        sums = jax.ops.segment_sum(feats, segs, num_segments=nseg + 1)
        cnts = jax.ops.segment_sum(
            jnp.ones_like(feats[:, :1]), segs, num_segments=nseg + 1
        )
        pooled = sums / jnp.maximum(cnts, 1.0)
    else:
        raise NotImplementedError(mode)
    return pooled[:-1].reshape(B, ox, oy, oz, C)
