"""On-device batch assembly for the instance path.

The reference's dataloader does per-instance cv2 warps, 1.2M-point grid
projections, and numpy target drawing on the host
(KITTIRefinement_dataset.py:500-983) and ships ~20 MB of grid projections
per instance to the device.  Here the host ships only

  * the full stereo images once per frame (padded to a static shape),
  * per-instance scalars: the 7-dof proposal, two 2x3 crop affines, the
    3x4 projection matrices, and (for training) the GT box + a padded
    LiDAR point set,

and everything else — ROI resampling, grid projection into both views,
heatmap/occupancy targets — is computed on-device inside the jitted step.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snvc_tpu.config import VernierConfig
from snvc_tpu.ops.heatmaps import bev_part_heatmaps, heatmaps_3d
from snvc_tpu.ops.points_in_boxes import (
    _local_coords,
    grid_to_cam_jnp,
    occupancy_targets,
)
from snvc_tpu.ops.registration import _PART_X, _PART_Z
from snvc_tpu.ops.warp import affine_resample_batch

_PART_Y = jnp.array([-0.5, -1.0, 0.0, -1.0, 0.0, -1.0, 0.0, -1.0, 0.0])


def make_grid_local(cfg: VernierConfig) -> np.ndarray:
    """Object-frame grid points [nh*nw*nl, 3] in h-major ravel order
    (reference _init_3d_grid, KITTIRefinement_dataset.py:267-282)."""
    nh, nw, nl = cfg.grid_resolution
    ys = np.linspace(cfg.y_range[0], cfg.y_range[1], nh)
    xs = np.linspace(cfg.x_range[0], cfg.x_range[1], nw)
    zs = np.linspace(cfg.z_range[0], cfg.z_range[1], nl)
    gy, gx, gz = np.meshgrid(ys, xs, zs, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)


def project_points(P, pts):
    """[3,4] projection of [G,3] rect points -> [G,2] pixels."""
    uvw = pts @ P[:, :3].T + P[:, 3]
    return uvw[:, :2] / uvw[:, 2:3]


def apply_affine_jnp(pts, t):
    """[G,2] points through a 2x3 affine."""
    return pts @ t[:, :2].T + t[:, 2]


def grid_projections(sample, P, trans, grid_local):
    """Project the instance grid into one view's ROI pixels.

    sample [7]; P [3,4]; trans [2,3] source->ROI affine; grid_local [G,3].
    Returns [G, 2] ROI-pixel coordinates (reference _generate_grid_proj,
    KITTIRefinement_dataset.py:848-868).
    """
    cam = grid_to_cam_jnp(grid_local, sample)
    uv = project_points(P, cam)
    return apply_affine_jnp(uv, trans)


def roi_xy_maps(trans, roi_hw, image_size):
    """Global-frame normalized coordinate maps of each ROI's pixels.

    trans: [B, 2, 3] source->ROI crop affines; roi_hw: (oh, ow);
    image_size: (H, W) of the global frame the affines act in.
    Returns [B, oh, ow, 2] with x = 2*u/W - 1, y = 2*v/H - 1 of each ROI
    pixel's source position — the reference's generate_xy_map semantics
    (img_proc.py:184-198; appended to the crop in the data path,
    img_proc.py:222-223).  Crop-local ramps would be identical for every
    ROI and carry no positional/ray-direction information.
    """
    from snvc_tpu.ops.warp import invert_affine_jnp

    oh, ow = roi_hw
    gh, gw = image_size
    inv = invert_affine_jnp(jnp.asarray(trans, jnp.float32))  # ROI -> source
    oy = jnp.arange(oh, dtype=jnp.float32)
    ox = jnp.arange(ow, dtype=jnp.float32)
    # crop affines are scale+translate (geometry.imgproc.crop_affine)
    su = inv[:, 0, 0:1] * ox[None, :] + inv[:, 0, 2:3]  # [B, ow]
    sv = inv[:, 1, 1:2] * oy[None, :] + inv[:, 1, 2:3]  # [B, oh]
    xm = jnp.broadcast_to((2.0 * su / gw - 1.0)[:, None, :], (trans.shape[0], oh, ow))
    ym = jnp.broadcast_to((2.0 * sv / gh - 1.0)[:, :, None], (trans.shape[0], oh, ow))
    return jnp.stack([xm, ym], axis=-1)


def assemble_instances(
    images_left,
    images_right,
    image_idx,
    trans_l,
    trans_r,
    samples,
    P_left,
    P_right,
    grid_local,
    cfg: VernierConfig,
):
    """Build model inputs for a padded instance batch, fully on device.

    images_*: [B_img, H, W, 3] uint8/float RGB; image_idx: [B_inst] int32;
    trans_*: [B_inst, 2, 3]; samples: [B_inst, 7]; P_*: [B_img, 3, 4].
    Returns (left_rois, right_rois, grid_proj_l, grid_proj_r).
    """
    roi_hw = cfg.resolution
    mean = jnp.asarray(cfg.img_mean, jnp.float32)
    std = jnp.asarray(cfg.img_std, jnp.float32)

    def extract(images, trans):
        imgs = images[image_idx].astype(jnp.float32) / 255.0
        rois = affine_resample_batch(imgs, trans, roi_hw)
        return (rois - mean) / std

    left_rois = extract(images_left, trans_l)
    right_rois = extract(images_right, trans_r)
    if cfg.backbone.add_xy:
        # 5-channel ROIs: images + global-frame coordinate maps (reference
        # img_proc.py:222-223; maps per view since the crops differ)
        left_rois = jnp.concatenate(
            [left_rois, roi_xy_maps(trans_l, roi_hw, cfg.image_size)], axis=-1
        )
        right_rois = jnp.concatenate(
            [right_rois, roi_xy_maps(trans_r, roi_hw, cfg.image_size)], axis=-1
        )

    proj = jax.vmap(grid_projections, in_axes=(0, 0, 0, None))
    gpl = proj(samples, P_left[image_idx], trans_l, grid_local)
    gpr = proj(samples, P_right[image_idx], trans_r, grid_local)
    return left_rois, right_rois, gpl, gpr


def part_centers_in_grid(samples, gt_boxes, cfg: VernierConfig):
    """Part positions of the GT boxes in *voxel index* units of each
    sample's grid: ([B, P, 2] (x=w idx, z=l idx), [B, P, 3] metric local
    offsets, [B, P, 3] (y, x, z) voxel indices) — reference
    _construct_neural_confidence_field (KITTIRefinement_dataset.py:722-777)."""
    num_parts = cfg.num_parts
    nh, nw, nl = cfg.grid_resolution

    def one(sample, gt):
        h, w, l = gt[0], gt[1], gt[2]
        px = _PART_X[:num_parts] * l
        py = _PART_Y[:num_parts] * h
        pz = _PART_Z[:num_parts] * w
        ry = gt[6]
        c, s = jnp.cos(ry), jnp.sin(ry)
        cam = jnp.stack(
            [
                px * c + pz * s + gt[3],
                py + gt[4],
                -px * s + pz * c + gt[5],
            ],
            axis=1,
        )  # [P, 3] camera-frame part positions of the GT box
        center = jnp.stack([sample[3], sample[4] - 0.5 * sample[0], sample[5]])
        local = _local_coords(cam, center, sample[6])  # (w, h, l) coords
        spa_y = (cfg.y_range[1] - cfg.y_range[0]) / (nh - 1)
        spa_x = (cfg.x_range[1] - cfg.x_range[0]) / (nw - 1)
        spa_z = (cfg.z_range[1] - cfg.z_range[0]) / (nl - 1)
        iy = local[:, 1] / spa_y + 0.5 * (nh - 1)
        jx = local[:, 0] / spa_x + 0.5 * (nw - 1)
        kz = local[:, 2] / spa_z + 0.5 * (nl - 1)
        idx3 = jnp.stack([iy, jx, kz], axis=1)
        return jnp.stack([jx, kz], axis=1), local, idx3

    return jax.vmap(one)(samples, gt_boxes)


def make_targets(
    samples,
    gt_boxes,
    points,
    points_valid,
    grid_local,
    cfg: VernierConfig,
):
    """Training targets, fully on device.

    samples/gt_boxes: [B, 7]; points: [B, Np, 3] rect-frame LiDAR (padded);
    points_valid: [B, Np] bool; grid_local: [G, 3].
    Returns dict(ncf, occupancy [B, nh, nw, nl], gt_corners_local [B, P, 3]
    [, offset [B, 3, P, nh, nw, nl]]) where ncf is [B, P, nl, nw] BEV
    gaussians (grid_type '2D') or [B, P, nh, nw, nl] 3D gaussians
    (grid_type '3D', reference _draw_heatmaps_3d,
    KITTIRefinement_dataset.py:623-664 — trains the vernier_type='3D'
    variant whose classifier emits per-part 3D fields).

    The offset field (emitted when cfg.use_part_reg_head) is the per-voxel
    displacement to each GT part in object-frame (x, y, z) = (w, h, l)
    coordinates, normalized by the grid extent — the reference's
    offsets_local (KITTIRefinement_dataset.py:758-766, consumed by
    OffsetLoss, loss3d.py:530-545).
    """
    nh, nw, nl = cfg.grid_resolution
    centers, local, idx3 = part_centers_in_grid(samples, gt_boxes, cfg)
    quant = not cfg.ncf_subvoxel
    if cfg.grid_type == "3D":
        ncf = heatmaps_3d(idx3, (nh, nw, nl), cfg.sigma, quantize=quant)
    else:
        ncf = bev_part_heatmaps(centers, (nw, nl), cfg.sigma, quantize=quant)
    gh = cfg.y_range[1] - cfg.y_range[0]
    gw = cfg.x_range[1] - cfg.x_range[0]
    gl = cfg.z_range[1] - cfg.z_range[0]
    occ = jax.vmap(
        lambda p, v, s, g: occupancy_targets(
            p, v, s, g, grid_local, (nh, nw, nl), (gh, gw, gl)
        )
    )(points, points_valid, samples, gt_boxes)
    out = dict(ncf=ncf, occupancy=occ, gt_corners_local=local)
    if cfg.use_bbox_head:
        # 5-dof local BEV box target for the FC bbox head (reference
        # gt_box_local, KITTIRefinement_dataset.py:744-749: GT center in
        # the sample's object frame, GT l/w, and pi/2 - (sample_ry-gt_ry))
        out["gt_box_local"] = jnp.stack(
            [
                local[:, 0, 0],
                local[:, 0, 2],
                gt_boxes[:, 2],
                gt_boxes[:, 1],
                0.5 * jnp.pi - (samples[:, 6] - gt_boxes[:, 6]),
            ],
            axis=1,
        )
    if cfg.use_part_reg_head:
        B, P = local.shape[:2]
        diff = local[:, :, None, :] - grid_local[None, None, :, :]  # [B,P,G,3]
        diff = diff / jnp.array([gw, gh, gl])
        out["offset"] = jnp.moveaxis(diff, 3, 1).reshape(B, 3, P, nh, nw, nl)
    return out
