"""Loss zoo for the instance (Vernier) model — batched, masked, jit-able.

Re-designs the reference's per-instance torch losses
(snvc/models/loss3d.py:478-828) as pure functions over fixed-shape padded
batches with validity masks.  Global-model (RPN) losses live in
snvc_tpu.models.stereo_losses.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def voxel_mse_loss(ncf_pred, ncf_target, valid):
    """Part-heatmap MSE (reference VoxelMSELoss, loss3d.py:478-503).

    ncf_*: [B, P, ...]; valid: [B].  The reference averages the MSE over
    all elements then over parts; with uniform shapes that equals a plain
    masked mean."""
    err = (ncf_pred - ncf_target) ** 2
    mask = jnp.broadcast_to(
        valid.reshape((-1,) + (1,) * (err.ndim - 1)), err.shape
    )
    return _masked_mean(err, mask)


def occupancy_loss(occ_pred, occ_target, valid, gamma=2.0, alpha=0.25):
    """Focal BCE on voxel foreground with -1 = ignore
    (reference OccupancyLoss, loss3d.py:505-528)."""
    p = jnp.clip(occ_pred, 1e-7, 1.0 - 1e-7)
    t = occ_target
    term1 = (1.0 - p) ** gamma * jnp.log(p)
    term2 = p**gamma * jnp.log(1.0 - p)
    pos = (t == 1.0).astype(p.dtype)
    neg = (t == 0.0).astype(p.dtype)
    loss = -pos * term1 * alpha - neg * term2 * (1.0 - alpha)
    mask = (t != -1.0) & jnp.broadcast_to(
        valid.reshape((-1,) + (1,) * (t.ndim - 1)), t.shape
    )
    return _masked_mean(loss, mask)


def offset_loss(offset_pred, offset_target, occupancy_target, valid):
    """L1 on part offsets, only at foreground voxels
    (reference OffsetLoss, loss3d.py:530-545).

    offset_pred: [B, 3*P, nh, nw, nl]; offset_target: [B, 3, P, nh, nw, nl];
    occupancy_target: [B, nh, nw, nl]."""
    B = offset_pred.shape[0]
    _, _, P = offset_target.shape[:3]
    pred = offset_pred.reshape(offset_target.shape)
    err = jnp.abs(pred - offset_target)
    fg = (occupancy_target == 1.0)[:, None, None]  # [B,1,1,nh,nw,nl]
    mask = fg & jnp.broadcast_to(
        valid.reshape(B, 1, 1, 1, 1, 1), err.shape
    )
    return _masked_mean(err, mask)


def coordinate_loss(
    coords_pred,
    gt_corners_local,
    valid,
    x_range,
    z_range,
    weight_l1: float = 1.0,
):
    """L1 on normalized BEV part coordinates
    (reference CoordinateLoss, loss3d.py:744-799).

    coords_pred: [B, P, 2] sigmoid outputs in [0, 1];
    gt_corners_local: [B, P, 3] metric offsets in the object frame.
    The GT is normalized into [0, 1] to match the sigmoid head (the
    reference's normalize_gt switch; comparing raw meters against a
    sigmoid output cannot converge, so normalization is our default)."""
    gx = (gt_corners_local[..., 0] - x_range[0]) / (x_range[1] - x_range[0])
    gz = (gt_corners_local[..., 2] - z_range[0]) / (z_range[1] - z_range[0])
    gt = jnp.stack([gx, gz], axis=-1)
    err = jnp.abs(coords_pred - gt)
    mask = jnp.broadcast_to(valid.reshape(-1, 1, 1), err.shape)
    return weight_l1 * _masked_mean(err, mask)


def shape_loss(shape_pred, shape_target, valid, scaling: float = 1e4):
    """L1 on shape codes (reference ShapeLoss, loss3d.py:603-612)."""
    err = jnp.abs(shape_pred - shape_target / scaling)
    mask = jnp.broadcast_to(valid.reshape(-1, 1), err.shape)
    return _masked_mean(err, mask)


def vernier_losses(
    outputs: Dict,
    targets: Dict,
    valid,
    cfg,
    occupancy_weight: float = 1.0,
    coordinate_weight: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """Composite instance loss (reference calculate_loss,
    tools/inference_agnostic.py:118-140): ncf + w*occupancy [+ offset]
    + 0.1*coordinates."""
    losses = {}
    total = voxel_mse_loss(outputs["ncf"], targets["ncf"], valid)
    losses["ncf"] = total
    if outputs.get("occupancy") is not None:
        lo = occupancy_loss(outputs["occupancy"], targets["occupancy"], valid)
        losses["occupancy"] = lo
        total = total + occupancy_weight * lo
    if outputs.get("offset") is not None and "offset" in targets:
        loff = offset_loss(
            outputs["offset"], targets["offset"], targets["occupancy"], valid
        )
        losses["offset"] = loff
        total = total + loff
    if outputs.get("coordinates") is not None:
        lc = coordinate_loss(
            outputs["coordinates"],
            targets["gt_corners_local"],
            valid,
            cfg.x_range,
            cfg.z_range,
        )
        losses["coordinates"] = lc
        total = total + coordinate_weight * lc
    losses["total"] = total
    return losses
