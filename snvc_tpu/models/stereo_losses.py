"""Losses + target assignment for the global stereo detector.

Re-designs the reference's RPN3DLoss (snvc/models/loss3d.py:78-370) with
on-device target assignment (the reference consumed precomputed sparse
distance/label maps from the host dataloader; here assignment is a few
vectorized ops inside the jitted step):

  * a BEV location is positive for a GT iff it lies inside the GT's
    (rotated) footprint; ties resolve to the nearest GT center,
  * classification: multi-target sigmoid focal loss over angle x class
    bins, normalized by (num_pos + 10) (loss3d.py:319-322),
  * regression: smooth-L1 (beta=1/9) on the 24 corner offsets of positives,
    weighted by centerness (loss3d.py:42-50, 350-359).  The reference's
    sin/cos trick on the last element targets the 7-param variant's angle;
    applying it to a corner coordinate (as its corner branch accidentally
    does) is not reproduced,
  * centerness: BCE-with-logits against exp(-center distance)
    (loss3d.py:228-230, 360-363).

Also includes the disparity/depth losses (calc_disp_loss 'sl1' and the
Wasserstein-1 'W1' variant, loss3d.py:399-476).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from snvc_tpu.config import StereoConfig

_CORNER_X = jnp.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])  # *l
_CORNER_Z = jnp.array([0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5])  # *w
_CORNER_Y = jnp.array([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, -1.0])  # *h


def gt_corners_24(gt_boxes):
    """box3d [..., 7] -> 8 corners [..., 8, 3] in the compute_corners_sc
    layout (bounding_box.py:415-437): bottom 4 then top 4, alpha = -ry."""
    h, w, l = gt_boxes[..., 0:1], gt_boxes[..., 1:2], gt_boxes[..., 2:3]
    x = _CORNER_X * l
    z = _CORNER_Z * w
    y = _CORNER_Y * h
    ry = gt_boxes[..., 6:7]
    c, s = jnp.cos(ry), jnp.sin(ry)
    cx = x * c + z * s + gt_boxes[..., 3:4]
    cz = -x * s + z * c + gt_boxes[..., 5:6]
    cy = y + gt_boxes[..., 4:5]
    return jnp.stack([cx, cy, cz], axis=-1)


def assign_targets(
    locations, anchors_y, gt_boxes, gt_valid, gt_classes, num_classes: int,
    anchor_angles=None, norm_factor: float = 1.0,
):
    """BEV anchor-free assignment for one frame, angle-bin aware.

    locations: [L, 2] (x, z); anchors_y: [1] or [num_classes] anchor
    heights (per-class when multiple are configured, ANCHORS_Y in the
    reference); gt_boxes: [G, 7] padded; gt_valid: [G]; gt_classes: [G] in
    [0, num_classes); anchor_angles: [A] yaw anchors (ANCHOR_ANGLES) or
    None for a single bin.

    A location inside a GT footprint is positive only at the angle bin
    whose anchor yaw is nearest (mod pi) to the GT yaw — the on-device
    equivalent of the reference's precomputed per-(location, angle) labels
    map (loss3d.py:188-199; the head allocates A*K channels,
    stereonet.py:164-167, so the loss must distinguish them).

    Returns (labels [L, A, num_classes] {0,1},
             reg_targets [L, num_classes, 24] — angle-independent,
             centerness [L] in [0, 1]).
    """
    L = locations.shape[0]
    if anchor_angles is None:
        anchor_angles = jnp.zeros((1,))
    A = anchor_angles.shape[0]
    # inside-footprint test in each gt's frame
    dx = locations[:, 0:1] - gt_boxes[None, :, 3]  # [L, G]
    dz = locations[:, 1:2] - gt_boxes[None, :, 5]
    c = jnp.cos(gt_boxes[:, 6])[None]
    s = jnp.sin(gt_boxes[:, 6])[None]
    lx = dx * c - dz * s  # along-length coordinate
    lz = dx * s + dz * c  # across
    inside = (
        (jnp.abs(lx) < gt_boxes[None, :, 2] / 2)
        & (jnp.abs(lz) < gt_boxes[None, :, 1] / 2)
        & gt_valid[None, :]
    )
    dist = jnp.sqrt(dx**2 + dz**2)
    dist_masked = jnp.where(inside, dist, jnp.inf)
    best = jnp.argmin(dist_masked, axis=1)  # [L]
    pos = jnp.any(inside, axis=1)
    best_dist = jnp.take_along_axis(dist_masked, best[:, None], axis=1)[:, 0]
    centerness = jnp.where(pos, jnp.exp(-best_dist * norm_factor), 0.0)

    # nearest angle bin (mod pi: a footprint supports two headings; the
    # bins partition orientation, heading is recovered by the regression)
    best_ry = jnp.take(gt_boxes[:, 6], best)  # [L]
    ang_d = best_ry[:, None] - anchor_angles[None, :]
    ang_d = jnp.abs(jnp.mod(ang_d + jnp.pi / 2, jnp.pi) - jnp.pi / 2)
    best_angle = jnp.argmin(ang_d, axis=1)  # [L]

    # per-(angle, class) one-hot labels at positives
    best_cls = jnp.take(gt_classes, best)
    labels = (
        jax.nn.one_hot(best_angle, A)[:, :, None]
        * jax.nn.one_hot(best_cls, num_classes)[:, None, :]
        * pos[:, None, None].astype(jnp.float32)
    )

    # corner regression targets from the (location, anchor-y) 3D point;
    # anchors_y indexes per class when a height per class is configured
    ay = jnp.broadcast_to(jnp.asarray(anchors_y), (num_classes,))  # [K]
    corners = gt_corners_24(gt_boxes)  # [G, 8, 3]
    tgt_corners = corners[best]  # [L, 8, 3]
    anchor3d = jnp.stack(
        [
            jnp.broadcast_to(locations[:, 0:1], (L, num_classes)),
            jnp.broadcast_to(ay[None, :], (L, num_classes)),
            jnp.broadcast_to(locations[:, 1:2], (L, num_classes)),
        ],
        axis=-1,
    )  # [L, K, 3]
    reg = (tgt_corners[:, None] - anchor3d[:, :, None, :]).reshape(
        L, num_classes, 24
    )
    return labels, reg, centerness


def sigmoid_focal_multi_target(logits, targets, gamma=2.0, alpha=0.25):
    """Reference sigmoid_focal_loss_multi_target (loss3d.py:22-40), summed."""
    p = jax.nn.sigmoid(logits)
    term1 = (1 - p) ** gamma * jnp.log(p + 1e-7)
    term2 = p**gamma * jnp.log(1 - p + 1e-7)
    t = targets
    loss = -t * term1 * alpha - (1 - t) * term2 * (1 - alpha)
    return jnp.sum(loss)


def smooth_l1(x, y, beta=1.0 / 9):
    n = jnp.abs(x - y)
    return jnp.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)


def rpn3d_loss(
    outputs: Dict,
    gt_boxes,
    gt_valid,
    gt_classes,
    cfg: StereoConfig,
    locations,
):
    """Composite RPN loss over a batch.

    outputs: cls [N, Z, X, A*K], reg [N, Z, X, A*K*24], centerness [N, Z, X, A].
    gt_*: [N, G, ...] padded.  locations: [L, 2] with L = Z*X.
    """
    A, K = cfg.num_angles, cfg.num_classes
    N = outputs["cls"].shape[0]
    L = locations.shape[0]
    anchors_y = jnp.asarray(cfg.anchors_y)
    anchor_angles = jnp.asarray(cfg.anchor_angles[:A])

    labels, reg_t, ctr_t = jax.vmap(
        lambda b, v, c: assign_targets(
            locations, anchors_y, b, v, c, K, anchor_angles
        )
    )(gt_boxes, gt_valid, gt_classes)
    # [N, L, A, K], [N, L, K, 24], [N, L]

    cls = outputs["cls"].reshape(N, L, A, K)
    reg = outputs["reg"].reshape(N, L, A, K, 24)
    ctr = outputs["centerness"].reshape(N, L, A)

    labels_ak = labels
    num_pos = jnp.sum(labels_ak)
    cls_loss = sigmoid_focal_multi_target(
        cls, labels_ak, cfg.focal_gamma, cfg.focal_alpha
    ) / (num_pos + 10.0)

    reg_t_ak = jnp.broadcast_to(reg_t[:, :, None, :, :], reg.shape)
    w = labels_ak * ctr_t[:, :, None, None]
    per = jnp.mean(smooth_l1(reg, reg_t_ak), axis=-1)  # [N, L, A, K]
    if cfg.reg_heading_sym:
        # the pi-rotated box has the same footprint with corners reordered
        # [2,3,0,1, 6,7,4,5]; score against both orderings and keep the
        # better one PER LOCATION (one consistent ordering, not per-coord)
        alt = reg_t.reshape(N, L, K, 8, 3)[
            :, :, :, jnp.array([2, 3, 0, 1, 6, 7, 4, 5]), :
        ].reshape(N, L, K, 24)
        alt_ak = jnp.broadcast_to(alt[:, :, None, :, :], reg.shape)
        per = jnp.minimum(per, jnp.mean(smooth_l1(reg, alt_ak), axis=-1))
    reg_loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-6)

    pos_a = jnp.any(labels_ak > 0, axis=-1)  # [N, L, A]
    ctr_tgt = jnp.broadcast_to(ctr_t[:, :, None], ctr.shape)
    bce = optax_sigmoid_bce(ctr, ctr_tgt)
    ctr_loss = jnp.sum(bce * pos_a) / jnp.maximum(jnp.sum(pos_a), 1.0)

    total = cls_loss + reg_loss + ctr_loss
    return dict(
        total=total, cls=cls_loss, reg=reg_loss, centerness=ctr_loss,
        num_pos=num_pos,
    )


def optax_sigmoid_bce(logits, targets):
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1 - targets) * log_np)


# --- depth losses (loss3d.py:399-476) --------------------------------------


def depth_sl1_loss(depth_pred, depth_gt, mask):
    """Masked smooth-L1 on the regressed depth map ('sl1' path)."""
    m = mask.astype(depth_pred.dtype)
    loss = smooth_l1(depth_pred, depth_gt, beta=1.0)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def depth_multistage_sl1_loss(depth_preds, depth_gt, mask):
    """Masked smooth-L1 over the stacked-hourglass intermediate depth
    outputs with the reference's staging weights — the last three stages
    weigh 0.5/0.7/1.0, earlier ones (deeper stacks than the reference
    ever shipped) also 0.5 (calc_disp_loss 'sl1', loss3d.py:425-438).
    With one stage this is exactly depth_sl1_loss."""
    weights = [0.5, 0.7, 1.0]
    n = len(depth_preds)
    total = 0.0
    for i, pred in enumerate(depth_preds):
        w = weights[max(0, 3 - n + i)]
        total = total + w * depth_sl1_loss(pred, depth_gt, mask)
    return total


def depth_w1_loss(prob, depth_levels, depth_gt, mask, offset=None):
    """Wasserstein-1: E_prob |level (+ offset) - gt| over masked pixels
    (W_loss, loss3d.py:399-423; ``offset`` is the per-depth-plane learned
    refinement of the hypothesis grid, [N, D, H, W])."""
    # prob: [N, D, H, W]
    levels = depth_levels[None, :, None, None]
    if offset is not None:
        levels = levels + offset
    diff = jnp.abs(levels - depth_gt[:, None])
    per_px = jnp.sum(prob * diff, axis=1)
    m = mask.astype(per_px.dtype)
    return jnp.sum(per_px * m) / jnp.maximum(jnp.sum(m), 1.0)
