"""Global-model proposal decoding: corners -> boxes -> rotated NMS -> KITTI.

The reference's detection post-processing lives in its unreleased
StereoNet; the shipped pieces dictate the interfaces: corner-parameterized
regression (loss3d.py:100-102), rotated NMS (iou3d_nms_utils.py:88-103),
and KITTI-format proposal files consumed by the Vernier stage.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snvc_tpu.config import StereoConfig
from snvc_tpu.models.stereonet import bev_locations
from snvc_tpu.ops.nms import rotated_nms_bev, top_k_boxes
from snvc_tpu.ops.rotated_iou import bev_from_box3d


def corners24_to_box3d(corners):
    """[..., 24] corner offsets (already +anchor) -> box3d [..., 7].

    Inverts the compute_corners_sc layout (stereo_losses.gt_corners_24):
    bottom 4 corners then top 4; heading from the corner0->corner3 edge.
    """
    c = corners.reshape(corners.shape[:-1] + (8, 3))
    bottom = c[..., :4, :]
    top = c[..., 4:, :]
    center_xz = jnp.mean(c[..., (0, 2)], axis=-2)
    y_bottom = jnp.mean(bottom[..., 1], axis=-1)
    h = jnp.mean(bottom[..., 1] - top[..., 1], axis=-1)
    e_l = bottom[..., 0, :] - bottom[..., 3, :]  # length edge
    e_w = bottom[..., 0, :] - bottom[..., 1, :]  # width edge
    l = jnp.linalg.norm(e_l[..., (0, 2)], axis=-1)
    w = jnp.linalg.norm(e_w[..., (0, 2)], axis=-1)
    ry = jnp.arctan2(-e_l[..., 2], e_l[..., 0])
    return jnp.stack(
        [h, w, l, center_xz[..., 0], y_bottom, center_xz[..., 1], ry], axis=-1
    )


def decode_proposals(
    outputs: Dict,
    cfg: StereoConfig,
    max_boxes: int = 128,
    score_threshold: float = 0.1,
    nms_iou: float = 0.25,
):
    """Decode one batch of RPN outputs into padded proposal sets.

    Returns (boxes3d [N, max_boxes, 7], scores [N, max_boxes],
    valid [N, max_boxes]).
    """
    A, K = cfg.num_angles, cfg.num_classes
    locations = jnp.asarray(bev_locations(cfg))  # [L, 2]
    L = locations.shape[0]
    # per-class anchor heights when configured (matches assign_targets)
    anchors_y = jnp.broadcast_to(jnp.asarray(cfg.anchors_y), (K,))

    def one(cls, reg, ctr):
        cls = cls.reshape(L, A, K)
        reg = reg.reshape(L, A, K, 24)
        ctr = ctr.reshape(L, A)
        score = jax.nn.sigmoid(cls) * jax.nn.sigmoid(ctr)[..., None]
        score = score.reshape(L * A * K)
        anchor3d = jnp.stack(
            [
                jnp.broadcast_to(locations[:, 0:1], (L, K)),
                jnp.broadcast_to(anchors_y[None, :], (L, K)),
                jnp.broadcast_to(locations[:, 1:2], (L, K)),
            ],
            axis=-1,
        )  # [L, K, 3]
        corners = reg + jnp.tile(anchor3d, (1, 1, 8))[:, None, :, :]
        boxes = corners24_to_box3d(corners).reshape(L * A * K, 7)
        # keep the top pool before NMS to bound the IoU matrix
        pool = min(4 * max_boxes, L * A * K)
        idx = jnp.argsort(-score)[:pool]
        bsel = boxes[idx]
        ssel = score[idx]
        vsel = ssel > score_threshold
        keep = rotated_nms_bev(bev_from_box3d(bsel), ssel, vsel, nms_iou)
        return top_k_boxes(bsel, ssel, keep, max_boxes)

    return jax.vmap(one)(outputs["cls"], outputs["reg"], outputs["centerness"])


def proposals_to_kitti(
    boxes3d: np.ndarray,
    scores: np.ndarray,
    valid: np.ndarray,
    calib,
    image_hw=(375, 1242),
    cls_name: str = "Car",
):
    """Format decoded proposals as KITTI label lines (with projected 2D
    boxes) for the refinement stage / evaluator."""
    from snvc_tpu.geometry import boxes as gbox
    from snvc_tpu.inference.kitti_writer import instance_line

    lines = []
    H, W = image_hw
    for b, s, v in zip(boxes3d, scores, valid):
        if not v or not np.isfinite(s):
            continue
        uv = calib.rect_to_image(gbox.box_corners_cam(b))
        box2d = np.array(
            [uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]
        )
        box2d = np.clip(box2d, 0, [W - 1, H - 1, W - 1, H - 1])
        lines.append(instance_line(b, box2d, float(s), cls_name))
    return lines
