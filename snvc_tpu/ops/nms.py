"""Rotated NMS without dynamic shapes.

Replaces the reference's 64-bit-bitmask CUDA NMS + host-side greedy loop
(iou3d_nms_kernel.cu:296-401, iou3d_nms.cpp:131-227) with a fully
on-device formulation: one pairwise rotated-IoU matrix, then a bounded
sequential scan implementing exact greedy suppression.  Deterministic and
jit-able; output is a fixed-size keep mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from snvc_tpu.ops.rotated_iou import bev_iou


def nms_from_iou(iou, scores, valid, iou_threshold: float):
    """Greedy NMS given a pairwise IoU matrix.

    iou: [N, N]; scores: [N]; valid: [N] bool.  Returns keep [N] bool.
    Exact greedy order (descending score), like the reference host loop.
    """
    N = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_o = iou[order][:, order]  # reorder to descending score
    valid_o = valid[order]

    def body(i, suppressed):
        alive = valid_o[i] & ~suppressed[i]
        row = (iou_o[i] > iou_threshold) & (jnp.arange(N) > i) & alive
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, N, body, jnp.zeros(N, bool))
    keep_o = valid_o & ~suppressed
    # scatter back to original order
    keep = jnp.zeros(N, bool).at[order].set(keep_o)
    return keep


def rotated_nms_bev(
    boxes_bev, scores, valid, iou_threshold: float = 0.7
):
    """boxes_bev [N, 5] (cx, cz, w, h, angle); returns keep mask [N]
    (reference nms_gpu semantics, iou3d_nms_utils.py:88-103)."""
    iou = bev_iou(boxes_bev, boxes_bev)
    return nms_from_iou(iou, scores, valid, iou_threshold)


def axis_aligned_iou(boxes):
    """Pairwise IoU of axis-aligned BEV boxes [N, 4] (x1, z1, x2, z2)
    (reference nms_normal_gpu path, iou3d_nms_kernel.cu:343-401)."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    z1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    z2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x2 - x1, 0, None) * jnp.clip(z2 - z1, 0, None)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.clip(union, 1e-8, None)


def normal_nms(boxes, scores, valid, iou_threshold: float = 0.7):
    """Axis-aligned NMS (reference nms_normal_gpu)."""
    return nms_from_iou(axis_aligned_iou(boxes), scores, valid, iou_threshold)


def top_k_boxes(boxes, scores, keep, k: int):
    """Select the k highest-scoring kept boxes (padded, static shape).

    Returns (boxes [k, ...], scores [k], valid [k])."""
    masked = jnp.where(keep, scores, -jnp.inf)
    idx = jnp.argsort(-masked)[:k]
    sel_valid = jnp.take(keep, idx)
    return jnp.take(boxes, idx, axis=0), jnp.take(masked, idx), sel_valid
