"""LiDAR-coverage proposal diagnostics built on RoI-aware pooling.

A well-localized proposal cuboid captures roughly the same LiDAR point
mass as its matched GT cuboid; a drifted or shrunken one loses points.
``proposal_lidar_coverage`` quantifies that per proposal by pooling the
scene's point cloud into proposal-local voxel grids with
``ops.points_in_boxes.roiaware_pool3d`` (the TPU-native equivalent of the
reference's RoIAwarePool3d extension, snvc/extension/roiaware_pool3d/
roiaware_pool3d_utils.py:95-147) — the same op the reference ships for
pooling point features into box-local grids.

Runs on the CPU backend so diagnostics never contend with a device job.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np


@lru_cache(maxsize=8)
def _pool_fn(out_size: Tuple[int, int, int]):
    """Jitted kernel: occupancy grids + point counts for B boxes."""
    import jax
    import jax.numpy as jnp

    from snvc_tpu.ops.points_in_boxes import (
        points_in_cuboid_jnp,
        roiaware_pool3d,
    )

    def fn(points, valid, boxes):
        feats = jnp.ones((points.shape[0], 1), dtype=jnp.float32)
        pooled = roiaware_pool3d(points, feats, valid, boxes, out_size,
                                 mode="max")
        occ_frac = (pooled[..., 0] > 0).mean(axis=(1, 2, 3))
        counts = jax.vmap(
            lambda b: (points_in_cuboid_jnp(points, b) & valid).sum()
        )(boxes)
        return occ_frac, counts

    return jax.jit(fn)


def _cpu_ctx():
    import contextlib

    import jax

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def proposal_lidar_coverage(
    db: Sequence,
    out_size: Tuple[int, int, int] = (6, 6, 6),
) -> Dict[str, float]:
    """Median LiDAR coverage of proposals vs their matched GT boxes.

    db: InstanceRecords with both ``pred`` and ``label`` set (i.e. after
    ``attach_nearest_gt``) — records missing either are skipped.
    Returns medians of: points inside the proposal / the GT box, their
    ratio (1.0 = the proposal captures the full object point mass), and
    the occupied-voxel fraction of the proposal's pooled grid.
    """
    by_scene: Dict[str, List] = {}
    for rec in db:
        if rec.pred is None or rec.label is None:
            continue
        by_scene.setdefault(rec.scene.name, []).append(rec)
    if not by_scene:
        return {}

    clouds = {}
    for name, recs in by_scene.items():
        scene = recs[0].scene
        pc = scene.lidar()[:, :3]
        clouds[name] = recs[0].calib_left.velo_to_rect(pc).astype(np.float32)

    # one static shape for every scene so the kernel compiles once
    p_max = max(c.shape[0] for c in clouds.values())
    p_max = int(np.ceil(p_max / 4096) * 4096)
    b_max = max(len(r) for r in by_scene.values())

    ratios, prop_counts, gt_counts, occ_fracs = [], [], [], []
    for name, recs in by_scene.items():
        pc = clouds[name]
        pts = np.ones((p_max, 3), dtype=np.float32)
        pts[: pc.shape[0]] = pc
        valid = np.zeros(p_max, dtype=bool)
        valid[: pc.shape[0]] = True
        # pred and GT boxes pooled in one call; padded slots get unit boxes
        boxes = np.ones((2 * b_max, 7), dtype=np.float32)
        for i, rec in enumerate(recs):
            boxes[i] = rec.pred
            boxes[b_max + i] = rec.label
        with _cpu_ctx():
            occ, counts = _pool_fn(tuple(out_size))(pts, valid, boxes)
        occ, counts = np.asarray(occ), np.asarray(counts)
        for i in range(len(recs)):
            cp, cg = float(counts[i]), float(counts[b_max + i])
            prop_counts.append(cp)
            gt_counts.append(cg)
            ratios.append(cp / max(cg, 1.0))
            occ_fracs.append(float(occ[i]))

    return {
        "pts_in_proposal_med": round(float(np.median(prop_counts)), 1),
        "pts_in_gt_med": round(float(np.median(gt_counts)), 1),
        "coverage_ratio_med": round(float(np.median(ratios)), 3),
        "occ_frac_med": round(float(np.median(occ_fracs)), 3),
    }
