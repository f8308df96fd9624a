"""Host-side batch construction for the instance (Vernier) path.

The host stays thin (SURVEY.md §7.3 "host/device split" risk): per frame it
decodes the two PNGs and parses calib; per instance it does a handful of
9-point projections to build the crop affines.  Everything pixel- or
voxel-shaped happens on device (snvc_tpu.ops.assemble).

All batches have static shapes: ``frames_per_batch`` image slots and
``max_instances`` instance slots with validity masks, LiDAR padded to
``max_points`` — XLA compiles the step exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from snvc_tpu.config import VernierConfig
from snvc_tpu.data.instance_db import InstanceRecord, perturb_box
from snvc_tpu.geometry import boxes as gbox
from snvc_tpu.geometry import imgproc


@dataclass
class InstanceBatch:
    """One fixed-shape device batch (all numpy, ready for device_put)."""

    images_left: np.ndarray  # [F, H, W, 3] uint8 (padded)
    images_right: np.ndarray
    P_left: np.ndarray  # [F, 3, 4]
    P_right: np.ndarray
    image_idx: np.ndarray  # [I] int32
    trans_l: np.ndarray  # [I, 2, 3]
    trans_r: np.ndarray
    samples: np.ndarray  # [I, 7] proposals
    valid: np.ndarray  # [I] bool
    # training extras (zeros when not training)
    gt_boxes: np.ndarray  # [I, 7]
    points: np.ndarray  # [I, Np, 3] rect-frame LiDAR
    points_valid: np.ndarray  # [I, Np] bool
    # bookkeeping (host only)
    scene_names: List[str] = None
    box2d: np.ndarray = None  # [I, 4]
    scores: np.ndarray = None  # [I]

    def arrays(self) -> Dict[str, np.ndarray]:
        return dict(
            images_left=self.images_left,
            images_right=self.images_right,
            P_left=self.P_left,
            P_right=self.P_right,
            image_idx=self.image_idx,
            trans_l=self.trans_l,
            trans_r=self.trans_r,
            samples=self.samples,
            valid=self.valid,
            gt_boxes=self.gt_boxes,
            points=self.points,
            points_valid=self.points_valid,
        )


def roi_box3d(sample: np.ndarray, cfg: VernierConfig) -> np.ndarray:
    """The refinement-space cuboid: sample pose with the grid range as
    dims, re-anchored to keep the box *center* fixed
    (reference _generate_rois, KITTIRefinement_dataset.py:585-591)."""
    box = sample.copy()
    old_center_y = box[4] - 0.5 * box[0]
    box[:3] = cfg.grid_range
    box[4] = old_center_y + 0.5 * box[0]
    return box


def crop_transforms(
    sample: np.ndarray,
    calib_left,
    calib_right,
    cfg: VernierConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-instance 2x3 source->ROI affines for both views."""
    box = roi_box3d(sample, cfg)
    kpts3d = gbox.box_parts_cam(box)  # [9, 3]
    tl = imgproc.roi_crop_transform(
        calib_left.rect_to_image(kpts3d), cfg.resolution, cfg.roi_enlarge
    )
    tr = imgproc.roi_crop_transform(
        calib_right.rect_to_image(kpts3d), cfg.resolution, cfg.roi_enlarge
    )
    return tl.astype(np.float32), tr.astype(np.float32)


def select_points(
    pc_rect: np.ndarray, sample: np.ndarray, cfg: VernierConfig, max_points: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pick LiDAR points near the instance and pad to a static count."""
    center = sample[3:6]
    r = 1.5 * max(cfg.grid_range)
    near = (
        (np.abs(pc_rect[:, 0] - center[0]) < r)
        & (np.abs(pc_rect[:, 2] - center[2]) < r)
        & (np.abs(pc_rect[:, 1] - center[1]) < r)
    )
    pts = pc_rect[near]
    if len(pts) > max_points:
        stride = int(np.ceil(len(pts) / max_points))
        pts = pts[::stride][:max_points]
    out = np.zeros((max_points, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros(max_points, bool)
    mask[: len(pts)] = True
    return out, mask


class RefinementPipeline:
    """Iterates fixed-shape InstanceBatches over an instance DB."""

    def __init__(
        self,
        db: Sequence[InstanceRecord],
        cfg: VernierConfig,
        training: bool = False,
        max_points: int = 4096,
        seed: int = 0,
        load_lidar: Optional[bool] = None,
        noise_bank: Optional[np.ndarray] = None,
    ):
        self.db = list(db)
        self.cfg = cfg
        self.training = training
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)
        self.load_lidar = training if load_lidar is None else load_lidar
        # [K, 7] measured proposal-minus-GT deltas: train-time perturbations
        # bootstrap from a specific detector's empirical error distribution
        # (correlated, biased) instead of iid Gaussians (instance_db.perturb_box)
        self.noise_bank = None if noise_bank is None else np.asarray(noise_bank)

    def __len__(self) -> int:
        return sum(1 for _ in self._frame_groups())

    def _frame_groups(self) -> Iterator[List[InstanceRecord]]:
        """Pack consecutive records into batches bounded by the instance
        budget AND the image-slot budget (cfg.frames_per_batch): with one
        slot this is the classic one-frame-per-batch grouping; with more,
        sparse scenes share a batch instead of wasting padded slots."""
        max_frames = max(1, self.cfg.frames_per_batch)
        cur: List[InstanceRecord] = []
        frames: List[int] = []
        for rec in self.db:
            new_frame = not frames or rec.scene.index != frames[-1]
            if cur and (
                len(cur) >= self.cfg.max_instances
                or (new_frame and len(frames) >= max_frames)
            ):
                yield cur
                cur, frames = [], []
                new_frame = True
            cur.append(rec)
            if new_frame:
                frames.append(rec.scene.index)
        if cur:
            yield cur

    def batches(self, shuffle: bool = False) -> Iterator[InstanceBatch]:
        groups = list(self._frame_groups())
        order = np.arange(len(groups))
        if shuffle:
            self.rng.shuffle(order)
        for gi in order:
            yield self.make_batch(groups[gi])

    def make_batch(self, records: Sequence[InstanceRecord]) -> InstanceBatch:
        cfg = self.cfg
        F = max(1, cfg.frames_per_batch)  # static image-slot count
        I = cfg.max_instances
        Np = self.max_points
        img_h, img_w = cfg.image_size

        # distinct frames of this group, in order
        frame_recs: List[InstanceRecord] = []
        frame_of: Dict[int, int] = {}
        for rec in records:
            if rec.scene.index not in frame_of:
                frame_of[rec.scene.index] = len(frame_recs)
                frame_recs.append(rec)
        assert len(frame_recs) <= F, "group exceeds frames_per_batch"

        images_left = np.zeros((F, img_h, img_w, 3), np.uint8)
        images_right = np.zeros((F, img_h, img_w, 3), np.uint8)
        P_left = np.tile(np.eye(3, 4, dtype=np.float32), (F, 1, 1))
        P_right = P_left.copy()
        pc_rects = [None] * F
        for fi, rec in enumerate(frame_recs):
            scene = rec.scene
            images_left[fi] = scene.load_image_padded("left", (img_h, img_w))
            images_right[fi] = scene.load_image_padded("right", (img_h, img_w))
            P_left[fi] = rec.calib_left.as_array()
            P_right[fi] = rec.calib_right.as_array()
            if self.load_lidar:
                pc = scene.lidar()[:, :3]
                pc_rects[fi] = rec.calib_left.velo_to_rect(pc).astype(np.float32)

        samples = np.zeros((I, 7), np.float32)
        gt_boxes = np.zeros((I, 7), np.float32)
        trans_l = np.tile(np.eye(2, 3, dtype=np.float32), (I, 1, 1))
        trans_r = trans_l.copy()
        valid = np.zeros(I, bool)
        image_idx = np.zeros(I, np.int32)
        box2d = np.zeros((I, 4), np.float32)
        scores = np.full(I, np.nan, np.float32)
        points = np.zeros((I, Np, 3), np.float32)
        points_valid = np.zeros((I, Np), bool)

        for k, rec in enumerate(records):
            image_idx[k] = frame_of[rec.scene.index]
            pc_rect = pc_rects[image_idx[k]]
            if rec.pred is not None:
                sample = rec.pred.copy()
            else:
                base = rec.label
                sample = (
                    perturb_box(
                        base, cfg, self.rng,
                        calib_left=rec.calib_left, calib_right=rec.calib_right,
                        image_hw=rec.scene.native_image_size()
                        if cfg.check_fov else None,
                        noise_bank=self.noise_bank,
                    )
                    if (self.training and cfg.augment) or cfg.sup_type == "synthetic"
                    else base.copy()
                )
            samples[k] = sample
            if rec.label is not None:
                gt_boxes[k] = rec.label
            tl, tr = crop_transforms(sample, rec.calib_left, rec.calib_right, cfg)
            trans_l[k], trans_r[k] = tl, tr
            valid[k] = True
            if rec.box2d is not None:
                box2d[k] = rec.box2d
            scores[k] = rec.score
            if pc_rect is not None:
                points[k], points_valid[k] = select_points(
                    pc_rect, sample, cfg, Np
                )

        return InstanceBatch(
            images_left=images_left,
            images_right=images_right,
            P_left=P_left.astype(np.float32),
            P_right=P_right.astype(np.float32),
            image_idx=image_idx,
            trans_l=trans_l,
            trans_r=trans_r,
            samples=samples,
            valid=valid,
            gt_boxes=gt_boxes,
            points=points,
            points_valid=points_valid,
            scene_names=[r.scene.name for r in records]
            + [None] * (I - len(records)),
            box2d=box2d,
            scores=scores,
        )
