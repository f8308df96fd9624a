#!/usr/bin/env python
"""Generalization probe for the global model: proposal error on train vs val.

Loads a stage-1 (StereoNet) checkpoint, decodes proposals on both the train
and the val split of a synthetic KITTI work dir, and reports per-split
recall and center/x/z/yaw error medians against the nearest GT box.  A
detector that has learned stereo geometry shows comparable errors on both
splits; one that memorized appearance shows a train/val gap (the round-3
texture-memorization failure measured 0.065 m train vs 2.7 m val median
center error).

Example:
  python tools/diagnose_proposals.py --work_dir /tmp/two_stage_tpu4
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def make_runner(args, cfg, state):
    import jax

    from snvc_tpu.inference.detect import DetectRunner

    variables = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        variables["batch_stats"] = jax.device_get(state.batch_stats)
    return DetectRunner(
        cfg, variables, max_boxes=args.max_proposals,
        score_threshold=args.score_threshold, nms_iou=args.nms_iou,
    )


def split_stats(ds, pred_dir):
    import numpy as np

    from snvc_tpu.config import VernierConfig
    from snvc_tpu.data.instance_db import (
        attach_nearest_gt,
        build_db_from_predictions,
    )

    cfg = VernierConfig()
    db = attach_nearest_gt(
        build_db_from_predictions(ds, cfg, os.path.join(pred_dir, "data")), cfg
    )
    n_gt = sum(len(ds.scene(i).labels()) for i in range(len(ds)))
    d = {"n_proposals": len(db), "n_gt": n_gt}
    rows = []
    for rec in db:
        if rec.label is None:
            continue
        dc = float(np.linalg.norm(rec.pred[[3, 5]] - rec.label[[3, 5]]))
        dyaw = (rec.pred[6] - rec.label[6] + np.pi / 2) % np.pi - np.pi / 2
        rows.append(
            (
                dc,
                abs(float(rec.pred[3] - rec.label[3])),
                abs(float(rec.pred[5] - rec.label[5])),
                abs(float(np.degrees(dyaw))),
                # SIGNED size errors: systematically negative medians are
                # the signature of heading-averaged (shrunken) corners
                float(rec.pred[2] - rec.label[2]),  # dl
                float(rec.pred[1] - rec.label[1]),  # dw
            )
        )
    if rows:
        a = np.array(rows)
        med = np.median(a, axis=0)
        d.update(
            center_med_m=round(float(med[0]), 3),
            x_med_m=round(float(med[1]), 3),
            z_med_m=round(float(med[2]), 3),
            yaw_med_deg=round(float(med[3]), 1),
            dl_med_m=round(float(med[4]), 3),
            dw_med_m=round(float(med[5]), 3),
            # recall proxy: matched proposals within 1 m of a GT center
            within_1m=int((a[:, 0] < 1.0).sum()),
        )
    # RoI-aware LiDAR coverage (exercises ops.roiaware_pool3d): a
    # well-localized proposal captures ~the GT box's point mass (ratio→1)
    if rows and os.path.isdir(ds.lidar_dir):
        from snvc_tpu.eval.coverage import proposal_lidar_coverage

        d.update(proposal_lidar_coverage(db))
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", required=True)
    p.add_argument("--max_proposals", type=int, default=8)
    p.add_argument("--score_threshold", type=float, default=0.02)
    p.add_argument("--nms_iou", type=float, default=0.25)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--smoke", action="store_true")
    # config fields consumed by demo_two_stage.stereo_config; the loss-only
    # ones (reg_heading_sym, photo_aug, depth_*) have no effect on the
    # restored model's forward pass, but classes/num_hourglasses change
    # the architecture and MUST match the diagnosed checkpoint
    p.add_argument("--reg_heading_sym", action="store_true")
    p.add_argument("--classes", default="Car")
    p.add_argument("--photo_aug", action="store_true")
    p.add_argument("--num_hourglasses", type=int, default=1)
    p.add_argument("--depth_loss", default="sl1", choices=["sl1", "w1"])
    p.add_argument("--depth_offset", action="store_true")
    args = p.parse_args()

    import jax

    from snvc_tpu.config import TrainConfig
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.models.stereonet import StereoNet
    from snvc_tpu.training.train import load_checkpoint
    from snvc_tpu.training.train_stereo import create_stereo_state
    from snvc_tpu.utils import enable_compilation_cache
    from tools.demo_two_stage import stereo_config

    enable_compilation_cache()
    cfg = stereo_config(args)
    model = StereoNet(cfg)
    state = create_stereo_state(
        model, cfg, TrainConfig(), jax.random.PRNGKey(0)
    )
    tree, step = load_checkpoint(
        os.path.join(args.work_dir, "stereo_ckpt"), state
    )
    state = state.replace(
        params=tree["params"], batch_stats=tree.get("batch_stats") or {}
    )
    print(f"loaded step {step}", flush=True)

    runner = make_runner(args, cfg, state)
    out = {}
    for split, sub in (("train", "kitti_train"), ("val", "kitti_val")):
        root = os.path.join(args.work_dir, sub)
        if not os.path.isdir(root):
            continue
        pred_dir = os.path.join(args.work_dir, f"diag_{split}_props")
        ds = KittiDataset(root, split)
        runner.run(ds, pred_dir, log=lambda m: print(m, flush=True))
        out[split] = split_stats(ds, pred_dir)
        print(f"{split.upper()}: {out[split]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
