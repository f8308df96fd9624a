#!/usr/bin/env python
"""Refinement decode diagnosis: which part-position source actually helps?

Loads the vernier checkpoint a two-stage run saved (work_dir/vernier_ckpt),
re-runs refinement over the run's stage-1 proposals with each requested
``ncf_decode`` source ("coordinates" = reference CLI behavior via the
part-reg head, inference_agnostic.py:396-402; "argmax" / "soft-argmax" =
heatmap decode, img_proc.get_max_preds / soft_arg_max), and reports, per
decode and pred_type:

  * median center / yaw error vs GT and the median |update| magnitude
    (a mean-collapsed head shows up as |update| << proposal error),
  * Car AP3D / APBEV at IoU 0.7 and 0.5 via the bundled C++ evaluator.

Outputs land in work_dir/refined_diag/<decode>/<pred_type>.

Example:
  python tools/diagnose_refinement.py --work_dir .runs/two_stage_big \
      --decodes coordinates argmax soft-argmax
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def box_errors(pred_rows, gt_rows):
    """Median center (BEV) / yaw-mod-pi errors of matched boxes."""
    import numpy as np

    cerr, yerr = [], []
    for r in pred_rows:
        g = gt_rows
        if not len(g):
            continue
        d = np.linalg.norm(g[:, [3, 5]] - r[[3, 5]][None], axis=1)
        i = int(np.argmin(d))
        if d[i] > 3.0:
            continue
        cerr.append(float(d[i]))
        dy = (r[6] - g[i, 6] + np.pi / 2) % np.pi - np.pi / 2
        yerr.append(abs(float(dy)))
    return cerr, yerr


def load_kitti_boxes(d):
    import glob

    import numpy as np

    out = {}
    for f in sorted(glob.glob(os.path.join(d, "*.txt"))):
        rows = []
        for line in open(f):
            p = line.split()
            if p:
                rows.append([float(v) for v in p[8:15]])
        out[os.path.basename(f)[:-4]] = np.array(rows, np.float32).reshape(-1, 7)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", required=True)
    p.add_argument("--decodes", nargs="+",
                   default=["coordinates", "argmax", "soft-argmax"])
    p.add_argument("--pred_types", nargs="+",
                   default=["one_part", "all_parts"])
    args = p.parse_args()

    import numpy as np

    from snvc_tpu.config import VernierConfig, load_config
    from snvc_tpu.data.instance_db import build_db_from_predictions
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.eval.kitti_ap import run_kitti_eval
    from snvc_tpu.inference.kitti_writer import PredictionWriter
    from snvc_tpu.inference.refine import RefineRunner
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.training.train import load_checkpoint
    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    ckpt_dir = os.path.join(args.work_dir, "vernier_ckpt")
    cfg = load_config(os.path.join(ckpt_dir, "config.json"), VernierConfig)
    tree, step = load_checkpoint(ckpt_dir)
    params = {"params": tree["params"]}
    if tree.get("batch_stats"):
        params["batch_stats"] = tree["batch_stats"]
    print(f"vernier checkpoint at step {step}", flush=True)

    val_root = os.path.join(args.work_dir, "kitti_val")
    pred_dir = os.path.join(args.work_dir, "proposals", "data")
    vds = KittiDataset(val_root, "val")
    gt = load_kitti_boxes(vds.label_dir)
    prop = load_kitti_boxes(pred_dir)

    def stats(pred_boxes, name, res_dir=None):
        cerr, yerr, moves = [], [], []
        for frame, rows in pred_boxes.items():
            c, y = box_errors(rows, gt.get(frame, np.zeros((0, 7))))
            cerr += c
            yerr += y
            pr = prop.get(frame)
            if pr is not None and len(pr) == len(rows):
                moves += list(np.linalg.norm(rows[:, 3:6] - pr[:, 3:6], axis=1))
        row = {
            "center_med_m": float(np.median(cerr)) if cerr else None,
            "yaw_med_deg": float(np.degrees(np.median(yerr))) if yerr else None,
            "update_med_m": float(np.median(moves)) if moves else 0.0,
            "n": len(cerr),
        }
        if res_dir is not None:
            ap7 = run_kitti_eval(vds.label_dir, res_dir)["car"]
            ap5 = run_kitti_eval(vds.label_dir, res_dir, car_min_iou=0.5)["car"]
            row["ap3d"] = ap7["detection_3d"]["ap40"]
            row["apbev"] = ap7["detection_ground"]["ap40"]
            row["ap3d_iou50"] = ap5["detection_3d"]["ap40"]
        print(f"{name}: " + json.dumps(row), flush=True)
        return row

    report = {"step": step,
              "proposals": stats(prop, "proposals",
                                 os.path.join(args.work_dir, "proposals"))}

    model = VernierScale(cfg)
    base_cfg = cfg.replace(usage="inference", sup_type="real", augment=False,
                           pred_type=tuple(args.pred_types))
    for decode in args.decodes:
        infer_cfg = base_cfg.replace(ncf_decode=decode)
        vdb = build_db_from_predictions(vds, infer_cfg, pred_dir)
        vpipe = RefinementPipeline(vdb, infer_cfg, training=False,
                                   load_lidar=False)
        runner = RefineRunner(model, params, infer_cfg)
        writer = PredictionWriter(infer_cfg)
        runner.run(vpipe, writer=writer, progress=False)
        out_dir = os.path.join(args.work_dir, "refined_diag", decode)
        writer.write(out_dir)
        for t in args.pred_types:
            d = os.path.join(out_dir, t)
            report[f"{decode}/{t}"] = stats(
                load_kitti_boxes(os.path.join(d, "data")), f"{decode}/{t}", d
            )

    with open(os.path.join(args.work_dir, "refined_diag", "report.json"),
              "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
