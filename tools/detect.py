#!/usr/bin/env python
"""Run the global stereo detector and emit KITTI-format proposals.

The two-stage pipeline end to end:
  python tools/detect.py --model_dir runs/stereo --data_path data/kitti \
      --split val --output_dir proposals/stereonet
  python tools/inference_agnostic.py --model_dir runs/vernier \
      --data_path data/kitti --pred_dir proposals/stereonet/data ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--output_dir", default="proposals")
    p.add_argument("--score_threshold", type=float, default=0.1)
    p.add_argument("--nms_iou", type=float, default=0.25)
    p.add_argument("--max_boxes", type=int, default=64)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--prefetch", type=int, default=4,
                   help="pipelined serving depth (0 = synchronous)")
    args = p.parse_args()

    from snvc_tpu.config import StereoConfig
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.inference.detect import DetectRunner
    from snvc_tpu.training.train import load_checkpoint
    from snvc_tpu.utils import Experimenter, enable_compilation_cache

    enable_compilation_cache()
    exp = Experimenter(args.model_dir)
    cfg = exp.config if isinstance(exp.config, StereoConfig) else exp.config.stereo
    tree, step = load_checkpoint(exp.checkpoint_dir)
    variables = {"params": tree["params"]}
    if tree.get("batch_stats"):
        variables["batch_stats"] = tree["batch_stats"]
    exp.logger.info(f"loaded checkpoint step {step}")

    ds = KittiDataset(args.data_path, args.split)
    runner = DetectRunner(
        cfg, variables, max_boxes=args.max_boxes,
        score_threshold=args.score_threshold, nms_iou=args.nms_iou,
    )
    runner.run(ds, args.output_dir, prefetch=args.prefetch,
               max_frames=args.max_frames, log=exp.logger.info)


if __name__ == "__main__":
    main()
