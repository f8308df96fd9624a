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
    args = p.parse_args()

    import functools

    import jax
    import numpy as np

    from snvc_tpu.config import StereoConfig
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.stereo_pipeline import StereoPipeline
    from snvc_tpu.inference.detect import decode_proposals, proposals_to_kitti
    from snvc_tpu.models.stereonet import StereoEncoder, StereoHead, StereoNet
    from snvc_tpu.models.vernier import scope_variables
    from snvc_tpu.training.train import load_checkpoint
    from snvc_tpu.training.train_stereo import normalize_images
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
    pipe = StereoPipeline(ds, cfg, batch_size=1, training=False)

    # two chained XLA programs (encoder | head+decode): params passed as
    # arguments (closed-over arrays bake into the HLO as constants and
    # defeat the persistent compile cache), split along the same seam as
    # training to keep TPU compile time in minutes
    encoder = StereoEncoder(cfg)
    head = StereoHead(cfg)

    @jax.jit
    def run_encoder(vars_, b):
        return encoder.apply(
            vars_,
            normalize_images(b["images_left"]),
            normalize_images(b["images_right"]),
        )

    @jax.jit
    def run_head(vars_, feats, b):
        lf, rf, rpn_img = feats
        out = head.apply(vars_, lf, rf, rpn_img, b["P_left"], b["P_right"])
        return decode_proposals(
            out, cfg, max_boxes=args.max_boxes,
            score_threshold=args.score_threshold, nms_iou=args.nms_iou,
        )

    enc_vars = scope_variables(variables, "encoder")
    head_vars = scope_variables(variables, "head")

    def forward(b):
        return run_head(head_vars, run_encoder(enc_vars, b), b)

    out_data = os.path.join(args.output_dir, "data")
    os.makedirs(out_data, exist_ok=True)
    for bi, batch in enumerate(pipe.batches()):
        if args.max_frames is not None and bi >= args.max_frames:
            break
        boxes, scores, valid = jax.tree.map(np.asarray, forward(batch.arrays()))
        scene = ds.scene(int(batch.scene_names[0]))
        calib = scene.calibration("left")
        lines = proposals_to_kitti(boxes[0], scores[0], valid[0], calib)
        with open(os.path.join(out_data, batch.scene_names[0] + ".txt"), "w") as f:
            f.write("\n".join(lines))
        exp.logger.info(f"frame {batch.scene_names[0]}: {len(lines)} proposals")


if __name__ == "__main__":
    main()
