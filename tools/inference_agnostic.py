#!/usr/bin/env python
"""Model-agnostic refinement inference (the V-A path).

CLI equivalent of the reference's tools/inference_agnostic.py:32-92: refine
3D proposals from ANY detector's KITTI-format txt files with the Vernier
scale model, write refined KITTI predictions, optionally score them with
the C++ evaluator.

Example:
  python tools/inference_agnostic.py \
      --model_dir runs/vernier --data_path data/kitti --split val \
      --pred_dir proposals/ida3d --output_dir outputs/refined --evaluate
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="model-agnostic refinement")
    p.add_argument("--model_dir", required=True,
                   help="experiment dir with config.json + checkpoints/")
    p.add_argument("--data_path", required=True, help="KITTI root")
    p.add_argument("--split", default="val")
    p.add_argument("--pred_dir", required=True,
                   help="directory of KITTI-format proposal txt files")
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--pred_type", nargs="+", default=["all_parts"])
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--prefetch", type=int, default=4,
                   help="pipelined serving depth: batches dispatched ahead "
                   "of the oldest host pull (0 = synchronous)")
    p.add_argument("--report_loss", action="store_true",
                   help="also compute val losses against GT")
    p.add_argument("--evaluate", action="store_true",
                   help="run the KITTI AP evaluator on the output")
    p.add_argument("--debug", action="store_true",
                   help="cap to 1 batch and render NCF / occupancy / update "
                        "PNGs under <output_dir>/debug (reference "
                        "inference_agnostic.py:142-275)")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    import jax
    import numpy as np

    from snvc_tpu.utils import Experimenter, enable_compilation_cache
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.instance_db import (
        attach_nearest_gt,
        build_db_from_predictions,
    )
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.inference.kitti_writer import PredictionWriter
    from snvc_tpu.inference.refine import RefineRunner
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.training.train import load_checkpoint

    enable_compilation_cache()
    exp = Experimenter(args.model_dir)
    cfg = exp.config if not hasattr(exp.config, "vernier") else exp.config.vernier
    cfg = cfg.replace(pred_dir=args.pred_dir, output_dir=args.output_dir,
                      pred_type=tuple(args.pred_type))

    model = VernierScale(cfg)
    tree, step = load_checkpoint(exp.checkpoint_dir)
    params = {"params": tree["params"]}
    if tree.get("batch_stats"):
        params["batch_stats"] = tree["batch_stats"]
    exp.logger.info(f"loaded checkpoint step {step}")
    n_params = sum(np.prod(np.shape(x)) for x in jax.tree_util.tree_leaves(tree["params"]))
    exp.logger.info(f"number of model parameters: {n_params}")

    ds = KittiDataset(args.data_path, args.split)
    db = build_db_from_predictions(ds, cfg, args.pred_dir)
    if args.report_loss:
        db = attach_nearest_gt(db, cfg)
    exp.logger.info(f"{len(db)} proposal instances from {args.pred_dir}")
    pipe = RefinementPipeline(db, cfg, training=False, seed=args.seed,
                          load_lidar=args.report_loss)
    runner = RefineRunner(model, params, cfg)
    writer = PredictionWriter(cfg)
    if args.debug:
        from snvc_tpu.viz.debug import render_debug_batch

        batch = next(iter(pipe.batches()))
        out = runner.step(
            batch,
            with_targets=args.report_loss,
            host_outputs=runner.HOST_OUTPUTS + ("ncf", "occupancy"),
        )
        writer.add_batch(batch, out)
        paths = render_debug_batch(
            batch, out, os.path.join(args.output_dir, "debug")
        )
        exp.logger.info(f"debug renders: {sorted(paths.values())}")
        if "losses" in out:
            exp.logger.info(
                "losses: "
                + ", ".join(f"{k}={float(v):.4f}" for k, v in out["losses"].items())
            )
    else:
        runner.run(pipe, writer=writer, with_targets=args.report_loss,
                   max_batches=args.max_batches, prefetch=args.prefetch)
    calib_dir = ds.calib_dir if args.split == "test" else None
    out = writer.write(args.output_dir, calib_dir=calib_dir)
    exp.logger.info(f"wrote predictions under {out}")

    if args.evaluate:
        from snvc_tpu.eval.kitti_ap import run_kitti_eval

        gt_dir = ds.label_dir
        for t in cfg.pred_type:
            res = run_kitti_eval(gt_dir, os.path.join(args.output_dir, t))
            exp.logger.info(f"[{t}] {res}")


if __name__ == "__main__":
    main()
