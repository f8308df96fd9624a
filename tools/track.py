#!/usr/bin/env python
"""Tracking-by-detection demo driver (reference README.md:19-20).

Track one object across a KITTI frame sequence from an initial cuboid:

  python tools/track.py --model_dir runs/vernier --data_path data/kitti \
      --frames 0 1 2 3 --init_box 1.5 1.6 3.8 2.0 1.65 20.0 0.0
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
    p.add_argument("--frames", type=int, nargs="+", required=True)
    p.add_argument("--init_box", type=float, nargs=7, required=True,
                   help="h w l x y z ry (KITTI rect frame, bottom center)")
    p.add_argument("--update", default="all_parts",
                   choices=["all_parts", "one_part"])
    p.add_argument("--motion", default="static", choices=["static", "cv"],
                   help="proposal prior between frames: previous pose, or "
                   "a constant-velocity extrapolation (EMA-damped) so the "
                   "refiner only corrects the residual — bounded error "
                   "over long sequences (docs/TRACKING.md)")
    p.add_argument("--motion_beta", type=float, default=0.5,
                   help="EMA damping of the velocity estimate (cv prior)")
    args = p.parse_args()

    import numpy as np

    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.inference.refine import RefineRunner
    from snvc_tpu.inference.track import Tracker
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.training.train import load_checkpoint
    from snvc_tpu.utils import Experimenter, enable_compilation_cache

    enable_compilation_cache()
    exp = Experimenter(args.model_dir)
    cfg = exp.config if not hasattr(exp.config, "vernier") else exp.config.vernier
    model = VernierScale(cfg)
    tree, step = load_checkpoint(exp.checkpoint_dir)
    params = {"params": tree["params"]}
    if tree.get("batch_stats"):
        params["batch_stats"] = tree["batch_stats"]

    ds = KittiDataset(args.data_path, args.split)
    runner = RefineRunner(model, params, cfg.replace(max_instances=1))
    tracker = Tracker(runner, cfg.replace(max_instances=1), update=args.update)
    scenes = [ds.scene(i) for i in args.frames]
    states = tracker.track(scenes, np.array(args.init_box),
                           motion=args.motion, beta=args.motion_beta)
    for fi, st in zip(args.frames, states):
        b = st.box
        print(
            f"frame {fi:06d}: kept={st.kept} conf={st.confidence:.3f} "
            f"box=[{', '.join(f'{v:.3f}' for v in b)}]"
        )


if __name__ == "__main__":
    main()
