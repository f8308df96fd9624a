#!/usr/bin/env python
"""TraceBox prediction visualizer.

CLI equivalent of the reference's tools/visualize.py: renders KITTI-format
predictions over their frames with ray-traced hidden-line cuboids.

Example:
  python tools/visualize.py --pred_dir outputs/all_parts/data \
      --data_path data/kitti --split val --out_dir viz --max_frames 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--out_dir", default="viz")
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args()

    from snvc_tpu.viz.tracebox import visualize_predictions

    n = visualize_predictions(
        args.pred_dir, args.data_path, args.out_dir, args.split, args.max_frames
    )
    print(f"rendered {n} frames into {args.out_dir}")


if __name__ == "__main__":
    main()
