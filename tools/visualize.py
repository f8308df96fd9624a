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


def visualize_top_views(pred_dir, data_root, out_dir, split, max_frames=None):
    """Render LiDAR top views with GT (green) + prediction (score-shaded)
    footprints — the legacy-viz flow (reference
    snvc/visualization/kitti_util.py:428-530,696-752)."""
    import imageio.v2 as imageio
    import numpy as np

    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.geometry.boxes import bev_box_corners, box3d_to_bev
    from snvc_tpu.geometry.calib import read_label
    from snvc_tpu.viz.lidar import (
        TopViewSpec,
        draw_boxes_on_top,
        lidar_to_top,
        top_view_image,
    )

    def rings_velo(labels, calib):
        rings = []
        for lb in labels:
            if lb.type == "DontCare":
                continue
            ring = bev_box_corners(box3d_to_bev(lb.box3d))  # [4, 2] cam (x, z)
            cam = np.stack(
                [ring[:, 0], np.full(4, lb.box3d[4]), ring[:, 1]], axis=1
            )
            rings.append(calib.rect_to_velo(cam)[:, :2])
        return np.array(rings).reshape(-1, 4, 2)

    ds = KittiDataset(data_root, split)
    os.makedirs(out_dir, exist_ok=True)
    spec = TopViewSpec()
    count = 0
    for fn in sorted(os.listdir(pred_dir)):
        if not fn.endswith(".txt"):
            continue
        if max_frames is not None and count >= max_frames:
            break
        idx = int(fn.split(".")[0])
        scene = ds.scene(idx)
        calib = scene.calibration("left")
        img = top_view_image(lidar_to_top(scene.lidar(), spec))
        gt = [lb for lb in scene.labels() if lb.type != "DontCare"]
        if gt:
            img = draw_boxes_on_top(img, rings_velo(gt, calib), spec, is_gt=True)
        preds = read_label(os.path.join(pred_dir, fn))
        if preds:
            scores = [lb.score if lb.score is not None else 1.0 for lb in preds]
            img = draw_boxes_on_top(
                img, rings_velo(preds, calib), spec, scores=scores
            )
        imageio.imwrite(os.path.join(out_dir, f"{idx:06d}_top.png"), img)
        count += 1
    return count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--out_dir", default="viz")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--top_view", action="store_true",
                   help="render LiDAR BEV top views (legacy-viz equivalent) "
                   "instead of the TraceBox camera-frame renders")
    args = p.parse_args()

    if args.top_view:
        n = visualize_top_views(
            args.pred_dir, args.data_path, args.out_dir, args.split,
            args.max_frames,
        )
    else:
        from snvc_tpu.viz.tracebox import visualize_predictions

        n = visualize_predictions(
            args.pred_dir, args.data_path, args.out_dir, args.split,
            args.max_frames,
        )
    print(f"rendered {n} frames into {args.out_dir}")


if __name__ == "__main__":
    main()
