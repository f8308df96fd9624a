#!/usr/bin/env python
"""Offline KITTI AP evaluation (reference: ./evaluate_object_3d_offline).

  python tools/evaluate.py GT_DIR RESULT_DIR
where RESULT_DIR contains data/XXXXXX.txt prediction files.  Prints the
AP11/AP40 summary per class/metric and a JSON dump.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gt_dir")
    p.add_argument("result_dir")
    p.add_argument("--json", action="store_true", help="print JSON only")
    args = p.parse_args()

    from snvc_tpu.eval.kitti_ap import run_kitti_eval

    res = run_kitti_eval(args.gt_dir, args.result_dir)
    if args.json:
        print(json.dumps(res))
        return
    for cls, metrics in res.items():
        for metric, vals in metrics.items():
            a11 = " ".join(f"{v:6.2f}" for v in vals["ap11"])
            a40 = " ".join(f"{v:6.2f}" for v in vals["ap40"])
            print(f"{cls:10s} {metric:18s} AP11 [{a11}]  AP40 [{a40}]")


if __name__ == "__main__":
    main()
