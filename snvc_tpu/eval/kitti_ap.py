"""Python wrapper for the C++ KITTI AP evaluator (cpp/kitti_eval.cpp).

Builds the binary on demand (g++ -O2) and parses its per-metric summary
lines into a nested dict:

    {"car": {"detection": {"ap11": [e, m, h], "ap40": [e, m, h]},
             "detection_ground": {...}, "detection_3d": {...},
             "orientation": {...}}}
"""

from __future__ import annotations

import os
import subprocess
from typing import Dict, Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "cpp", "kitti_eval.cpp")
_BIN = os.path.join(_REPO_ROOT, "cpp", "kitti_eval")


def build_evaluator(force: bool = False) -> str:
    if force or not os.path.exists(_BIN) or (
        os.path.getmtime(_BIN) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", _BIN, _SRC], check=True
        )
    return _BIN


def run_kitti_eval(
    gt_dir: str, result_dir: str, car_min_iou: Optional[float] = None
) -> Dict:
    """result_dir must contain data/XXXXXX.txt prediction files.

    ``car_min_iou`` overrides the official 0.7 car threshold (all three
    metrics) for diagnostic readouts, e.g. AP@0.5."""
    binary = build_evaluator()
    cmd = [binary, gt_dir, result_dir]
    if car_min_iou is not None:
        cmd.append(str(car_min_iou))
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    results: Dict[str, Dict] = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if len(parts) == 9 and parts[1] == "AP11:" and parts[5] == "AP40:":
            name = parts[0]
            cls, metric = name.split("_", 1)
            results.setdefault(cls, {})[metric] = {
                "ap11": [float(x) for x in parts[2:5]],
                "ap40": [float(x) for x in parts[6:9]],
            }
    return results
