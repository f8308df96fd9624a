"""KITTI-format prediction writer.

Reference semantics (tools/inference_agnostic.py:277-364): one txt per
frame under <output_dir>/<pred_type>/data/, lines
"Car trunc occ alpha box2d(4) h w l x y z ry score", with alpha derived
from the refined pose, plus empty-file fill for frames without detections
on the test split.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np

from snvc_tpu.config import VernierConfig
from snvc_tpu.data.pipeline import InstanceBatch
from snvc_tpu.geometry.calib import ry_to_alpha


def instance_line(box3d, box2d, score, cls_name: str = "Car") -> str:
    alpha = ry_to_alpha(float(box3d[3]), float(box3d[5]), float(box3d[6]))
    f = [
        cls_name,
        "-1.0",
        "-1.0",
        f"{alpha:.6f}",
        f"{box2d[0]:.6f}",
        f"{box2d[1]:.6f}",
        f"{box2d[2]:.6f}",
        f"{box2d[3]:.6f}",
        f"{box3d[0]:.6f}",
        f"{box3d[1]:.6f}",
        f"{box3d[2]:.6f}",
        f"{box3d[3]:.6f}",
        f"{box3d[4]:.6f}",
        f"{box3d[5]:.6f}",
        f"{box3d[6]:.6f}",
        f"{score:.8f}",
    ]
    return " ".join(f)


class PredictionWriter:
    def __init__(self, cfg: VernierConfig, pred_types: Optional[Iterable[str]] = None):
        self.cfg = cfg
        self.pred_types = tuple(pred_types or cfg.pred_type)
        self.records: Dict[str, Dict[str, List[str]]] = {
            t: {} for t in self.pred_types
        }

    def add_batch(self, batch: InstanceBatch, out: Dict[str, np.ndarray]):
        for i, name in enumerate(batch.scene_names):
            if name is None or not batch.valid[i]:
                continue
            score = batch.scores[i]
            if np.isnan(score):
                score = 1.0
            for t in self.pred_types:
                box = out[t][i]
                line = instance_line(box, batch.box2d[i], float(score))
                self.records[t].setdefault(name, []).append(line)

    def write(self, output_dir: Optional[str] = None, calib_dir: Optional[str] = None):
        """Write all txt files; with calib_dir, fill empty files for frames
        without predictions (reference generate_empty_file:309-321)."""
        output_dir = output_dir or self.cfg.output_dir
        for t in self.pred_types:
            d = os.path.join(output_dir, t, "data")
            os.makedirs(d, exist_ok=True)
            for name, lines in self.records[t].items():
                with open(os.path.join(d, name + ".txt"), "w") as f:
                    f.write("\n".join(lines))
            if calib_dir and os.path.isdir(calib_dir):
                have = set(self.records[t])
                for fn in os.listdir(calib_dir):
                    if fn.endswith(".txt") and fn[:-4] not in have:
                        open(os.path.join(d, fn), "w").close()
        return output_dir
