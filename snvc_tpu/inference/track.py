"""Tracking-by-detection with the Vernier model.

The reference demonstrates tracking by searching for an object's next-frame
pose starting from an initial cuboid (README.md:19-20, demo docs absent):
the refinement model IS the tracker — each new frame's proposal is the
previous frame's refined box.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from snvc_tpu.config import VernierConfig
from snvc_tpu.data.instance_db import InstanceRecord
from snvc_tpu.data.kitti import KittiScene
from snvc_tpu.data.pipeline import RefinementPipeline
from snvc_tpu.inference.refine import RefineRunner


@dataclass
class TrackState:
    box: np.ndarray  # [7] current pose
    confidence: float
    kept: bool


class Tracker:
    """Sequential local-search tracker over a frame sequence."""

    def __init__(self, runner: RefineRunner, cfg: VernierConfig,
                 update: str = "all_parts"):
        self.runner = runner
        self.cfg = cfg
        self.update = update
        self._pipe = RefinementPipeline([], cfg, training=False)

    def step_frame(self, scene: KittiScene, box: np.ndarray,
                   calib_left=None, calib_right=None) -> TrackState:
        cl = calib_left or scene.calibration("left")
        cr = calib_right or scene.calibration("right")
        rec = InstanceRecord(
            scene=scene, calib_left=cl, calib_right=cr,
            pred=box.astype(np.float32),
            box2d=np.zeros(4, np.float32), score=1.0,
        )
        batch = self._pipe.make_batch([rec])
        out = self.runner.step(batch)
        kept = bool(out["keep"][0])
        new_box = np.asarray(out[self.update][0]) if kept else box
        conf = float(np.asarray(out["confidence"])[0].mean())
        return TrackState(box=new_box, confidence=conf, kept=kept)

    def track(self, scenes: Sequence[KittiScene], init_box: np.ndarray
              ) -> List[TrackState]:
        """Refine the pose frame by frame from an initial cuboid."""
        states: List[TrackState] = []
        box = np.asarray(init_box, np.float32)
        for scene in scenes:
            st = self.step_frame(scene, box)
            states.append(st)
            box = st.box
        return states
