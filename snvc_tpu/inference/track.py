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

    def track(self, scenes: Sequence[KittiScene], init_box: np.ndarray,
              motion: str = "static", beta: float = 0.5
              ) -> List[TrackState]:
        """Refine the pose frame by frame from an initial cuboid.

        motion:
          * "static" — each frame's proposal is the previous refined pose
            verbatim (the reference's demonstrated behavior: local search
            from the previous cuboid, README.md:19-20).  The refiner must
            absorb the FULL per-frame motion, so tracking error grows once
            the object moves faster than the refiner's per-step correction.
          * "cv" — constant-velocity prior: the proposal extrapolates the
            previous refined pose by an EMA-damped velocity estimated from
            the refined-pose differences (alpha-beta filter flavor).  The
            refiner then only corrects the residual (acceleration +
            estimation noise), which is what keeps the error bounded.
        beta: EMA damping of the velocity estimate (0 = raw frame
          difference, which doubles pose-noise variance; 1 = frozen).
        """
        states: List[TrackState] = []
        box = np.asarray(init_box, np.float32)
        vel = np.zeros(4, np.float32)  # d(x, y, z, ry) per frame
        for fi, scene in enumerate(scenes):
            proposal = box.copy()
            if motion == "cv" and fi > 0:
                proposal[3:6] += vel[:3]
                proposal[6] += vel[3]
            st = self.step_frame(scene, proposal)
            states.append(st)
            if motion == "cv" and st.kept:
                obs = np.empty(4, np.float32)
                obs[:3] = st.box[3:6] - box[3:6]
                obs[3] = (st.box[6] - box[6] + np.pi) % (2 * np.pi) - np.pi
                # frame 0 refines the init pose in place — no motion yet
                vel = beta * vel + (1.0 - beta) * obs if fi > 0 else vel
            box = st.box
        return states
