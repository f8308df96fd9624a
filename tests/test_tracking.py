"""Tracking-by-detection driver test on synthetic frames."""

import numpy as np
import pytest

import jax

from snvc_tpu.config import tiny_vernier_config
from snvc_tpu.data.kitti import KittiDataset
from snvc_tpu.data.synthetic import make_synthetic_kitti
from snvc_tpu.inference.refine import RefineRunner
from snvc_tpu.inference.track import Tracker
from snvc_tpu.models.vernier import VernierScale


def test_tracker_runs_and_stays_bounded(tmp_path, rng):
    import jax.numpy as jnp

    root = str(tmp_path)
    boxes = make_synthetic_kitti(root, num_frames=3, boxes_per_frame=1, seed=3)
    cfg = tiny_vernier_config(max_instances=1, image_size=(384, 1248))
    model = VernierScale(cfg)
    H, W = cfg.resolution
    P = int(np.prod(cfg.grid_resolution))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, P, 2)),
        jnp.zeros((1, P, 2)),
    )
    runner = RefineRunner(model, params, cfg)
    tracker = Tracker(runner, cfg)
    ds = KittiDataset(root, "val")
    init = boxes[0][0].copy()
    init[3] += 0.2  # slightly off
    states = tracker.track(ds.scenes(), init)
    assert len(states) == 3
    for st in states:
        assert st.box.shape == (7,)
        assert np.all(np.isfinite(st.box))
        # untrained model: the update must stay within the refinement range
        assert abs(st.box[3] - init[3]) < 4.0
        assert abs(st.box[5] - init[5]) < 4.0
