"""Functional learning test: overfit one batch, NCF converges to targets.

Validates that gradients flow end-to-end (ROI warp -> HRNet -> voxel ->
3D head) and the predicted confidence field localizes the GT parts —
the framework-level analog of the reference's val-loss sanity signal
(tools/inference_agnostic.py:408-416).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.config import TrainConfig, tiny_vernier_config
from snvc_tpu.data.kitti import KittiDataset
from snvc_tpu.data.instance_db import build_db_from_gt
from snvc_tpu.data.pipeline import RefinementPipeline
from snvc_tpu.data.synthetic import make_synthetic_kitti
from snvc_tpu.models.vernier import VernierScale
from snvc_tpu.ops.assemble import make_grid_local, make_targets
from snvc_tpu.ops.heatmaps import hard_argmax_2d
from snvc_tpu.training.train import create_train_state, make_train_step


@pytest.mark.slow
def test_overfit_single_batch(tmp_path):
    root = str(tmp_path)
    make_synthetic_kitti(root, num_frames=1, boxes_per_frame=2, seed=11)
    cfg = tiny_vernier_config(
        max_instances=2, image_size=(384, 1248), sigma=1,
    ).replace(usage="train", sup_type="synthetic", augment=False)
    ds = KittiDataset(root, "val")
    db = build_db_from_gt(ds, cfg)
    pipe = RefinementPipeline(db, cfg, training=True, seed=0)
    batch = next(pipe.batches()).arrays()

    tc = TrainConfig(lr=2e-3, warmup_steps=5, total_steps=200, grad_clip=5.0)
    model = VernierScale(cfg)
    state = create_train_state(model, cfg, tc, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tc)
    rng = jax.random.PRNGKey(1)

    first, last = None, None
    for i in range(60):
        state, metrics = step(state, batch, rng)
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
        last = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(last["total"])
    # the composite loss must drop substantially when overfitting one batch
    assert last["total"] < 0.6 * first["total"], (first, last)
    assert last["ncf"] < 0.75 * first["ncf"], (first, last)

    # the predicted NCF's part-0 peak should approach the target peak
    from snvc_tpu.inference.refine import refinement_step

    grid_local = jnp.asarray(make_grid_local(cfg))
    out = refinement_step(
        state.variables, batch, model, cfg, grid_local, with_targets=False
    )
    targets = make_targets(
        jnp.asarray(batch["samples"]), jnp.asarray(batch["gt_boxes"]),
        jnp.asarray(batch["points"]), jnp.asarray(batch["points_valid"]),
        grid_local, cfg,
    )
    pred_xy, _ = hard_argmax_2d(out["ncf"])
    tgt_xy, _ = hard_argmax_2d(targets["ncf"])
    err = np.abs(np.asarray(pred_xy) - np.asarray(tgt_xy))[:, 0]  # part 0
    # within a few voxels on the 16x16 BEV grid after a short overfit
    assert err.mean() <= 4.0, err
