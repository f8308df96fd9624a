"""Two-stage integration: detect -> proposals -> refine -> evaluate.

Exercises the complete reference pipeline shape (SURVEY.md §3.4 + §3.1)
on synthetic data with untrained weights: the plumbing must hold end to
end — decoded proposals become valid KITTI files, the refinement stage
consumes them, and the C++ evaluator scores the result.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snvc_tpu.config import tiny_stereo_config, tiny_vernier_config
from snvc_tpu.data.instance_db import build_db_from_predictions
from snvc_tpu.data.kitti import KittiDataset
from snvc_tpu.data.pipeline import RefinementPipeline
from snvc_tpu.data.stereo_pipeline import StereoPipeline
from snvc_tpu.data.synthetic import make_synthetic_kitti
from snvc_tpu.eval.kitti_ap import run_kitti_eval
from snvc_tpu.geometry.calib import read_label
from snvc_tpu.inference.detect import decode_proposals, proposals_to_kitti
from snvc_tpu.inference.kitti_writer import PredictionWriter
from snvc_tpu.inference.refine import RefineRunner
from snvc_tpu.models.stereonet import StereoNet
from snvc_tpu.models.vernier import VernierScale
from snvc_tpu.training.train_stereo import normalize_images


@pytest.mark.slow
def test_detect_runner_data_parallel_matches_single_device(tmp_path):
    """DetectRunner(mesh=dp2) must emit byte-identical proposal files to
    the single-device runner: params replicate, frames shard on "data",
    XLA partitions both programs (SURVEY.md §2.3 serving scale-out)."""
    from jax.sharding import Mesh
    from snvc_tpu.inference.detect import DetectRunner

    root = str(tmp_path)
    make_synthetic_kitti(root, num_frames=2, boxes_per_frame=2, seed=4)
    ds = KittiDataset(root, "val")
    scfg = tiny_stereo_config(z_max=38.0, max_depth=40.0)
    smodel = StereoNet(scfg)
    H, W = scfg.input_size
    variables = smodel.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
        jnp.eye(3, 4)[None], jnp.eye(3, 4)[None],
    )

    def run(mesh, batch_size, tag):
        r = DetectRunner(scfg, variables, max_boxes=4, score_threshold=0.0,
                         nms_iou=0.5, mesh=mesh)
        out = os.path.join(root, tag)
        r.run(ds, out, batch_size=batch_size, prefetch=2)
        d = os.path.join(out, "data")
        return {f: open(os.path.join(d, f)).read()
                for f in sorted(os.listdir(d))}

    single = run(None, 1, "props_single")
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2,), ("data",))
    sharded = run(mesh, 2, "props_dp2")
    assert sharded == single

    # dp x depth-tp serving: the plane-sweep depth axis shards over
    # "model" (StereoHead.volume_sharding); psum/halo reduction
    # reordering moves floats at ~1e-5, so compare the decoded numbers
    # with tolerance instead of bytes
    tp_mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    tp = run(tp_mesh, 2, "props_dp2tp4")
    assert tp.keys() == single.keys()
    for f in single:
        a_lines = single[f].strip().splitlines()
        b_lines = tp[f].strip().splitlines()
        assert len(a_lines) == len(b_lines), f
        for la, lb in zip(a_lines, b_lines):
            ta, tb = la.split(), lb.split()
            assert ta[0] == tb[0], f
            np.testing.assert_allclose(
                [float(x) for x in ta[1:]], [float(x) for x in tb[1:]],
                atol=5e-3, err_msg=f,
            )


@pytest.mark.slow
def test_two_stage_pipeline(tmp_path):
    root = str(tmp_path)
    make_synthetic_kitti(root, num_frames=1, boxes_per_frame=2, seed=2)
    ds = KittiDataset(root, "val")

    # ---- stage 1: global detector -> proposal files -------------------
    scfg = tiny_stereo_config(z_max=38.0, max_depth=40.0)
    spipe = StereoPipeline(ds, scfg, batch_size=1, training=False)
    smodel = StereoNet(scfg)
    batch = next(spipe.batches())
    arrays = batch.arrays()
    H, W = scfg.input_size
    variables = smodel.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
        jnp.asarray(arrays["P_left"]), jnp.asarray(arrays["P_right"]),
    )
    out = smodel.apply(
        variables,
        normalize_images(jnp.asarray(arrays["images_left"])),
        normalize_images(jnp.asarray(arrays["images_right"])),
        jnp.asarray(arrays["P_left"]), jnp.asarray(arrays["P_right"]),
    )
    boxes, scores, _, valid = jax.tree.map(
        np.asarray,
        decode_proposals(out, scfg, max_boxes=8, score_threshold=0.0,
                         nms_iou=0.5),
    )
    assert valid[0].any(), "untrained detector should still emit proposals"
    scene = ds.scene(0)
    lines = proposals_to_kitti(boxes[0], scores[0], valid[0],
                               scene.calibration("left"))
    pred_dir = os.path.join(root, "proposals")
    os.makedirs(pred_dir, exist_ok=True)
    with open(os.path.join(pred_dir, "000000.txt"), "w") as f:
        f.write("\n".join(lines))
    labels = read_label(os.path.join(pred_dir, "000000.txt"))
    assert len(labels) >= 1
    assert all(np.isfinite(l.box3d).all() for l in labels)

    # ---- stage 2: refinement over the stage-1 proposals ---------------
    vcfg = tiny_vernier_config(max_instances=2, image_size=(384, 1248))
    db = build_db_from_predictions(ds, vcfg, pred_dir)
    assert len(db) == len(labels)
    pipe = RefinementPipeline(db, vcfg, training=False)
    vmodel = VernierScale(vcfg)
    Hh, Ww = vcfg.resolution
    P = int(np.prod(vcfg.grid_resolution))
    params = vmodel.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, Hh, Ww, 3)), jnp.zeros((1, Hh, Ww, 3)),
        jnp.zeros((1, P, 2)), jnp.zeros((1, P, 2)),
    )
    runner = RefineRunner(vmodel, params, vcfg)
    writer = PredictionWriter(vcfg, pred_types=("all_parts",))
    runner.run(pipe, writer=writer, progress=False)
    out_dir = os.path.join(root, "refined")
    writer.write(out_dir)

    # ---- evaluator scores the refined output --------------------------
    res = run_kitti_eval(
        os.path.join(root, "training", "label_2"),
        os.path.join(out_dir, "all_parts"),
    )
    assert "car" in res and "detection_3d" in res["car"]
    for v in res["car"]["detection_3d"]["ap40"]:
        assert 0.0 <= v <= 100.0


def test_multiclass_end_to_end(tmp_path):
    """Class plumbing proof across the whole stage-1 chain: a 3-class
    synthetic tree (Car/Pedestrian/Cyclist) -> per-slot GT assignment ->
    a brief K=3 train step -> ideal-output decode -> class-typed KITTI
    writer -> the evaluator emits all three class rows
    (reference evaluator classes, evaluate_object_3d_offline.cpp:43-58).

    The AP assertion is protocol-exact rather than "close to 100": the
    official KITTI PR construction samples precision at 41 recall points
    whose thresholds come from the sorted TP scores, so a PERFECT detector
    on n GT objects fills only ~n of the 41 points and AP40 tops out near
    (n-1)/40*100 (AP40 skips the recall-0 point).  With tiny synthetic
    splits that quantization dominates, so we compute the expected
    thresholds count exactly and assert equality."""
    from snvc_tpu.config import TrainConfig
    from snvc_tpu.models.stereo_losses import assign_targets
    from snvc_tpu.models.stereonet import bev_locations
    from snvc_tpu.training.train_stereo import (
        create_stereo_state,
        make_stereo_train_step,
    )

    root = str(tmp_path)
    classes = ("Car", "Pedestrian", "Cyclist")
    num_frames = 16
    make_synthetic_kitti(root, num_frames=num_frames, boxes_per_frame=3,
                         seed=5, split="val", classes=classes)
    ds = KittiDataset(root, "val")
    scfg = tiny_stereo_config(
        z_max=38.0, max_depth=40.0, num_classes=3, class_names=classes,
    )

    # --- GT class slots ride the pipeline ------------------------------
    pipe = StereoPipeline(ds, scfg, batch_size=2, training=True)
    batch = next(pipe.batches())
    got = set(batch.gt_classes[batch.gt_valid].tolist())
    assert got == {0, 1, 2}, got

    # --- a brief K=3 training step runs (shapes, losses, grads) --------
    model = StereoNet(scfg)
    tc = TrainConfig(lr=1e-4, warmup_steps=1, total_steps=4)
    state = create_stereo_state(model, scfg, tc, jax.random.PRNGKey(0))
    step_fn = make_stereo_train_step(model, scfg, tc)
    arrays = batch.arrays()
    for _ in range(2):
        state, metrics = step_fn(state, arrays)
    assert np.isfinite(float(metrics["total"]))

    # --- ideal outputs decode to typed proposals; evaluator reports all
    # three class rows -----------------------------------------------
    loc = jnp.asarray(bev_locations(scfg))
    A, K = scfg.num_angles, scfg.num_classes
    L = loc.shape[0]
    nz, nx = scfg.bev_size
    pred_dir = os.path.join(root, "proposals", "data")
    os.makedirs(pred_dir, exist_ok=True)
    decoded_frames = []
    for fi in range(len(ds)):
        scene = ds.scene(fi)
        from snvc_tpu.geometry.calib import filter_annotations

        _, b3, cids, _ = filter_annotations(
            scene.labels(), valid_classes=(1, 2, 3))
        slots = np.array([{2: 0, 1: 1, 3: 2}[int(c)] for c in cids])
        labels, reg_t, ctr = assign_targets(
            loc, jnp.broadcast_to(jnp.asarray(scfg.anchors_y), (K,)),
            jnp.asarray(b3), jnp.ones(len(b3), bool), jnp.asarray(slots), K,
            jnp.asarray(scfg.anchor_angles[:A]),
        )
        out = dict(
            cls=jnp.where(labels > 0, 8.0, -8.0).reshape(1, nz, nx, A * K),
            reg=jnp.broadcast_to(
                reg_t[:, None, :, :], (L, A, K, 24)
            ).reshape(1, nz, nx, A * K * 24),
            centerness=jnp.where(labels.sum(-1) > 0, 8.0, -8.0).reshape(
                1, nz, nx, A
            ),
        )
        boxes, scores, kcls, valid = jax.tree.map(
            np.asarray,
            decode_proposals(out, scfg, max_boxes=8, score_threshold=0.5,
                             nms_iou=0.25),
        )
        # decoded classes are a subset of this frame's GT slots (a box
        # whose footprint contains no BEV cell center gets no positive
        # location in assign_targets and legitimately cannot decode)
        got_cls = set(kcls[0][valid[0]].tolist())
        assert got_cls <= set(slots.tolist()), (got_cls, slots)
        decoded_frames.append(got_cls)
        lines = proposals_to_kitti(
            boxes[0], scores[0], valid[0], scene.calibration("left"),
            classes=kcls[0], class_names=scfg.class_names,
        )
        with open(os.path.join(pred_dir, scene.name + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    # plumbing proof: every class decodes in the large majority of frames
    for slot in range(3):
        frac = np.mean([slot in s for s in decoded_frames])
        assert frac >= 0.8, (slot, frac, decoded_frames)

    res = run_kitti_eval(
        os.path.join(root, "training", "label_2"),
        os.path.join(root, "proposals"),
    )

    def expected_ap40(n_tp, n_gt):
        # replicate the official recall-threshold construction
        # (evaluate_object_3d_offline.cpp getThresholds): n_tp exact-match
        # TPs over n_gt valid GT, zero FPs, so precision is 1 at every
        # generated threshold and AP loss is pure protocol quantization.
        current, n_thresh = 0.0, 0
        for i in range(n_tp):
            l_recall = (i + 1) / n_gt
            r_recall = (i + 2) / n_gt if i + 1 < n_tp else l_recall
            if (r_recall - current) < (current - l_recall) and i + 1 < n_tp:
                continue
            n_thresh += 1
            current += 1.0 / 40.0
        # AP40 averages precision over recall points 1..40 (skips 0)
        return max(0, min(n_thresh, 41) - 1) / 40.0 * 100.0

    # every synthetic box is unoccluded/untruncated; moderate requires
    # >= 25 px of image height — count qualifying GT and predictions
    def count_moderate(path):
        n = {c.lower(): 0 for c in classes}
        for ln in open(path):
            f = ln.split()
            if f[0].lower() in n and float(f[7]) - float(f[5]) >= 25:
                n[f[0].lower()] += 1
        return n

    n_gt = {c.lower(): 0 for c in classes}
    n_tp = {c.lower(): 0 for c in classes}
    for fi in range(len(ds)):
        name = ds.scene(fi).name + ".txt"
        for c, v in count_moderate(
                os.path.join(root, "training", "label_2", name)).items():
            n_gt[c] += v
        for c, v in count_moderate(os.path.join(pred_dir, name)).items():
            n_tp[c] += v
    for cname in ("car", "pedestrian", "cyclist"):
        assert cname in res and "detection_3d" in res[cname], (cname, res)
        assert n_tp[cname] >= 10, (cname, n_tp)
        want = expected_ap40(n_tp[cname], n_gt[cname])
        got = res[cname]["detection_3d"]["ap40"][1]
        # exact-GT detections: the only AP loss is protocol quantization
        assert abs(got - want) < 1e-3, (cname, got, want, n_tp, n_gt)
