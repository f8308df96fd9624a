#!/usr/bin/env python
"""End-metric demonstration: refinement lifts 3D AP over the proposals.

Trains the Vernier model with synthetic supervision (proposals sampled
around GT, reference KITTIRefinement-style) on a synthetic KITTI train
set, then refines NOISY proposals on a held-out synthetic val set and
scores both with the bundled C++ KITTI evaluator:

    AP3D(refined) > AP3D(proposals)

is the north-star sanity check that the whole loop — data engine, model,
losses, NCF->pose update, writer, evaluator — learns and improves the
end metric (reference flow: docs/INFERENCE.md:19-34,
tools/inference_agnostic.py:366-432).

Example (on TPU; ~10 min end to end after the first compile):
  python tools/demo_ap_lift.py --work_dir /tmp/ap_lift --steps 600
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(args):
    from snvc_tpu.config import BackboneConfig, VernierConfig

    return VernierConfig(
        backbone=BackboneConfig(name="hrnet-tiny"),
        grid_resolution=(8, 48, 48),
        resolution=(128, 128),
        gn_groups=4,
        max_instances=8,
        sigma=2,
        usage="train",
        sup_type="synthetic",
        image_size=(384, 1248),
        # match the perturbation to the proposal noise the val set gets
        # (write_predictions: loc sigma = args.noise, ry sigma = 0.08 rad)
        std_loc=(args.noise, 0.05, args.noise),
        std_rot=5.0,
        ncf_loss="mse_weighted",
        ncf_subvoxel=args.ncf_subvoxel,
        ncf_decode=args.ncf_decode,
        rot_aug=True,
        loc_aug=True,
        compute_dtype=args.dtype,
        remat=False,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default="/tmp/ap_lift")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train_frames", type=int, default=48)
    p.add_argument("--val_frames", type=int, default=8)
    p.add_argument("--boxes_per_frame", type=int, default=3)
    p.add_argument("--noise", type=float, default=0.25,
                   help="proposal location noise (m) on the val split")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--ncf_subvoxel", action="store_true",
                   help="draw NCF targets at true fractional voxel "
                   "coordinates instead of floored ones (the reference's "
                   "TODO at KITTIRefinement_dataset.py:633); pair with "
                   "--ncf_decode soft-argmax for sub-voxel decode too")
    p.add_argument("--ncf_decode", default="coordinates",
                   choices=["coordinates", "argmax", "soft-argmax"])
    args = p.parse_args()

    import jax
    import numpy as np

    from snvc_tpu.config import TrainConfig, save_config
    from snvc_tpu.data.instance_db import build_db_from_gt, build_db_from_predictions
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.data.synthetic import make_synthetic_kitti, write_predictions
    from snvc_tpu.eval.kitti_ap import run_kitti_eval
    from snvc_tpu.inference.kitti_writer import PredictionWriter
    from snvc_tpu.inference.refine import RefineRunner
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.training.train import create_train_state, make_train_step
    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_config(args)
    os.makedirs(args.work_dir, exist_ok=True)
    save_config(cfg, os.path.join(args.work_dir, "config.json"))

    train_root = os.path.join(args.work_dir, "kitti_train")
    val_root = os.path.join(args.work_dir, "kitti_val")
    make_synthetic_kitti(train_root, args.train_frames, args.boxes_per_frame,
                         seed=args.seed, split="train")
    val_boxes = make_synthetic_kitti(val_root, args.val_frames,
                                     args.boxes_per_frame,
                                     seed=args.seed + 1000, split="val")
    prop_dir = os.path.join(args.work_dir, "proposals")
    write_predictions(prop_dir, val_boxes, noise=args.noise,
                      seed=args.seed + 1)
    # the proposal files double as a KITTI result dir for the baseline AP
    base_res = os.path.join(args.work_dir, "baseline")
    os.makedirs(os.path.join(base_res, "data"), exist_ok=True)
    for f in os.listdir(prop_dir):
        with open(os.path.join(prop_dir, f)) as src, open(
            os.path.join(base_res, "data", f), "w"
        ) as dst:
            dst.write(src.read())

    # --- train with synthetic supervision ---------------------------------
    tc = TrainConfig(lr=args.lr, warmup_steps=50, total_steps=args.steps)
    ds = KittiDataset(train_root, "train")
    db = build_db_from_gt(ds, cfg)
    pipe = RefinementPipeline(db, cfg, training=True, seed=args.seed)
    model = VernierScale(cfg)
    state = create_train_state(model, cfg, tc, jax.random.PRNGKey(args.seed))
    step_fn = make_train_step(model, cfg, tc)
    rng = jax.random.PRNGKey(args.seed + 7)
    step = 0
    while step < args.steps:
        for batch in pipe.batches(shuffle=True):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch.arrays(), sub)
            step += 1
            if step % args.log_every == 0:
                print(f"step {step}: "
                      + ", ".join(f"{k}={float(v):.4f}"
                                  for k, v in sorted(metrics.items())))
            if step >= args.steps:
                break

    # --- refine the val proposals and score -------------------------------
    params = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        params["batch_stats"] = jax.device_get(state.batch_stats)
    infer_cfg = cfg.replace(usage="inference", sup_type="real", augment=False,
                            pred_type=("one_part", "all_parts"))
    vds = KittiDataset(val_root, "val")
    vdb = build_db_from_predictions(vds, infer_cfg, prop_dir)
    vpipe = RefinementPipeline(vdb, infer_cfg, training=False, load_lidar=False)
    runner = RefineRunner(model, params, infer_cfg)
    writer = PredictionWriter(infer_cfg)
    runner.run(vpipe, writer=writer, progress=False)
    out_dir = os.path.join(args.work_dir, "refined")
    writer.write(out_dir)

    # --- diagnostics: did the boxes actually move toward GT? --------------
    import numpy as _np

    from snvc_tpu.data.instance_db import attach_nearest_gt

    _np.save(os.path.join(args.work_dir, "params.npy"),
             jax.tree_util.tree_map(lambda x: _np.asarray(x), params),
             allow_pickle=True)
    diag_db = attach_nearest_gt(list(vdb), infer_cfg)
    diag_pipe = RefinementPipeline(diag_db, infer_cfg, training=False,
                                   load_lidar=False)
    d_prop, d_ref = [], []
    for batch in diag_pipe.batches():
        out = runner.step(batch)
        arr = batch.arrays()
        m = arr["valid"]
        gt = arr["gt_boxes"][m]
        prop = arr["samples"][m]
        ref = np.asarray(out["all_parts"])[m]
        d_prop += list(np.linalg.norm(prop[:, (3, 5)] - gt[:, (3, 5)], axis=1))
        d_ref += list(np.linalg.norm(ref[:, (3, 5)] - gt[:, (3, 5)], axis=1))
    diag = {
        "mean_center_err_proposal_m": float(np.mean(d_prop)),
        "mean_center_err_refined_m": float(np.mean(d_ref)),
    }
    print("diagnostics:", json.dumps(diag))

    gt_dir = vds.label_dir
    ap_base = run_kitti_eval(gt_dir, base_res)
    b3 = ap_base["car"]["detection_3d"]["ap40"]
    result = {
        "ap3d_proposals": b3,
        "apbev_proposals": ap_base["car"]["detection_ground"]["ap40"],
        "steps": args.steps,
        "noise_m": args.noise,
    }
    best = None
    for t in infer_cfg.pred_type:
        ap_ref = run_kitti_eval(gt_dir, os.path.join(out_dir, t))
        r3 = ap_ref["car"]["detection_3d"]["ap40"]
        result[f"ap3d_refined_{t}"] = r3
        result[f"apbev_refined_{t}"] = ap_ref["car"]["detection_ground"]["ap40"]
        if best is None or r3[1] > best:
            best = r3[1]
    r3 = [best]*3  # moderate lift below uses the best update type
    result["lift_3d_moderate"] = round(best - b3[1], 2)
    result.update(diag)
    print(json.dumps(result))
    with open(os.path.join(args.work_dir, "ap_lift.json"), "w") as f:
        json.dump(result, f, indent=2)
    if r3[1] <= b3[1]:
        print("WARNING: no AP lift at moderate difficulty", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
