#!/usr/bin/env python
"""Tracking end-metric demonstration on a synthetic moving-object sequence.

The reference demonstrates tracking-by-detection: search for the object's
next-frame pose starting from the previous cuboid (README.md:19-20).  This
demo quantifies it:

  1. train the Vernier model with synthetic supervision (the AP-lift
     recipe, noise matched to the per-frame motion),
  2. generate a sequence where one car moves ~0.5 m/frame,
  3. track from the frame-0 GT box with the refinement model: each
     frame's proposal is the previous frame's refined pose,
  4. baseline = the drifting prior (the same chain WITHOUT refinement,
     i.e. the frame-0 box held fixed, which falls behind the object by
     |velocity| per frame).

Success: the tracker's center error stays bounded (well under one frame's
motion) across the sequence while the unrefined prior's error grows
linearly.  Writes work_dir/tracking.json and prints per-frame errors.

Example (TPU): python tools/demo_tracking.py --work_dir /tmp/track --steps 600
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def build_config(args):
    from snvc_tpu.config import BackboneConfig, VernierConfig

    # perturbation noise ~ the per-frame motion the tracker must absorb
    speed = float(abs(args.vz)) + float(abs(args.vx))
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
        std_loc=(0.7 * speed, 0.05, 0.7 * speed),
        std_rot=5.0,
        ncf_loss="mse_weighted",
        rot_aug=True,
        loc_aug=True,
        compute_dtype=args.dtype,
        remat=False,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default="/tmp/tracking_demo")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train_frames", type=int, default=48)
    p.add_argument("--boxes_per_frame", type=int, default=3)
    p.add_argument("--seq_frames", type=int, default=10)
    p.add_argument("--vx", type=float, default=0.15)
    p.add_argument("--vz", type=float, default=-0.45)
    p.add_argument("--yaw_rate", type=float, default=0.02)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--ncf_decode", default="argmax",
                   choices=["coordinates", "argmax", "soft-argmax"])
    p.add_argument("--motion", default="static", choices=["static", "cv"],
                   help="proposal prior: previous refined pose verbatim "
                   "(static, the reference's local-search behavior) or a "
                   "constant-velocity extrapolation (cv) so the refiner "
                   "only corrects the residual")
    p.add_argument("--beta", type=float, default=0.5,
                   help="EMA damping of the cv velocity estimate")
    p.add_argument("--load_ckpt", default=None,
                   help="vernier checkpoint dir (e.g. a two-stage run's "
                   "vernier_ckpt): skip training and track with the "
                   "long-trained refiner — the architecture params "
                   "(hrnet-tiny, grid 8x48x48, res 128) match "
                   "tools/demo_two_stage.py's vernier_config")
    args = p.parse_args()

    import jax
    import numpy as np

    from snvc_tpu.config import TrainConfig
    from snvc_tpu.data.instance_db import build_db_from_gt
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.data.synthetic import make_synthetic_kitti, make_synthetic_sequence
    from snvc_tpu.inference.refine import RefineRunner
    from snvc_tpu.inference.track import Tracker
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.training.train import (
        create_train_state,
        load_checkpoint,
        make_train_step,
    )
    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = build_config(args)
    os.makedirs(args.work_dir, exist_ok=True)

    if args.load_ckpt:
        # the checkpoint's config.json (written by save_checkpoint) is the
        # source of truth for the architecture — a mismatched checkpoint
        # (e.g. from a --smoke run) would otherwise die in an opaque Orbax
        # shape error.  Training-noise fields stay from build_config.
        from snvc_tpu.config import VernierConfig, load_config

        cfg_path = os.path.join(args.load_ckpt, "config.json")
        if os.path.isfile(cfg_path):
            ckpt_cfg = load_config(cfg_path, VernierConfig)
            arch_fields = ("grid_resolution", "resolution", "gn_groups",
                           "num_parts", "vernier_type", "use_bbox_head")
            mismatch = [
                f"{f}: ckpt={getattr(ckpt_cfg, f)} vs local={getattr(cfg, f)}"
                for f in arch_fields
                if getattr(ckpt_cfg, f) != getattr(cfg, f)
            ]
            if ckpt_cfg.backbone.name != cfg.backbone.name:
                mismatch.append(f"backbone: ckpt={ckpt_cfg.backbone.name} "
                                f"vs local={cfg.backbone.name}")
            if mismatch:
                print("checkpoint architecture differs from the default "
                      "tracking config; building the model from the "
                      "checkpoint's config.json:\n  " + "\n  ".join(mismatch),
                      flush=True)
            cfg = ckpt_cfg.replace(
                std_loc=cfg.std_loc, std_rot=cfg.std_rot,
                compute_dtype=cfg.compute_dtype, usage=cfg.usage,
                sup_type=cfg.sup_type,
            )
        else:
            print(f"warning: {cfg_path} not found; assuming the checkpoint "
                  "matches the default tracking architecture", flush=True)

    model = VernierScale(cfg)
    if args.load_ckpt:
        tc = TrainConfig(lr=args.lr, warmup_steps=50, total_steps=1)
        state = create_train_state(
            model, cfg, tc, jax.random.PRNGKey(args.seed)
        )
        tree, step0 = load_checkpoint(args.load_ckpt, state)
        state = state.replace(
            params=tree["params"],
            batch_stats=tree.get("batch_stats") or {},
        )
        print(f"loaded refiner checkpoint at step {step0} from "
              f"{args.load_ckpt}", flush=True)
        train_steps = int(step0)
    else:
        # --- train (synthetic supervision, static random scenes) ----------
        train_root = os.path.join(args.work_dir, "kitti_train")
        make_synthetic_kitti(train_root, args.train_frames,
                             args.boxes_per_frame,
                             seed=args.seed, split="train")
        tc = TrainConfig(lr=args.lr, warmup_steps=50, total_steps=args.steps)
        ds = KittiDataset(train_root, "train")
        db = build_db_from_gt(ds, cfg)
        pipe = RefinementPipeline(db, cfg, training=True, seed=args.seed)
        state = create_train_state(model, cfg, tc, jax.random.PRNGKey(args.seed))
        step_fn = make_train_step(model, cfg, tc)
        rng = jax.random.PRNGKey(args.seed + 7)
        step = 0
        train_steps = args.steps
        while step < args.steps:
            for batch in pipe.batches(shuffle=True):
                rng, sub = jax.random.split(rng)
                state, metrics = step_fn(state, batch.arrays(), sub)
                step += 1
                if step % args.log_every == 0:
                    print(f"step {step}: " + ", ".join(
                        f"{k}={float(v):.4f}"
                        for k, v in sorted(metrics.items())),
                        flush=True)
                if step >= args.steps:
                    break

    # --- moving sequence + tracking --------------------------------------
    seq_root = os.path.join(args.work_dir, "sequence")
    gt_per_frame = make_synthetic_sequence(
        seq_root, num_frames=args.seq_frames, seed=args.seed + 99,
        velocity=(args.vx, 0.0, args.vz), yaw_rate=args.yaw_rate,
    )
    params = {"params": jax.device_get(state.params)}
    if state.batch_stats:
        params["batch_stats"] = jax.device_get(state.batch_stats)
    # argmax decode: under small per-frame motion the coord head collapses
    # to the mean (predicts "no change") and the tracker drifts with the
    # prior — the winner-take-all NCF peak stays informative
    # (tools/diagnose_refinement.py; docs/TWO_STAGE.md decode diagnosis)
    infer_cfg = cfg.replace(usage="inference", sup_type="real", augment=False,
                            max_instances=1, ncf_decode=args.ncf_decode)
    runner = RefineRunner(model, params, infer_cfg)
    tracker = Tracker(runner, infer_cfg)
    sds = KittiDataset(seq_root, "val")
    scenes = sds.scenes()

    init = gt_per_frame[0][0].copy()
    states = tracker.track(scenes, init, motion=args.motion, beta=args.beta)

    err_track, err_prior, kept = [], [], []
    prior = init.copy()
    for fi, st in enumerate(states):
        gt = gt_per_frame[fi][0]
        err_track.append(float(np.linalg.norm(st.box[[3, 5]] - gt[[3, 5]])))
        err_prior.append(float(np.linalg.norm(prior[[3, 5]] - gt[[3, 5]])))
        kept.append(bool(st.kept))
        print(f"frame {fi}: tracker err {err_track[-1]:.3f} m, "
              f"static prior err {err_prior[-1]:.3f} m, kept={st.kept}",
              flush=True)

    speed = float(np.hypot(args.vx, args.vz))
    result = {
        "seq_frames": args.seq_frames,
        "motion_m_per_frame": speed,
        "tracker_err_m": err_track,
        "static_prior_err_m": err_prior,
        "tracker_err_mean_m": float(np.mean(err_track)),
        "tracker_err_max_m": float(np.max(err_track)),
        "static_prior_err_final_m": err_prior[-1],
        "kept_frames": int(np.sum(kept)),
        "train_steps": train_steps,
        "motion": args.motion,
    }
    print(json.dumps(result))
    with open(os.path.join(args.work_dir, "tracking.json"), "w") as f:
        json.dump(result, f, indent=2)
    # bounded: max error under one frame's motion; prior drifts to N*motion
    ok = result["tracker_err_max_m"] < max(2 * speed, 0.6) and (
        result["static_prior_err_final_m"] > 3 * result["tracker_err_mean_m"]
    )
    if not ok:
        print("WARNING: tracking success criteria not met", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
