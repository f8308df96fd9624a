#!/usr/bin/env python
"""Train the Vernier (instance refinement) model.

The reference links TRAIN.md but never shipped a training CLI
(SURVEY.md §2.4); this is the TPU-native one: synthetic supervision
(proposals sampled around GT with gaussian noise, KITTIRefinement-style)
or real supervision from a proposal directory, data-parallel over all
local devices, Orbax checkpoints with the config stored alongside.

Example:
  python tools/train_vernier.py --model_dir runs/vernier \
      --data_path data/kitti --split train --steps 80000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--config", default=None,
                   help="JSON config file; defaults to the flagship config")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--batch_instances", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=20)
    args = p.parse_args()

    import jax
    import numpy as np

    from snvc_tpu.config import TrainConfig, VernierConfig, load_config
    from snvc_tpu.data.instance_db import build_db_from_gt
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.parallel.api import make_mesh, shard_instance_batch
    from snvc_tpu.training.train import (
        create_train_state,
        load_checkpoint,
        make_train_step,
        save_checkpoint,
    )
    from snvc_tpu.utils import Experimenter, enable_compilation_cache

    enable_compilation_cache()
    if args.config:
        cfg = load_config(args.config, VernierConfig)
    else:
        cfg = VernierConfig(usage="train", sup_type="synthetic")
    if args.batch_instances:
        cfg = cfg.replace(max_instances=args.batch_instances)
    tc = TrainConfig(
        lr=args.lr or TrainConfig.lr,
        total_steps=args.steps or TrainConfig.total_steps,
    )
    exp = Experimenter(args.model_dir, config=cfg)
    log = exp.logger
    metrics_out = exp.metrics_writer()

    ds = KittiDataset(args.data_path, args.split)
    db = build_db_from_gt(ds, cfg)
    log.info(f"{len(db)} GT instances for training")
    pipe = RefinementPipeline(db, cfg, training=True, seed=args.seed)

    model = VernierScale(cfg)
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, cfg, tc, rng)
    start_step = 0
    if args.resume and os.path.isdir(exp.checkpoint_dir):
        tree, start_step = load_checkpoint(exp.checkpoint_dir, state)
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
        )
        log.info(f"resumed from step {start_step}")

    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_model=1) if n_dev > 1 else None
    step_fn = make_train_step(model, cfg, tc, mesh=mesh)
    log.info(f"training on {n_dev} device(s)")

    step = start_step
    while step < tc.total_steps:
        for batch in pipe.batches(shuffle=True):
            arrays = batch.arrays()
            if mesh is not None:
                arrays = shard_instance_batch(arrays, mesh)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, arrays, sub)
            step += 1
            if step % args.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                metrics_out(step, vals)
                log.info(
                    "step %d: %s",
                    step,
                    ", ".join(f"{k}={v:.4f}" for k, v in vals.items()),
                )
            if step % tc.checkpoint_every == 0 or step >= tc.total_steps:
                save_checkpoint(exp.checkpoint_dir, state, cfg, step)
                log.info(f"checkpoint @ {step}")
            if step >= tc.total_steps:
                break
    save_checkpoint(exp.checkpoint_dir, state, cfg, step)
    log.info("done")


if __name__ == "__main__":
    main()
