#!/usr/bin/env python
"""Train the global (main-scale) stereo detector.

Example:
  python tools/train_stereo.py --model_dir runs/stereo \
      --data_path data/kitti --split train --steps 50000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# expose a CPU backend next to the TPU so parameter init runs host-side
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_path", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--config", default=None,
                   help="JSON StereoConfig file; defaults to the flagship config")
    p.add_argument("--steps", type=int, default=50000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument(
        "--monolithic", action="store_true",
        help="single fused train program (~18 min first compile on TPU); "
        "default is the 3-program split step (compiles in minutes, "
        "identical gradients)",
    )
    p.add_argument("--max_frames", type=int, default=None,
                   help="cap the number of training frames (synthetic demos)")
    p.add_argument("--augment_flip", action="store_true",
                   help="exact stereo flip augmentation (mirror world + "
                   "swap mirrored views; reference preprocess.py flip)")
    p.add_argument("--photometric_aug", action="store_true",
                   help="per-step view-consistent color jitter + PCA "
                   "lighting (reference preprocess.py:21-179)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest checkpoint in "
                   "model_dir (params, optimizer state, step counter)")
    args = p.parse_args()

    import jax

    from snvc_tpu.config import StereoConfig, TrainConfig, load_config
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.stereo_pipeline import StereoPipeline
    from snvc_tpu.models.stereonet import StereoNet
    from snvc_tpu.parallel.api import make_mesh
    from snvc_tpu.training.train import load_checkpoint, save_checkpoint
    from snvc_tpu.training.train_stereo import (
        create_stereo_state,
        make_stereo_train_step,
        make_stereo_train_step_split,
    )
    from snvc_tpu.utils import Experimenter, enable_compilation_cache

    enable_compilation_cache()
    if args.config:
        cfg = load_config(args.config, StereoConfig)
    else:
        cfg = StereoConfig()
    if args.photometric_aug:
        cfg = cfg.replace(photometric_aug=True)
    tc = TrainConfig(lr=args.lr, total_steps=args.steps)
    exp = Experimenter(args.model_dir, config=cfg)
    log = exp.logger
    metrics_out = exp.metrics_writer()

    ds = KittiDataset(args.data_path, args.split)
    if args.max_frames is not None:
        ds.indices = ds.indices[: args.max_frames]
    pipe = StereoPipeline(ds, cfg, batch_size=args.batch_size,
                          augment_flip=args.augment_flip, seed=args.seed)
    model = StereoNet(cfg)
    state = create_stereo_state(model, cfg, tc, jax.random.PRNGKey(args.seed))
    start_step = 0
    if args.resume and os.path.isdir(exp.checkpoint_dir):
        import jax.numpy as jnp

        tree, start_step = load_checkpoint(exp.checkpoint_dir, state)
        state = state.replace(
            step=jnp.asarray(start_step, jnp.int32),
            params=tree["params"],
            batch_stats=tree.get("batch_stats") or {},
            opt_state=tree["opt_state"],
        )
        log.info("resumed from step %d", start_step)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_data=n_dev, n_model=1) if n_dev > 1 else None
    make_fn = (
        make_stereo_train_step if (args.monolithic or not cfg.gn)
        else make_stereo_train_step_split
    )
    step_fn = make_fn(model, cfg, tc, mesh=mesh)

    step = start_step
    while step < tc.total_steps:
        for batch in pipe.batches(shuffle=True, seed=args.seed + step):
            state, metrics = step_fn(state, batch.arrays())
            step += 1
            if step % args.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                metrics_out(step, vals)
                log.info("step %d: %s", step,
                         ", ".join(f"{k}={v:.4f}" for k, v in vals.items()))
            if step % tc.checkpoint_every == 0 or step >= tc.total_steps:
                save_checkpoint(exp.checkpoint_dir, state, cfg, step)
            if step >= tc.total_steps:
                break
    save_checkpoint(exp.checkpoint_dir, state, cfg, step)
    log.info("done")


if __name__ == "__main__":
    main()
