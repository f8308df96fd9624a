#!/usr/bin/env python
"""One-command release-checkpoint validation: tar -> convert -> infer -> AP.

The real-KITTI AP parity anchor (BASELINE.md measurement plan) as a single
invocation for the day data mounts:

  python tools/validate_epoch80.py --checkpoint epoch_80.tar \
      --data_path /data/kitti --split val --pred_dir /data/ida3d_proposals

steps:
  1. load the torch .tar (reference checkpoint format,
     docs/INFERENCE.md:9-12), auto-detect the optional heads from the
     state_dict prefixes (part_reg_head./bbox_head.),
  2. init the flax VernierScale LIVE (creation-order tree) and convert via
     convert_vernier_checkpoint (zero-unmatched guarantee),
  3. run model-agnostic refinement over the proposal directory
     (reference tools/inference_agnostic.py:366-432),
  4. score proposals and refined boxes with the bundled C++ KITTI
     evaluator and print both AP tables.

--selftest exercises the identical path end-to-end without the real
checkpoint: it fabricates a release-shaped random state_dict for a small
config, writes it as a torch .tar, generates synthetic KITTI val data +
proposals, and runs steps 1-4 (AP is meaningless; the run proves the
harness).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"


def release_config(args):
    """The released V-A model's recovered configuration (SURVEY.md §5:
    BEV_type3, hrnet-w48 backbone, 32x192x192 grid, 256^2 ROIs)."""
    from snvc_tpu.config import BackboneConfig, VernierConfig

    return VernierConfig(
        vernier_type="BEV_type3",
        backbone=BackboneConfig(name=args.backbone),
        grid_resolution=(32, 192, 192),
        x_range=(-1.6, 1.6),
        y_range=(-1.0, 1.0),
        z_range=(-1.6, 1.6),
        resolution=(256, 256),
        gn=args.gn,
        usage="inference",
        sup_type="real",
        max_instances=8,
        image_size=(384, 1280),
        pred_type=("one_part", "all_parts"),
        compute_dtype=args.dtype,
    )


def convert(args, cfg, state_dict, log):
    import jax.numpy as jnp
    import numpy as np

    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.utils.convert_torch import (
        abstract_init,
        convert_vernier_checkpoint,
    )

    use_part_reg = any(k.startswith("part_reg_head.") for k in state_dict)
    use_bbox = any(k.startswith("bbox_head.") for k in state_dict)
    cfg = cfg.replace(use_part_reg_head=use_part_reg, use_bbox_head=use_bbox)
    log(f"detected heads: part_reg={use_part_reg}, bbox={use_bbox}")

    model = VernierScale(cfg)
    H, W = cfg.resolution
    P = int(np.prod(cfg.grid_resolution))
    # creation-order shape template with NO compute (jit init would return
    # an alphabetized tree and eager init takes hours at release scale);
    # every value is filled from the checkpoint
    variables = abstract_init(
        model,
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, P, 2)), jnp.zeros((1, P, 2)),
    )
    params, stats = convert_vernier_checkpoint(
        state_dict,
        variables["params"],
        variables.get("batch_stats", {}),
        use_part_reg_head=use_part_reg,
        use_bbox_head=use_bbox,
    )
    log(f"converted {len(state_dict)} torch tensors, zero unmatched")
    vars_ = {"params": params}
    if stats:
        vars_["batch_stats"] = stats
    return model, vars_, cfg


def run(args, cfg, model, variables, data_path, split, pred_dir, out_dir, log):
    from snvc_tpu.data.instance_db import build_db_from_predictions
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.inference.kitti_writer import PredictionWriter
    from snvc_tpu.inference.refine import RefineRunner

    ds = KittiDataset(data_path, split)
    db = build_db_from_predictions(ds, cfg, pred_dir)
    log(f"{len(db)} proposal instances over {len(ds)} frames")
    pipe = RefinementPipeline(db, cfg, training=False, load_lidar=False)
    runner = RefineRunner(model, variables, cfg)
    writer = PredictionWriter(cfg)
    runner.run(pipe, writer=writer, progress=True)
    writer.write(out_dir)
    return ds


def evaluate(args, ds, pred_dir, out_dir, log):
    from snvc_tpu.eval.kitti_ap import run_kitti_eval

    gt_dir = ds.label_dir
    # score the raw proposals as the baseline (they double as a result dir)
    base_res = os.path.join(out_dir, "_proposals_as_results")
    os.makedirs(os.path.join(base_res, "data"), exist_ok=True)
    for f in os.listdir(pred_dir):
        if f.endswith(".txt"):
            with open(os.path.join(pred_dir, f)) as src, open(
                os.path.join(base_res, "data", f), "w"
            ) as dst:
                dst.write(src.read())
    result = {}
    ap = run_kitti_eval(gt_dir, base_res)
    result["proposals"] = {
        "ap3d_40": ap["car"]["detection_3d"]["ap40"],
        "apbev_40": ap["car"]["detection_ground"]["ap40"],
    }
    log(f"AP3D(proposals) e/m/h: {result['proposals']['ap3d_40']}")
    for t in ("one_part", "all_parts"):
        d = os.path.join(out_dir, t)
        if not os.path.isdir(d):
            continue
        ap = run_kitti_eval(gt_dir, d)
        result[t] = {
            "ap3d_40": ap["car"]["detection_3d"]["ap40"],
            "apbev_40": ap["car"]["detection_ground"]["ap40"],
        }
        log(f"AP3D(refined/{t}) e/m/h: {result[t]['ap3d_40']}")
    return result


def selftest(args, log):
    """Fabricated-checkpoint end-to-end run of the identical path."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from snvc_tpu.config import tiny_vernier_config
    from snvc_tpu.data.synthetic import make_synthetic_kitti, write_predictions
    from snvc_tpu.models.vernier import VernierScale
    from snvc_tpu.utils.convert_torch import (
        abstract_init,
        fabricate_vernier_state_dict,
    )

    work = args.work_dir
    os.makedirs(work, exist_ok=True)
    cfg = tiny_vernier_config(
        usage="inference", sup_type="real", max_instances=4,
        image_size=(384, 1248), pred_type=("one_part", "all_parts"),
    )
    # fabricate a release-shaped checkpoint tar from a creation-order
    # shape template (fabrication also needs only torch-layout shapes)
    model = VernierScale(cfg)
    H, W = cfg.resolution
    P = int(np.prod(cfg.grid_resolution))
    variables = abstract_init(
        model,
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, P, 2)), jnp.zeros((1, P, 2)),
    )
    sd = fabricate_vernier_state_dict(
        variables["params"],
        variables.get("batch_stats", {}),
    )
    tar = os.path.join(work, "fake_epoch_80.tar")
    torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
               tar)
    log(f"fabricated checkpoint: {len(sd)} tensors -> {tar}")

    val_root = os.path.join(work, "kitti_val")
    boxes = make_synthetic_kitti(val_root, 2, 2, seed=1, split="val")
    pred_dir = os.path.join(work, "proposals")
    write_predictions(pred_dir, boxes, noise=0.2)

    from snvc_tpu.utils.convert_torch import load_torch_checkpoint

    state_dict = load_torch_checkpoint(tar)
    model, vars_, cfg = convert(args, cfg, state_dict, log)
    out_dir = os.path.join(work, "refined")
    ds = run(args, cfg, model, vars_, val_root, "val", pred_dir, out_dir, log)
    result = evaluate(args, ds, pred_dir, out_dir, log)
    print(json.dumps({"selftest": "ok", **result}))
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", help="reference epoch_80.tar path")
    p.add_argument("--data_path", help="KITTI object root")
    p.add_argument("--split", default="val")
    p.add_argument("--pred_dir",
                   help="detector proposal txt dir (IDA-3D / RTS-3D / ours)")
    p.add_argument("--out_dir", default="outputs/epoch80_validation")
    p.add_argument("--backbone", default="hrnet-w48")
    p.add_argument("--gn", action=argparse.BooleanOptionalAction, default=True,
                   help="GroupNorm 3D/BEV stacks (release default); "
                   "--no-gn for BatchNorm-stack checkpoints")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--work_dir", default="/tmp/validate_epoch80")
    p.add_argument("--selftest", action="store_true",
                   help="run the full harness on a fabricated checkpoint + "
                   "synthetic data (no real inputs needed)")
    args = p.parse_args()

    def log(m):
        print(m, flush=True)

    from snvc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.selftest:
        return selftest(args, log)

    if not (args.checkpoint and args.data_path and args.pred_dir):
        print("need --checkpoint, --data_path, --pred_dir (or --selftest)",
              file=sys.stderr)
        return 2
    from snvc_tpu.utils.convert_torch import load_torch_checkpoint

    state_dict = load_torch_checkpoint(args.checkpoint)
    log(f"loaded {len(state_dict)} tensors from {args.checkpoint}")
    cfg = release_config(args)
    model, vars_, cfg = convert(args, cfg, state_dict, log)
    ds = run(args, cfg, model, vars_, args.data_path, args.split,
             args.pred_dir, args.out_dir, log)
    result = evaluate(args, ds, args.pred_dir, args.out_dir, log)
    print(json.dumps(result))
    with open(os.path.join(args.out_dir, "validation.json"), "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
