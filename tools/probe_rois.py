#!/usr/bin/env python
"""Visual probe: do the ROI crops actually contain the object?

Renders, for a few synthetic instances: the warped left/right ROI crops,
the projected sampling-grid footprint, and the NCF targets — the visual
equivalent of the reference's test_training_pair_generation
(KITTIRefinement_dataset.py:354-498)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default="/tmp/probe_rois")
    p.add_argument("--params", default=None, help="optional params.npy to "
                   "also render predicted NCF")
    args = p.parse_args()

    import os as _os

    _os.environ["JAX_PLATFORMS"] = "cpu"

    import matplotlib

    matplotlib.use("Agg")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    import numpy as np

    from snvc_tpu.config import BackboneConfig, VernierConfig
    from snvc_tpu.data.instance_db import build_db_from_gt
    from snvc_tpu.data.kitti import KittiDataset
    from snvc_tpu.data.pipeline import RefinementPipeline
    from snvc_tpu.data.synthetic import make_synthetic_kitti
    from snvc_tpu.ops.assemble import assemble_instances, make_grid_local, make_targets

    cfg = VernierConfig(
        backbone=BackboneConfig(name="hrnet-tiny"),
        grid_resolution=(8, 48, 48),
        resolution=(128, 128),
        gn_groups=4,
        max_instances=4,
        sigma=2,
        usage="train",
        sup_type="synthetic",
        image_size=(384, 1248),
        std_loc=(0.25, 0.05, 0.25),
        compute_dtype="float32",
        remat=False,
    )
    os.makedirs(args.work_dir, exist_ok=True)
    root = os.path.join(args.work_dir, "kitti")
    make_synthetic_kitti(root, num_frames=2, boxes_per_frame=2, seed=3)
    ds = KittiDataset(root, "val")
    db = build_db_from_gt(ds, cfg)
    pipe = RefinementPipeline(db, cfg, training=True, seed=0)
    batch = next(pipe.batches()).arrays()
    grid_local = jnp.asarray(make_grid_local(cfg))
    left, right, gpl, gpr = assemble_instances(
        batch["images_left"], batch["images_right"], batch["image_idx"],
        batch["trans_l"], batch["trans_r"], batch["samples"],
        batch["P_left"], batch["P_right"], grid_local, cfg,
    )
    targets = make_targets(
        jnp.asarray(batch["samples"]), jnp.asarray(batch["gt_boxes"]),
        jnp.asarray(batch["points"]), jnp.asarray(batch["points_valid"]),
        grid_local, cfg,
    )
    mean = np.array(cfg.img_mean)
    std = np.array(cfg.img_std)
    I = min(4, int(batch["valid"].sum()))
    fig, axes = plt.subplots(I, 4, figsize=(14, 3.2 * I))
    axes = np.atleast_2d(axes)
    for i in range(I):
        for col, (img, proj, name) in enumerate(
            [(left, gpl, "left ROI"), (right, gpr, "right ROI")]
        ):
            a = axes[i, col]
            rgb = np.clip(np.asarray(img[i]) * std + mean, 0, 1)
            a.imshow(rgb)
            pr = np.asarray(proj[i])
            sub = pr[:: max(1, len(pr) // 800)]
            a.scatter(sub[:, 0], sub[:, 1], s=0.3, c="r", alpha=0.3)
            a.set_title(f"inst {i} {name}", fontsize=8)
            a.axis("off")
        a = axes[i, 2]
        a.imshow(np.asarray(targets["ncf"])[i, 0], origin="lower", cmap="viridis")
        a.set_title("NCF target part0", fontsize=8)
        a = axes[i, 3]
        occ = np.asarray(targets["occupancy"])[i]
        a.imshow(occ.max(axis=0).T, origin="lower", cmap="magma")
        a.set_title("occupancy (max over h)", fontsize=8)
    fig.tight_layout()
    out = os.path.join(args.work_dir, "rois.png")
    fig.savefig(out, dpi=110)
    print("wrote", out)
    print("roi pixel stats: left std", float(np.asarray(left).std()),
          "right std", float(np.asarray(right).std()))
    print("grid proj ranges: l", np.asarray(gpl).min(), np.asarray(gpl).max(),
          "r", np.asarray(gpr).min(), np.asarray(gpr).max())


if __name__ == "__main__":
    main()
