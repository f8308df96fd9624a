#!/bin/bash
# Round-4 A/B chain (ROADMAP "Remaining" #3 and #6), serialized because the
# axon TPU tolerates exactly one JAX client at a time (CLAUDE.md).
#
# Arms A-C: sub-voxel NCF supervision A/B on the controlled AP-lift harness
#   (the reference's TODO at KITTIRefinement_dataset.py:633) — baseline /
#   subvoxel-targets+soft-argmax-decode / subvoxel-targets-only, 8000 steps
#   each, identical data and seeds (docs/AP_LIFT.md headline recipe).
# Job D: stage-1 W1+offset depth-loss A/B at the exact banked stage-1 recipe
#   (docs/TWO_STAGE.md round-4 table; baseline sl1 numbers already banked,
#   so one arm suffices).
#
# Results land in artifacts/ so a machine restart cannot wipe them again.
set -ux
cd /root/repo
mkdir -p .runs artifacts/ap_lift_r4

AP_ARGS="--steps 8000 --train_frames 96 --noise 0.4 --val_frames 16 --boxes_per_frame 4"

run_ap () {  # $1 = name, rest = extra args
  name=$1; shift
  mkdir -p ".runs/$name"
  # share the rendered dataset across arms (make_synthetic_kitti skips
  # complete trees; all arms use identical seeds)
  if [ "$name" != "ap_base" ] && [ -d .runs/ap_base/kitti_train ]; then
    ln -sfn "$(pwd)/.runs/ap_base/kitti_train" ".runs/$name/kitti_train"
    ln -sfn "$(pwd)/.runs/ap_base/kitti_val" ".runs/$name/kitti_val"
  fi
  python tools/demo_ap_lift.py --work_dir ".runs/$name" $AP_ARGS "$@" \
      > ".runs/$name.log" 2>&1
  cp ".runs/$name/ap_lift.json" "artifacts/ap_lift_r4/$name.json" || true
}

# Ordered by information value so a wall-clock cutoff costs the least:
# base and the main treated arm first, then the stage-1 W1 job, and the
# subvox-only attribution arm (target vs decode) last.
run_ap ap_base
run_ap ap_subvox_soft --ncf_subvoxel --ncf_decode soft-argmax

# Job D: stage-1 with the W1 depth loss + per-plane offset branch
python tools/demo_two_stage.py --work_dir .runs/stage1_w1 --stage1_only \
    --train_frames 512 --val_frames 128 --stereo_steps 4000 \
    --reg_heading_sym --augment_flip --depth_loss w1 --depth_offset \
    > .runs/stage1_w1.log 2>&1
mkdir -p artifacts/stage1_ab_r4
cp .runs/stage1_w1/stage1.json artifacts/stage1_ab_r4/w1_offset_stage1.json || true

run_ap ap_subvox --ncf_subvoxel

echo "CHAIN COMPLETE"
