#!/bin/bash
# Round-4 chain takeover, stage 3 (supersedes r4_takeover2.sh before its
# wait loop expired): after arm B, run the batch-2 conv-formulation
# shoot-out AND a flagship model-level A/B of the grouped-tap formulation
# in the same window, then finish the chain (job D, arm C).
# Usage: bash tools/r4_takeover3.sh <pid-of-running-arm-B-python>
set -ux
cd /root/repo
mkdir -p .runs artifacts/ap_lift_r4 artifacts/stage1_ab_r4 artifacts/perf_r4

AP_ARGS="--steps 8000 --train_frames 96 --noise 0.4 --val_frames 16 --boxes_per_frame 4"

# 0. wait for the in-flight arm B (exact PID handed in)
while kill -0 "$1" 2>/dev/null; do sleep 15; done
cp .runs/ap_subvox_soft/ap_lift.json artifacts/ap_lift_r4/ap_subvox_soft.json || true

# 1. conv shoot-out round 2 at batch 2 on all three hot shapes
python tools/bench_conv1_k7.py --iters 10 \
    > artifacts/perf_r4/conv_shootout_b2.json 2> .runs/conv1_k7_b2.log || true

# 2. flagship model-level A/B: default vs grouped-tap formulation
#    (same window as the shoot-out so the numbers compose)
python bench.py --config flagship \
    > artifacts/perf_r4/flagship_base.json 2> .runs/flagship_base.log || true
SNVC_GROUP_TAPS=always python bench.py --config flagship \
    > artifacts/perf_r4/flagship_grouped.json 2> .runs/flagship_grouped.log || true

# 3. job D: stage-1 W1 depth loss + per-plane offset branch
python tools/demo_two_stage.py --work_dir .runs/stage1_w1 --stage1_only \
    --train_frames 512 --val_frames 128 --stereo_steps 4000 \
    --reg_heading_sym --augment_flip --depth_loss w1 --depth_offset \
    > .runs/stage1_w1.log 2>&1
cp .runs/stage1_w1/stage1.json artifacts/stage1_ab_r4/w1_offset_stage1.json || true

# 4. arm C: sub-voxel targets only (attribution arm)
mkdir -p .runs/ap_subvox
if [ -d .runs/ap_base/kitti_train ]; then
  ln -sfn "$(pwd)/.runs/ap_base/kitti_train" ".runs/ap_subvox/kitti_train"
  ln -sfn "$(pwd)/.runs/ap_base/kitti_val" ".runs/ap_subvox/kitti_val"
fi
python tools/demo_ap_lift.py --work_dir .runs/ap_subvox $AP_ARGS --ncf_subvoxel \
    > .runs/ap_subvox.log 2>&1
cp .runs/ap_subvox/ap_lift.json artifacts/ap_lift_r4/ap_subvox.json || true

echo "TAKEOVER3 COMPLETE"
