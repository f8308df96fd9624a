#!/bin/bash
# Round-4 chain relaunch after the machine restart wiped .runs/ and the
# in-flight takeover3 queue.  Same jobs, no PID wait (nothing is running),
# ordered by information value and expected runtime so the short
# decision-bearing jobs bank first:
#   1. conv formulation shoot-out at batch 2 (settles the conv1_k7 question)
#   2. flagship model-level A/B: default vs grouped-tap formulation
#   3. stage-1 W1 depth-loss + offset A/B (long)
#   4. AP_LIFT arm C: sub-voxel-only attribution (long)
# Data generation is seeded (demo_ap_lift --seed 0 default), so regenerated
# train/val sets are identical to the wiped ones — arms stay comparable.
set -ux
cd /root/repo
mkdir -p .runs artifacts/ap_lift_r4 artifacts/stage1_ab_r4 artifacts/perf_r4

AP_ARGS="--steps 8000 --train_frames 96 --noise 0.4 --val_frames 16 --boxes_per_frame 4"

# 1. conv shoot-out at batch 2 on all three hot shapes
python tools/bench_conv1_k7.py --iters 10 \
    > artifacts/perf_r4/conv_shootout_b2.json 2> .runs/conv1_k7_b2.log || true

# 2. flagship model-level A/B: default vs grouped-tap formulation
python bench.py --config flagship \
    > artifacts/perf_r4/flagship_base.json 2> .runs/flagship_base.log || true
SNVC_GROUP_TAPS=always python bench.py --config flagship \
    > artifacts/perf_r4/flagship_grouped.json 2> .runs/flagship_grouped.log || true

# 3. stage-1 W1 depth loss + per-plane offset branch
python tools/demo_two_stage.py --work_dir .runs/stage1_w1 --stage1_only \
    --train_frames 512 --val_frames 128 --stereo_steps 4000 \
    --reg_heading_sym --augment_flip --depth_loss w1 --depth_offset \
    > .runs/stage1_w1.log 2>&1
cp .runs/stage1_w1/stage1.json artifacts/stage1_ab_r4/w1_offset_stage1.json || true

# 4. arm C: sub-voxel targets only (attribution arm)
mkdir -p .runs/ap_subvox
python tools/demo_ap_lift.py --work_dir .runs/ap_subvox $AP_ARGS --ncf_subvoxel \
    > .runs/ap_subvox.log 2>&1
cp .runs/ap_subvox/ap_lift.json artifacts/ap_lift_r4/ap_subvox.json || true

echo "TAKEOVER4 COMPLETE"
