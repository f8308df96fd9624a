#!/bin/bash
# Round-4 chain takeover, stage 5 (supersedes r4_takeover4.sh after its
# conv shoot-out banked artifacts/perf_r4/conv_shootout_b2.json): the
# shoot-out answered the formulation question — fold_out wins k7 1.79x /
# k5 1.2x and LOSES k3; grouped_tap loses every shape, so the queued
# model-level grouped A/B is dropped (op-level same-window order is the
# decision signal).  New queue, same single-client discipline:
#   1. flagship base (re-run: the takeover4 base run crashed on the banded
#      kernel's SMEM layout bug, since fixed; its artifact was garbage)
#   2. flagship A/B: selective fold_out on k>=5 convs (SNVC_FOLD_OUT=k5up)
#   3. flagship A/B: row-banded sampling kernel (SNVC_SAMPLE_BAND=auto)
#   4. combined arm (both hatches)
#   5. stage-1 W1 depth-loss + offset A/B (long)
#   6. AP_LIFT arm C: sub-voxel-only attribution (long)
# Usage: bash tools/r4_takeover5.sh   (nothing else may hold the tunnel)
set -ux
cd /root/repo
mkdir -p .runs artifacts/ap_lift_r4 artifacts/stage1_ab_r4 artifacts/perf_r4

AP_ARGS="--steps 8000 --train_frames 96 --noise 0.4 --val_frames 16 --boxes_per_frame 4"

# 1-4. flagship model-level A/Bs, one window
python bench.py --config flagship \
    > artifacts/perf_r4/flagship_base.json 2> .runs/flagship_base.log || true
SNVC_FOLD_OUT=k5up python bench.py --config flagship \
    > artifacts/perf_r4/flagship_foldk5up.json 2> .runs/flagship_foldk5up.log || true
SNVC_SAMPLE_BAND=auto python bench.py --config flagship \
    > artifacts/perf_r4/flagship_band.json 2> .runs/flagship_band.log || true
SNVC_FOLD_OUT=k5up SNVC_SAMPLE_BAND=auto python bench.py --config flagship \
    > artifacts/perf_r4/flagship_fold_band.json 2> .runs/flagship_fold_band.log || true

# 4. stage-1 W1 depth loss + per-plane offset branch
python tools/demo_two_stage.py --work_dir .runs/stage1_w1 --stage1_only \
    --train_frames 512 --val_frames 128 --stereo_steps 4000 \
    --reg_heading_sym --augment_flip --depth_loss w1 --depth_offset \
    > .runs/stage1_w1.log 2>&1
cp .runs/stage1_w1/stage1.json artifacts/stage1_ab_r4/w1_offset_stage1.json || true

# 5. arm C: sub-voxel targets only (attribution arm)
mkdir -p .runs/ap_subvox
python tools/demo_ap_lift.py --work_dir .runs/ap_subvox $AP_ARGS --ncf_subvoxel \
    > .runs/ap_subvox.log 2>&1
cp .runs/ap_subvox/ap_lift.json artifacts/ap_lift_r4/ap_subvox.json || true

echo "TAKEOVER5 COMPLETE"
