#!/bin/bash
# Round-4 chain takeover: same jobs as tools/r4_ab_chain.sh but with the
# conv1_k7 formulation shoot-out (BENCH.md round-4b next-action) inserted
# into the A->B job boundary, so the profile-driven perf decision gets its
# TPU window without a second client ever touching the tunnel.
#
# Usage: bash tools/r4_takeover.sh <pid-of-running-arm-A-python>
# Serialized: exactly one JAX client at a time (CLAUDE.md).
set -ux
cd /root/repo
mkdir -p .runs artifacts/ap_lift_r4 artifacts/stage1_ab_r4 artifacts/perf_r4

AP_ARGS="--steps 8000 --train_frames 96 --noise 0.4 --val_frames 16 --boxes_per_frame 4"

run_ap () {  # $1 = name, rest = extra args
  name=$1; shift
  mkdir -p ".runs/$name"
  if [ "$name" != "ap_base" ] && [ -d .runs/ap_base/kitti_train ]; then
    ln -sfn "$(pwd)/.runs/ap_base/kitti_train" ".runs/$name/kitti_train"
    ln -sfn "$(pwd)/.runs/ap_base/kitti_val" ".runs/$name/kitti_val"
  fi
  python tools/demo_ap_lift.py --work_dir ".runs/$name" $AP_ARGS "$@" \
      > ".runs/$name.log" 2>&1
  cp ".runs/$name/ap_lift.json" "artifacts/ap_lift_r4/$name.json" || true
}

# 0. wait for the in-flight arm A (exact PID handed in)
while kill -0 "$1" 2>/dev/null; do sleep 15; done
cp .runs/ap_base/ap_lift.json artifacts/ap_lift_r4/ap_base.json || true

# 1. conv1_k7 formulation shoot-out (one window, ~10 min)
python tools/bench_conv1_k7.py --iters 10 \
    > artifacts/perf_r4/conv1_k7_shootout.json 2> .runs/conv1_k7.log || true

# 2. arm B: sub-voxel targets + soft-argmax decode
run_ap ap_subvox_soft --ncf_subvoxel --ncf_decode soft-argmax

# 3. job D: stage-1 W1 depth loss + per-plane offset branch
python tools/demo_two_stage.py --work_dir .runs/stage1_w1 --stage1_only \
    --train_frames 512 --val_frames 128 --stereo_steps 4000 \
    --reg_heading_sym --augment_flip --depth_loss w1 --depth_offset \
    > .runs/stage1_w1.log 2>&1
cp .runs/stage1_w1/stage1.json artifacts/stage1_ab_r4/w1_offset_stage1.json || true

# 4. arm C: sub-voxel targets only (attribution arm)
run_ap ap_subvox --ncf_subvoxel

echo "TAKEOVER CHAIN COMPLETE"
