#!/bin/bash
# Round-5 window 2 (post-multiclass): validate the shipped fold_vmem
# default on BOTH vernier bench configs (small runs W=96 < 128 lanes —
# the one shape class where the kernel could lose; flagship recapture
# also picks up the pl.CostEstimate MFU fix), then the curved-tracking
# arm with the round-4 refiner (trained at 0.57 m noise) to split the
# EMA-lag vs noise-scale-mismatch attribution in docs/TRACKING.md.
set -ux
cd /root/repo
mkdir -p artifacts/perf_r5

timeout 1500 python bench.py --config small \
    > artifacts/perf_r5/small_fold_default.json 2>/dev/null || true
cat artifacts/perf_r5/small_fold_default.json
timeout 1500 python bench.py --config flagship \
    > artifacts/perf_r5/flagship_fold_default.json 2>/dev/null || true
cat artifacts/perf_r5/flagship_fold_default.json

timeout 1800 python tools/watchdog_run.py --max-restarts 2 \
    --log .runs/r5_track_curve_r4ckpt.log --total-timeout 1700 -- \
    python tools/demo_tracking.py --work_dir .runs/r5_track_curve_r4ckpt \
    --load_ckpt artifacts/two_stage_r4/vernier_ckpt --seq_frames 20 \
    --motion cv --yaw_rate 0.1 || true
cp .runs/r5_track_curve_r4ckpt/tracking.json \
   artifacts/r5/tracking_curve_cv_r4ckpt.json || true

echo "R5 WINDOW2 COMPLETE"
