#!/bin/bash
# Round-5 reserved perf window (VERDICT r4 #5): evaluate the in-VMEM
# fold_out conv kernel (ops/conv3d_fold_pallas.py) on real TPU, then
# capture the round's final bench.  Run AFTER tools/r5_stop_chain.sh —
# nothing else may hold the tunnel.
#
# Stages (each gated on the previous; every artifact lands in
# artifacts/perf_r5/):
#   1. numerics-on-hardware + op-level shoot-out on the two gated shapes
#      (the bench's built-in small-slice gate runs the real kernel first,
#      so a Mosaic rejection or wrong-math fails fast here);
#   2. flagship model-level same-window A/B: base vs SNVC_FOLD_VMEM=auto
#      (same discipline as the round-4d table);
#   3. final bench.py capture (hermetic per-config subprocesses + the
#      calibration fingerprint) for BENCH.md.
set -ux
cd /root/repo
mkdir -p artifacts/perf_r5

# 1. op-level: per_tap vs fold_vmem (+ fold_out for reference) on k7/k5
timeout 1500 python tools/bench_conv1_k7.py --iters 10 \
    --cases conv1_k7,conv2_k5 --only per_tap,fold_out,fold_vmem \
    2>&1 | tee artifacts/perf_r5/fold_vmem_shootout.log

# 2. model-level same-window A/B (order: base first, then the arm)
timeout 1200 python bench.py --config flagship \
    > artifacts/perf_r5/flagship_base_w2.json 2>/dev/null || true
cat artifacts/perf_r5/flagship_base_w2.json
SNVC_FOLD_VMEM=auto timeout 1800 python bench.py --config flagship \
    > artifacts/perf_r5/flagship_fold_vmem.json 2>/dev/null || true
cat artifacts/perf_r5/flagship_fold_vmem.json

echo "R5 PERF WINDOW COMPLETE"
