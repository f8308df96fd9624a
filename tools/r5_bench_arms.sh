#!/bin/bash
# Round-5 stage 1: reconcile the driver-bench flagship regression
# (VERDICT r4 weak #1 / next #1).  BENCH_r04.json captured the flagship at
# 4.19 inst/s under the driver's bare `python bench.py` (small -> flagship
# -> stereo, ONE process) while the same commit measured 11.58 inst/s via
# `--config flagship` alone — with stereo healthy in the same driver
# process, so window drift does not fit.  Same-window arms, one axon
# client at a time:
#   1. bare bench.py            (driver invocation — reproduce the 4.19)
#   2. --config flagship alone  (the in-repo methodology)
#   3. bare with SNVC_SAMPLE_BAND=never (is the banded-sampler default
#      interacting with the all-config process?)
#   4. small then flagship, no stereo (isolate the small->flagship
#      interaction from the stereo tail)
# Usage: bash tools/r5_bench_arms.sh  (nothing else may hold the tunnel)
set -ux
cd /root/repo
mkdir -p .runs artifacts/perf_r5

python bench.py > artifacts/perf_r5/arm1_bare.json 2> .runs/r5_arm1.log || true
python bench.py --config flagship \
    > artifacts/perf_r5/arm2_flagship_alone.json 2> .runs/r5_arm2.log || true
SNVC_SAMPLE_BAND=never python bench.py \
    > artifacts/perf_r5/arm3_bare_noband.json 2> .runs/r5_arm3.log || true
python - > artifacts/perf_r5/arm4_small_then_flagship.json 2> .runs/r5_arm4.log <<'EOF' || true
import bench
bench.check_tpu_reachable()
bench.bench_vernier("small", 30)
bench.bench_vernier("flagship", 30)
EOF

echo "R5 BENCH ARMS COMPLETE"
