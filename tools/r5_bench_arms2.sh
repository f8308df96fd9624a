#!/bin/bash
# Round-5 bench arms 2-4 (arm 1 banked in artifacts/perf_r5/arm1_bare.json),
# each under the stall watchdog (tools/watchdog_run.py) after arm 2 wedged
# mid-run on the first attempt.  One axon client at a time.
set -ux
cd /root/repo
mkdir -p .runs artifacts/perf_r5

python tools/watchdog_run.py --log .runs/r5_arm2.log --stall-secs 360 \
    --total-timeout 2400 -- \
    python bench.py --config flagship
# the watchdog appends everything to the log; the JSON line is the last one
grep -h '"metric"' .runs/r5_arm2.log | tail -1 > artifacts/perf_r5/arm2_flagship_alone.json || true

SNVC_SAMPLE_BAND=never python tools/watchdog_run.py --log .runs/r5_arm3.log \
    --stall-secs 360 --total-timeout 3600 -- \
    python bench.py
grep -h '"metric"' .runs/r5_arm3.log > artifacts/perf_r5/arm3_bare_noband.json || true

python tools/watchdog_run.py --log .runs/r5_arm4.log --stall-secs 360 \
    --total-timeout 2400 -- \
    python -c "
import bench
bench.check_tpu_reachable()
bench.bench_vernier('small', 30)
bench.bench_vernier('flagship', 30)
"
grep -h '"metric"' .runs/r5_arm4.log > artifacts/perf_r5/arm4_small_then_flagship.json || true

echo "R5 BENCH ARMS 2-4 COMPLETE"
