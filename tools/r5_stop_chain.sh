#!/bin/bash
# Stop the r5 takeover chain cleanly: kill the chain bash and every
# descendant (watchdog + axon client) by EXACT PID discovered from the
# /proc tree rooted at the recorded chain PID — never by pattern
# (CLAUDE.md: pattern kills can match this session itself).
# Training stages checkpoint every 1000 steps, so a stopped stage resumes
# from its last checkpoint if relaunched.
set -u
PIDFILE="${1:-/tmp/r5_chain.pid}"
[ -f "$PIDFILE" ] || { echo "no pidfile $PIDFILE"; exit 0; }
ROOT=$(cat "$PIDFILE")

descendants() {  # echo all descendant pids of $1, depth-first (children last)
    local p
    for p in $(ps -o pid= --ppid "$1" 2>/dev/null); do
        descendants "$p"
        echo "$p"
    done
}

if ! kill -0 "$ROOT" 2>/dev/null; then
    echo "chain $ROOT already gone"
    exit 0
fi
PIDS=$(descendants "$ROOT")
echo "stopping chain $ROOT, descendants: $PIDS"
# stop the bash first so it can't launch the next stage, then the tree
kill "$ROOT" 2>/dev/null
for p in $PIDS; do kill "$p" 2>/dev/null; done
sleep 5
for p in $PIDS $ROOT; do kill -9 "$p" 2>/dev/null; done
echo "chain stopped; waiting 20s for the tunnel to clear"
sleep 20
