#!/usr/bin/env python
"""Stall-watchdog runner for axon TPU jobs.

The dev tunnel intermittently wedges a client mid-run (observed repeatedly
on 2026-08-20; CLAUDE.md "tunnel wedge" note).  Long jobs (multi-hour
training chains) cannot afford to die on one wedge, and training scripts
checkpoint + resume, so the correct recovery is: detect the stall, kill
the client by EXACT PID (never by pattern), wait for the tunnel to clear,
relaunch the same command.

Stall detector (v2): a wedged client is NOT fully CPU-frozen — runtime
heartbeat threads trickle ~1 tick / 15 s — and a client waiting on a long
server-side compile is ALSO near-idle, so neither CPU rate nor output
silence alone separates the two.  The combined rule over a long window
does: stall iff, across --stall-secs, (a) the job wrote NOTHING to its
log and (b) the process tree accumulated < --min-ticks of CPU.  A
compiling client occasionally logs nothing either, so the window must
exceed the longest legitimate silent compile (~20 min observed); default
1500 s.  A wedge then costs ~25 min and a restart, not the run.

Usage:
  python tools/watchdog_run.py --log FILE [--stall-secs 1500]
      [--min-ticks 1500] [--max-restarts 8] [--total-timeout 21600]
      -- CMD ARGS...

Exit code: the wrapped command's last exit code (124 on total timeout,
125 on restart exhaustion).
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def tree_cpu_ticks(pid: int) -> int:
    """Sum utime+stime over pid and its descendants (via /proc)."""
    procs = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            ticks = int(parts[11]) + int(parts[12])
            procs[int(d)] = (ppid, ticks)
        except (OSError, IndexError, ValueError):
            continue
    members = {pid}
    changed = True
    while changed:
        changed = False
        for p, (pp, _) in procs.items():
            if pp in members and p not in members:
                members.add(p)
                changed = True
    return sum(procs[p][1] for p in members if p in procs)


def kill_tree(proc: subprocess.Popen):
    """SIGTERM then SIGKILL the process group (started in its own)."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig in (signal.SIGTERM, signal.SIGKILL):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        try:
            proc.wait(timeout=10)
            return
        except subprocess.TimeoutExpired:
            continue


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True, help="append stdout+stderr here")
    ap.add_argument("--stall-secs", type=int, default=1500,
                    help="window with no log output AND almost no CPU that "
                    "counts as a wedge (must exceed the longest legitimate "
                    "silent server-side compile)")
    ap.add_argument("--min-ticks", type=int, default=1500,
                    help="tree CPU ticks (1 tick = 10 ms) over the window "
                    "below which the job counts as idle")
    ap.add_argument("--poll-secs", type=int, default=30)
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--total-timeout", type=int, default=6 * 3600)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    t_start = time.time()
    restarts = 0
    rc = 1
    while True:
        with open(args.log, "a") as logf:
            logf.write(f"\n=== watchdog launch (attempt {restarts + 1}): "
                       f"{' '.join(cmd)} ===\n")
            logf.flush()
            proc = subprocess.Popen(
                cmd, stdout=logf, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            # (time, ticks, log_size) samples over the stall window
            window = []
            stalled = False
            while True:
                try:
                    rc = proc.wait(timeout=args.poll_secs)
                    break
                except subprocess.TimeoutExpired:
                    pass
                now = time.time()
                if now - t_start > args.total_timeout:
                    logf.write("=== watchdog: total timeout, killing ===\n")
                    kill_tree(proc)
                    print("watchdog: total timeout", flush=True)
                    sys.exit(124)
                ticks = tree_cpu_ticks(proc.pid)
                try:
                    log_size = os.stat(args.log).st_size
                except OSError:
                    log_size = 0
                window.append((now, ticks, log_size))
                window = [w for w in window if now - w[0] <= args.stall_secs]
                t0, k0, s0 = window[0]
                if (now - t0 >= args.stall_secs - args.poll_secs
                        and ticks - k0 < args.min_ticks
                        and log_size == s0):
                    logf.write(
                        f"=== watchdog: {args.stall_secs}s with no output "
                        f"and {ticks - k0} CPU ticks -> wedge; killing ===\n")
                    logf.flush()
                    kill_tree(proc)
                    stalled = True
                    rc = 125
                    break
        if not stalled:
            print(f"watchdog: command exited rc={rc}", flush=True)
            sys.exit(rc)
        restarts += 1
        if restarts > args.max_restarts:
            print("watchdog: too many restarts", flush=True)
            sys.exit(125)
        # let the wedged tunnel clear before the next client connects
        time.sleep(30)


if __name__ == "__main__":
    main()
