#!/usr/bin/env python
"""Training watchdog: detect a wedged run, kill it, resume it.

Long runs over the axon TPU tunnel can wedge mid-epoch: the process
blocks forever on a device fetch while fresh processes talk to the chip
fine (observed round 3: an ex3 run froze 20+ min at epoch 18 with its
CPU clock stopped; `--resume-epoch 18` recovered it by hand).  This
supervisor automates exactly that recovery, from OUTSIDE the process —
a blocked device fetch cannot be interrupted from inside it.

    python tools/supervise.py --deadline 600 --log /tmp/run.log -- \
        python examples/ex3_darcy_inv.py --epochs 100 ...

Mechanism: launch the command with stdout/stderr appended to --log,
watch the log for growth; if it grows by nothing for --deadline
seconds, SIGKILL the process group, parse the last completed epoch from
the trainer's per-epoch lines ("epoch [K/N]"), and relaunch with
`--resume-epoch K` (all four example drivers support it: checkpoint
restores params + optimizer state, the schedule position comes from the
restored step count).  Repeats up to --max-restarts.

The deadline is per LOG-SILENCE, not per epoch — set it comfortably
above the slowest expected epoch + compile time (first epochs include a
5–10 min XLA compile on the tunnel; the default 1200 s covers that).
"""
import argparse
import os
import re
import signal
import subprocess
import sys
import time

EPOCH_RE = re.compile(r"epoch \[(\d+)/\d+\]")


def last_epoch(log_path):
    """Last completed epoch number in the log, or None."""
    try:
        with open(log_path, "rb") as f:
            tail = f.read()[-65536:].decode("utf-8", "replace")
    except OSError:
        return None
    hits = EPOCH_RE.findall(tail)
    return int(hits[-1]) if hits else None


def strip_resume(cmd):
    """Remove any existing --resume-epoch <k> so restarts don't stack."""
    out, skip = [], False
    for tok in cmd:
        if skip:
            skip = False
            continue
        if tok == "--resume-epoch":
            skip = True
            continue
        if tok.startswith("--resume-epoch="):
            continue
        out.append(tok)
    return out


def run_once(cmd, log_path, deadline, poll):
    """Run cmd until exit or log silence > deadline.

    Returns ("done", returncode) or ("stalled", None)."""
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                start_new_session=True)
    try:
        last_size = -1
        last_change = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                return "done", rc
            try:
                size = os.stat(log_path).st_size
            except OSError:
                size = -1
            if size != last_size:
                last_size = size
                last_change = time.time()
            elif time.time() - last_change > deadline:
                print(f"[supervise] no log output for {deadline:.0f}s — "
                      f"killing pid {proc.pid}", flush=True)
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                return "stalled", None
            time.sleep(poll)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="watchdog: kill+resume a wedged training run",
        usage="supervise.py [options] -- <command ...>")
    ap.add_argument("--deadline", type=float, default=1200.0,
                    help="seconds of log silence before the run is "
                         "declared wedged (cover compile + slowest epoch)")
    ap.add_argument("--log", required=True, help="log file to write/watch")
    ap.add_argument("--max-restarts", type=int, default=5)
    ap.add_argument("--poll", type=float, default=5.0,
                    help="log poll interval (s)")
    if argv is None:
        argv = sys.argv[1:]
    if "--" not in argv:
        ap.error("separate the command with '--'")
    split = argv.index("--")
    args = ap.parse_args(argv[:split])
    base_cmd = strip_resume(argv[split + 1:])
    if not base_cmd:
        ap.error("empty command")

    restarts = 0
    cmd = list(base_cmd)
    while True:
        print(f"[supervise] launching (attempt {restarts + 1}): "
              f"{' '.join(cmd)}", flush=True)
        status, rc = run_once(cmd, args.log, args.deadline, args.poll)
        if status == "done":
            print(f"[supervise] command exited rc={rc}", flush=True)
            return rc
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[supervise] giving up after {args.max_restarts} "
                  "restarts", flush=True)
            return 2
        ep = last_epoch(args.log)
        cmd = list(base_cmd)
        if ep is not None:
            cmd += ["--resume-epoch", str(ep)]
            print(f"[supervise] resuming from epoch {ep}", flush=True)
        else:
            print("[supervise] no epoch line found — restarting from "
                  "scratch", flush=True)


if __name__ == "__main__":
    sys.exit(main())
