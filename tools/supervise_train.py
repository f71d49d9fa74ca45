"""Failure-detecting training supervisor (SURVEY.md §5: failure detection).

The reference has no resilience story (crash = rerun by hand).  Here the
training CLI checkpoints via orbax, so a supervisor can make any run
self-healing: launch ``cli.train``, watch its log for liveness, and on a
crash *or* a wedge (process alive but the log stale — seen with the
experimental axon TPU tunnel when a second process touches the chip) kill
and relaunch with ``--resume``.

Usage:
    python tools/supervise_train.py --cfg experiments/cfgs/foo.yaml \
        [--stale-sec 600] [--log /tmp/train_foo.log] [-- extra cli args]

Exits 0 when the training run prints its completion line.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

DONE_MARKER = "done; checkpoints"


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cfg", required=True)
    p.add_argument("--stale-sec", type=int, default=600,
                   help="kill+resume if the log is silent this long")
    p.add_argument("--log", default=None,
                   help="log file (default /tmp/supervise_<experiment>.log)")
    p.add_argument("--max-restarts", type=int, default=20)
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="extra args forwarded to cli.train (after --)")
    return p.parse_args(argv)


def launch(cfg: str, log_path: str, resume: bool, extra) -> subprocess.Popen:
    cmd = [sys.executable, "-u", "-m", "deepim_tpu.cli.train", "--cfg", cfg]
    if resume:
        cmd.append("--resume")
    cmd += [a for a in extra if a != "--"]
    logf = open(log_path, "ab", buffering=0)
    proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                            start_new_session=True)
    print(f"[supervisor] launched pid {proc.pid}: {' '.join(cmd)}")
    return proc


def tail_done(log_path: str) -> bool:
    try:
        with open(log_path, "rb") as f:
            f.seek(max(0, os.path.getsize(log_path) - (1 << 16)))
            return DONE_MARKER.encode() in f.read()
    except OSError:
        return False


def main(argv=None) -> int:
    args = parse_args(argv)
    name = os.path.splitext(os.path.basename(args.cfg))[0]
    log_path = args.log or f"/tmp/supervise_{name}.log"
    open(log_path, "wb").close()

    proc = launch(args.cfg, log_path, resume=True, extra=args.rest)
    restarts = 0
    while True:
        time.sleep(30)
        rc = proc.poll()
        if rc is not None:
            if tail_done(log_path):
                print(f"[supervisor] training complete (rc={rc})")
                return 0
            restarts += 1
            if restarts > args.max_restarts:
                print("[supervisor] too many restarts; giving up")
                return 1
            print(f"[supervisor] pid died unfinished (rc={rc}); "
                  f"resume #{restarts}")
            proc = launch(args.cfg, log_path, resume=True, extra=args.rest)
            continue
        age = time.time() - os.path.getmtime(log_path)
        if age > args.stale_sec:
            restarts += 1
            if restarts > args.max_restarts:
                print("[supervisor] too many restarts; giving up")
                return 1
            print(f"[supervisor] log stale {age:.0f}s; killing pid "
                  f"{proc.pid} and resuming (#{restarts})")
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
                time.sleep(10)
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            time.sleep(5)
            proc = launch(args.cfg, log_path, resume=True, extra=args.rest)


if __name__ == "__main__":
    raise SystemExit(main())
