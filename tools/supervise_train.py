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

Relaunches are gated on a device-liveness probe: the axon tunnel can go
down for tens of minutes (server-side), and relaunching into a dead
backend burns a restart budget slot plus a full jit recompile each time.
Probe failures wait, they don't count as restarts.

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

# Tiny device round-trip: init the backend, one matmul, one scalar
# device->host read (block_until_ready alone has returned early over
# the tunnel).  Runs in a subprocess so a wedged backend can be timed
# out without poisoning the supervisor's own process.
PROBE_SRC = (
    # Re-assert JAX_PLATFORMS via config.update: the sandbox's
    # sitecustomize clobbers the env-var choice when it registers the
    # axon backend, and a clobbered 'cpu' would dial the tunnel anyway.
    "import os, jax;"
    "_p = os.environ.get('JAX_PLATFORMS');"
    "_p and jax.config.update('jax_platforms', _p.split(',')[0]);"
    "import jax.numpy as jnp;"
    "x = jnp.ones((8, 128)) * 2;"
    "assert float((x @ x.T)[0, 0]) == 512.0"
)


def device_alive(timeout_sec: int = 180) -> bool:
    """True iff a fresh subprocess can complete a device round-trip."""
    try:
        rc = subprocess.run(
            [sys.executable, "-u", "-c", PROBE_SRC],
            timeout=timeout_sec,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_device(probe_timeout: int = 180, retry_sec: int = 120,
                    alive=device_alive, sleep=time.sleep) -> None:
    """Block until the device answers.  Outages don't consume restarts."""
    probes = 0
    while not alive(probe_timeout):
        probes += 1
        print(f"[supervisor] device probe #{probes} failed; "
              f"retrying in {retry_sec}s")
        sleep(retry_sec)
    if probes:
        print(f"[supervisor] device back after {probes} failed probes")


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
    env = dict(os.environ, DEEPIM_SUPERVISED="1")
    proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                            start_new_session=True, env=env)
    print(f"[supervisor] launched pid {proc.pid}: {' '.join(cmd)}")
    return proc


def stepped_since(log_path: str, offset: int) -> bool:
    """True iff a "step N" progress line was written at/after ``offset``.

    The compile-phase 3x stale budget must be scoped to the CURRENT
    launch: the log is append-only across kill+resume cycles, so step
    lines from a previous run would otherwise grant the relaunched
    process (which is jit-recompiling, possibly cold-cache) only the 1x
    budget — reintroducing the kill/recompile loop.  Scanning from the
    per-launch offset also bounds the 30s-poll read to new bytes.
    """
    try:
        with open(log_path, "rb") as f:
            f.seek(max(0, offset - 6))  # catch "\nstep " straddling offset
            data = f.read()
        return b"\nstep " in data or (offset == 0 and data.startswith(b"step "))
    except OSError:
        return False


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

    wait_for_device()
    launch_offset = os.path.getsize(log_path)
    proc = launch(args.cfg, log_path, resume=True, extra=args.rest)
    restarts = 0
    stepped = False  # has THIS launch produced a "step N" line yet?
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
            wait_for_device()
            launch_offset = os.path.getsize(log_path)
            proc = launch(args.cfg, log_path, resume=True, extra=args.rest)
            stepped = False
            continue
        age = time.time() - os.path.getmtime(log_path)
        # Before the first "step N/M" line the process is jit-compiling:
        # a 480x640 train step takes 10-20+ min over the axon tunnel and
        # writes nothing, which the plain stale check misread as a wedge
        # (observed: a kill/recompile loop that never reached step 1).
        # Compiles killed midway cache nothing, so the loop never
        # converges — give the compile phase 3x the budget.  The check is
        # scoped to output since the CURRENT launch (see stepped_since).
        if not stepped:
            stepped = stepped_since(log_path, launch_offset)
        stale_budget = args.stale_sec if stepped else 3 * args.stale_sec
        if age > stale_budget:
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
            wait_for_device()
            launch_offset = os.path.getsize(log_path)
            proc = launch(args.cfg, log_path, resume=True, extra=args.rest)
            stepped = False


if __name__ == "__main__":
    raise SystemExit(main())
