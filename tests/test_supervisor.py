"""Tests for tools/supervise_train.py (failure detection, SURVEY.md §5).

The reference has no resilience subsystem at all (crash = rerun by
hand); the rebuild's supervisor must survive both trainer crashes and
backend (tunnel) outages, so the probe-gating logic gets unit tests.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import supervise_train as sup  # noqa: E402


def test_wait_for_device_no_wait_when_alive():
    sleeps = []
    sup.wait_for_device(alive=lambda _t: True, sleep=sleeps.append)
    assert sleeps == []


def test_wait_for_device_retries_until_alive():
    answers = iter([False, False, True])
    sleeps = []
    sup.wait_for_device(alive=lambda _t: next(answers),
                        sleep=sleeps.append, retry_sec=7)
    assert sleeps == [7, 7]


def test_device_alive_on_cpu_backend():
    # conftest exports JAX_PLATFORMS=cpu, so the probe subprocess runs
    # against the local CPU backend and must succeed.
    assert sup.device_alive(timeout_sec=300)


def test_device_alive_times_out():
    # A probe that can never finish inside the timeout reports dead
    # rather than hanging the supervisor.
    orig = sup.PROBE_SRC
    sup.PROBE_SRC = "import time; time.sleep(60)"
    try:
        assert not sup.device_alive(timeout_sec=1)
    finally:
        sup.PROBE_SRC = orig


def test_tail_done(tmp_path):
    log = tmp_path / "t.log"
    log.write_bytes(b"step 99/100\n")
    assert not sup.tail_done(str(log))
    log.write_bytes(b"step 100/100\ndone; checkpoints in /x\n")
    assert sup.tail_done(str(log))


def test_stepped_since_scopes_to_current_launch(tmp_path):
    # Step lines from a PREVIOUS run (before the relaunch offset) must
    # not count: a relaunched process is jit-recompiling and needs the
    # 3x compile budget, not the 1x steady-state budget.
    log = tmp_path / "t.log"
    log.write_bytes(b"launch\nstep 100/200 loss=1\nstep 200/200\n")
    offset = log.stat().st_size
    assert not sup.stepped_since(str(log), offset)
    with open(log, "ab") as f:
        f.write(b"relaunch banner\ncompiling...\n")
    assert not sup.stepped_since(str(log), offset)
    with open(log, "ab") as f:
        f.write(b"step 201/400 loss=1\n")
    assert sup.stepped_since(str(log), offset)


def test_stepped_since_fresh_log_and_straddle(tmp_path):
    log = tmp_path / "t.log"
    log.write_bytes(b"step 1/10\n")
    assert sup.stepped_since(str(log), 0)  # file-start step line counts
    # A "\nstep " whose newline falls exactly at the offset still counts.
    base = b"banner"
    log.write_bytes(base)
    off = log.stat().st_size
    with open(log, "ab") as f:
        f.write(b"\nstep 2/10\n")
    assert sup.stepped_since(str(log), off + 1)
    assert not sup.stepped_since(str(tmp_path / "missing.log"), 0)
