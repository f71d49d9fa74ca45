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
