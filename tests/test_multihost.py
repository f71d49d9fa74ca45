"""2-process jax.distributed smoke test (multi-host DP path).

Spawns two fresh Python processes, each with 4 virtual CPU devices, that
form one 8-device global 'data' mesh via ``initialize_multihost`` and run
ONE fused synthetic train step — the multi-host entry points
(``parallel/distributed.py``) exercised for real instead of declared.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.dist
def test_two_process_distributed_train_step():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # the worker forces cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid{pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]
    # both processes computed the SAME global step -> identical loss
    losses = [float(out.split("loss=")[1].split()[0]) for out in outs]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_process_local_batch_size_single():
    from deepim_tpu.parallel import process_local_batch_size

    assert process_local_batch_size(16) == 16  # single process: identity
