"""Tests for profiling/logging/viz utilities."""

import json
import os

import numpy as np

from deepim_tpu.utils import (
    MetricsLogger,
    PrintAndLog,
    Speedometer,
    StageTimer,
    flow_to_rgb,
    mask_to_rgb,
    overlay_render,
    side_by_side,
)


def test_print_and_log(tmp_path, capsys):
    log = PrintAndLog(str(tmp_path / "log.txt"))
    log("hello", 42)
    assert "hello 42" in capsys.readouterr().out
    assert "hello 42" in open(tmp_path / "log.txt").read()


def test_metrics_logger(tmp_path):
    m = MetricsLogger(str(tmp_path / "m.jsonl"))
    m.write(1, {"loss": np.float32(0.5), "name": "x"})
    m.write(2, {"loss": 0.25})
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert recs[0]["loss"] == 0.5 and recs[1]["step"] == 2


def test_stage_timer():
    import jax.numpy as jnp

    t = StageTimer()
    with t.time("matmul") as box:
        box["result"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert t.counts["matmul"] == 1
    assert "matmul" in t.summary()


def test_speedometer(capsys):
    logs = []
    list(Speedometer(range(10), batch_size=4, every=5, log=logs.append))
    assert len(logs) == 2 and "samples/s" in logs[0]


def test_flow_to_rgb():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4, :, 0] = 3.0  # rightward
    flow[4:, :, 1] = -3.0  # upward
    img = flow_to_rgb(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # different directions -> different colors
    assert not np.array_equal(img[0, 0], img[7, 0])


def test_overlay_and_montage():
    obs = np.random.rand(16, 16, 3).astype(np.float32)
    ren = np.random.rand(16, 16, 3).astype(np.float32)
    depth = np.zeros((16, 16), np.float32)
    depth[4:12, 4:12] = 0.7
    out = overlay_render(obs, ren, depth)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    # outside the object the observed frame is unchanged
    np.testing.assert_array_equal(
        out[0, 0], (np.clip(obs[0, 0], 0, 1) * 255).astype(np.uint8)
    )
    m = side_by_side(out, mask_to_rgb(depth > 0))
    assert m.shape[0] == 16 and m.shape[1] >= 32


def test_plot_train_tool(tmp_path):
    """tools/plot_train.py renders a curves PNG from a train_log.jsonl."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools import plot_train

    log = tmp_path / "train_log.jsonl"
    with open(log, "w") as f:
        for s in range(1, 6):
            f.write(json.dumps({
                "step": s * 10, "loss": 1.0 / s, "pm_loss_0": 0.1 / s,
                "rot_err_deg_0": 20.0 / s, "trans_err_0": 0.05 / s,
                "add_0": 0.04 / s, "flow_loss_0": 5.0 / s,
            }) + "\n")
    out = str(tmp_path / "curves.png")
    assert plot_train.main([str(log), "--out", out]) == 0
    assert os.path.getsize(out) > 10_000
