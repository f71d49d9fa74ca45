"""Serving-layer tests: micro-batching pose service on the CPU mesh.

Rebuild-only surface (the reference has no serving story): one
fixed-shape compiled refine program behind a thread-safe micro-batching
front. Verifies per-request correctness under concurrency and the
padding/chunking bookkeeping.
"""

import threading

import jax
import numpy as np
import pytest

from deepim_tpu.config import config_from_dict
from deepim_tpu.data import synthetic_batch
from deepim_tpu.serve import PoseRefinerService

H, W = 64, 128


@pytest.fixture(scope="module")
def service():
    cfg = config_from_dict(
        {
            "experiment": "serve_test",
            "output_dir": "/tmp/serve_test_out",
            "network": {"input_height": H, "input_width": W,
                        "dtype": "float32", "fc_dim": 32,
                        "with_flow": False, "with_mask": False},
            "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                        "image_height": H, "image_width": W,
                        "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                        "num_points": 64},
            "test": {"test_iter": 1, "batch_size": 4, "renderer": "xla"},
        }
    )
    svc = PoseRefinerService(cfg, load_checkpoint=False,
                             gather_window_s=0.05)
    yield svc
    svc.close()


def _requests(svc, n, seed):
    b = synthetic_batch(jax.random.PRNGKey(seed), svc.assets, n,
                        np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]],
                                 np.float32),
                        (H, W), renderer="xla")
    ks = np.tile(np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]],
                          np.float32)[None], (n, 1, 1))
    return (np.asarray(b["obs_rgb"]), np.asarray(b["pose_src"]), ks,
            np.asarray(b["class_idx"]), np.asarray(b["pose_tgt"]))


@pytest.mark.slow
def test_refine_shapes_and_padding(service):
    obs, init, ks, cls, _ = _requests(service, 3, 0)  # n < batch: pads
    out = service.refine(obs, init, ks, cls)
    assert out.shape == (3, 3, 4)
    assert np.isfinite(out).all()
    assert service.stats.padded_slots >= 1


def test_refine_chunks_oversized_request(service):
    obs, init, ks, cls, _ = _requests(service, 6, 1)  # n > batch: 2 batches
    before = service.stats.device_batches
    out = service.refine(obs, init, ks, cls)
    assert out.shape == (6, 3, 4)
    assert service.stats.device_batches - before >= 2


def test_refine_matches_direct_call(service):
    """The service must return exactly what a direct refine_poses call
    returns for the same inputs (padding/coalescing is invisible)."""
    from deepim_tpu.refine import refine_poses

    obs, init, ks, cls, _ = _requests(service, 4, 2)
    out = service.refine(obs, init, ks, cls)
    direct = np.asarray(refine_poses(
        service.params, service.model, service.assets, obs, init, ks, cls,
        num_iters=service.num_iters, out_size=(H, W), renderer="xla",
    ))
    np.testing.assert_allclose(out, direct, atol=1e-5)


def test_concurrent_callers_coalesce(service):
    """4 threads x 1 pose: the worker coalesces them into shared device
    batches and every caller gets its own correct result."""
    obs, init, ks, cls, _ = _requests(service, 4, 3)
    results = [None] * 4
    errs = []

    def call(i):
        try:
            results[i] = service.refine(obs[i:i + 1], init[i:i + 1],
                                        ks[i:i + 1], cls[i:i + 1])[0]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    from deepim_tpu.refine import refine_poses

    direct = np.asarray(refine_poses(
        service.params, service.model, service.assets, obs, init, ks, cls,
        num_iters=service.num_iters, out_size=(H, W), renderer="xla",
    ))
    for i in range(4):
        np.testing.assert_allclose(results[i], direct[i], atol=1e-5)


def test_rejects_wrong_image_size(service):
    obs = np.zeros((1, H + 2, W, 3), np.float32)
    with pytest.raises(ValueError):
        service.refine(obs, np.zeros((1, 3, 4)), np.zeros((1, 3, 3)),
                       np.zeros((1,), np.int32))


def test_empty_request(service):
    out = service.refine(np.zeros((0, H, W, 3)), np.zeros((0, 3, 4)),
                         np.zeros((0, 3, 3)), np.zeros((0,), np.int32))
    assert out.shape == (0, 3, 4)


def test_close_fails_pending_and_rejects_new_requests():
    """close() must fail queued-but-unprocessed futures (callers would
    deadlock in f.result()) and subsequent refine() calls must raise."""
    from concurrent.futures import Future

    cfg = config_from_dict(
        {
            "experiment": "serve_close_test",
            "output_dir": "/tmp/serve_test_out",
            "network": {"input_height": H, "input_width": W,
                        "dtype": "float32", "fc_dim": 32,
                        "with_flow": False, "with_mask": False},
            "dataset": {"name": "synthetic", "objects": ["box"],
                        "image_height": H, "image_width": W,
                        "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                        "num_points": 64},
            "test": {"test_iter": 1, "batch_size": 4, "renderer": "xla"},
        }
    )
    svc = PoseRefinerService(cfg, load_checkpoint=False)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.refine(np.zeros((1, H, W, 3)), np.zeros((1, 3, 4)),
                   np.zeros((1, 3, 3)), np.zeros((1,), np.int32))
    # an item stranded in the queue (worker already exited) is failed by
    # the close-time drain rather than left to deadlock its caller
    f: Future = Future()
    svc._queue.put((np.zeros((H, W, 3), np.float32),
                    np.zeros((3, 4), np.float32),
                    np.zeros((3, 3), np.float32),
                    np.int32(0), None, None, f))
    svc.close()
    assert isinstance(f.exception(timeout=1), RuntimeError)


@pytest.mark.slow
def test_input_depth_model_requires_and_uses_obs_depth():
    """A checkpoint trained with input_depth must be served with observed
    depth — refine() rejects its absence and matches the direct call."""
    from deepim_tpu.refine import refine_poses

    cfg = config_from_dict(
        {
            "experiment": "serve_depth_test",
            "output_dir": "/tmp/serve_test_out",
            "network": {"input_height": H, "input_width": W,
                        "dtype": "float32", "fc_dim": 32,
                        "with_flow": False, "with_mask": False,
                        "input_depth": True},
            "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                        "image_height": H, "image_width": W,
                        "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                        "num_points": 64},
            "test": {"test_iter": 1, "batch_size": 4, "renderer": "xla"},
        }
    )
    svc = PoseRefinerService(cfg, load_checkpoint=False)
    try:
        obs, init, ks, cls, _ = _requests(svc, 2, 5)
        with pytest.raises(ValueError, match="obs_depth"):
            svc.refine(obs, init, ks, cls)
        depth = np.full((2, H, W), 0.8, np.float32)
        out = svc.refine(obs, init, ks, cls, obs_depth=depth)
        direct = np.asarray(refine_poses(
            svc.params, svc.model, svc.assets, obs, init, ks, cls,
            num_iters=svc.num_iters, out_size=(H, W), renderer="xla",
            obs_depth=depth,
        ))
        np.testing.assert_allclose(out, direct, atol=1e-5)
    finally:
        svc.close()


@pytest.mark.slow
def test_int8_static_service_calibrates_at_init():
    """network.quant=int8_static: the service calibrates activation scales
    before the first request (the entry-point wiring the serving layer
    needs — calibrate_model has no other caller at serving time)."""
    cfg = config_from_dict(
        {
            "experiment": "serve_test_q",
            "output_dir": "/tmp/serve_test_q_out",
            "network": {"input_height": H, "input_width": W,
                        "fc_dim": 32, "quant": "int8_static",
                        "with_flow": False, "with_mask": False},
            "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                        "image_height": H, "image_width": W,
                        "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                        "num_points": 64},
            "test": {"test_iter": 1, "batch_size": 4, "renderer": "xla"},
        }
    )
    svc = PoseRefinerService(cfg, load_checkpoint=False,
                             gather_window_s=0.05)
    try:
        assert svc.model.quant == "int8"
        assert len(svc.model.act_scales) > 0  # calibrated, not dynamic
        obs, init, ks, cls, _ = _requests(svc, 3, seed=9)
        out = svc.refine(obs, init, ks, cls)
        assert out.shape == (3, 3, 4)
        assert np.isfinite(out).all()
    finally:
        svc.close()
