"""Batched pose-refinement service.

Production wrapper around the one-program refine loop
(``refine/refiner.py §refine_poses``):

- **One fixed-shape compiled program.** The service compiles refine at a
  fixed batch size once; every request is padded/chunked onto it, so
  serving never recompiles (XLA static shapes).
- **Micro-batching.** Concurrent callers' requests are coalesced into
  device batches by a single worker thread (the only thread that touches
  the device — accelerator queues are effectively single-tenant), filling
  up to the compiled batch or a small gather window, whichever first.
- **Synchronous facade.** ``refine()`` blocks the caller; under the hood
  it shares device batches with other callers.

The reference has no serving story (research harness, host-driven loop);
this is rebuild-only surface. Reference analog of the compute it wraps:
``deepim/core/tester.py §pred_eval``'s inner loop.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field


@dataclass
class ServiceStats:
    requests: int = 0
    poses: int = 0
    device_batches: int = 0
    padded_slots: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record(self, requests: int = 0, poses: int = 0, batches: int = 0,
               padded: int = 0) -> None:
        with self.lock:
            self.requests += requests
            self.poses += poses
            self.device_batches += batches
            self.padded_slots += padded


class PoseRefinerService:
    """Thread-safe pose refinement over a fixed compiled batch.

    Args:
        cfg: a Config or a path to an experiment YAML.
        batch_size: compiled device batch (default cfg.test.batch_size).
        load_checkpoint: restore the experiment's latest checkpoint.
        gather_window_s: how long the worker waits to fill a batch after
            the first request arrives (micro-batching horizon).
        num_iters: refine iterations (default cfg.test.test_iter).
    """

    def __init__(self, cfg, batch_size: int | None = None,
                 load_checkpoint: bool = True,
                 gather_window_s: float = 0.002,
                 num_iters: int | None = None,
                 calibration_batches=None,
                 calibration_mode: str = "max_c"):
        import jax
        import numpy as np

        from deepim_tpu.cli.train import load_assets_and_names
        from deepim_tpu.config import update_config
        from deepim_tpu.config.config import Config
        from deepim_tpu.train import init_state, make_model
        from deepim_tpu.train.checkpoint import (
            latest_step, restore_checkpoint,
        )

        if not isinstance(cfg, Config):
            cfg = update_config(cfg)
        self.cfg = cfg
        self._np = np
        self._jax = jax
        self.assets, self.names, _ = load_assets_and_names(cfg)
        self.model = make_model(cfg, self.assets.num_classes, inference=True)
        state = init_state(cfg, self.model, jax.random.PRNGKey(0))
        self.step = 0
        if load_checkpoint:
            ckpt_dir = os.path.join(cfg.output_dir, cfg.experiment,
                                    "checkpoints")
            if latest_step(ckpt_dir) is not None:
                state = restore_checkpoint(ckpt_dir, state)
                self.step = int(state.step)
        self.params = state.params

        self.batch = int(batch_size or cfg.test.batch_size)
        self.num_iters = int(num_iters or cfg.test.test_iter)
        self.gather_window_s = gather_window_s
        self.stats = ServiceStats()

        n = cfg.network
        self._out_size = (n.input_height, n.input_width)
        self._coarse = ((n.coarse_height, n.coarse_width)
                        if n.coarse_height else None)
        self._coarse_iters = cfg.test.coarse_iters
        self._image_size = (cfg.dataset.image_height, cfg.dataset.image_width)

        if cfg.network.quant == "int8_static":
            # The serving-relevant quant mode (fastest full-res path) needs
            # calibrated activation scales before the first request.
            # ``calibration_batches``: eval-style batch dicts from the
            # caller's real data; default: two synthetic batches at the
            # config's noise model (scales only need coarse activation
            # ranges — measured 74.3 vs 75.96 bf16 ADD either way on the
            # occlusion protocol).
            from deepim_tpu.data.synthetic import synthetic_batch
            from deepim_tpu.models.quant import calibrate_model
            from deepim_tpu.raster.camera import make_intrinsics

            d = cfg.dataset
            k_cam = make_intrinsics(d.fx, d.fy, d.cx, d.cy)
            t = cfg.train
            calib = calibration_batches or [
                synthetic_batch(
                    jax.random.PRNGKey(4200 + i), self.assets, self.batch,
                    k_cam, self._image_size,
                    rot_noise_deg=t.rot_noise_deg,
                    rot_max_deg=t.rot_noise_max_deg,
                    trans_noise=t.trans_noise, trans_max=t.trans_noise_max,
                    renderer=cfg.test.renderer,
                )
                for i in range(2)
            ]
            self.model = calibrate_model(
                self.model, self.params, self.assets, calib, k_cam,
                self._out_size, renderer=cfg.test.renderer,
                num_iters=self.num_iters, mode=calibration_mode,
            )

        self._queue: queue.Queue = queue.Queue()
        self._worker = threading.Thread(target=self._worker_loop,
                                        daemon=True)
        self._running = True
        self._worker.start()

    # --- public API -------------------------------------------------------

    def refine(self, obs_rgb, init_pose, k, class_idx,
               obs_depth=None, obs_mask=None):
        """Refine N poses; blocks until done.  Arrays are numpy, shapes
        (N, H, W, 3), (N, 3, 4), (N, 3, 3), (N,) -> (N, 3, 4).

        ``obs_depth`` (N, H, W) metric depth / ``obs_mask`` (N, H, W)
        foreground mask feed the model's ``input_depth``/``input_mask``
        channels — REQUIRED for checkpoints trained with those inputs
        (serving with the rendered-image fallback would silently diverge
        from the eval-time behavior the checkpoint was validated at).
        """
        np = self._np
        if not self._running:
            raise RuntimeError("PoseRefinerService is closed")
        obs_rgb = np.asarray(obs_rgb, np.float32)
        init_pose = np.asarray(init_pose, np.float32)
        k = np.asarray(k, np.float32)
        class_idx = np.asarray(class_idx, np.int32)
        n = obs_rgb.shape[0]
        if n == 0:
            return np.zeros((0, 3, 4), np.float32)
        if obs_rgb.shape[1:3] != self._image_size:
            raise ValueError(
                f"observed frame {obs_rgb.shape[1:3]} != configured "
                f"dataset image size {self._image_size}")
        nw = self.cfg.network
        if nw.input_depth and obs_depth is None:
            raise ValueError("model was trained with network.input_depth; "
                             "refine() requires obs_depth")
        if nw.input_mask and obs_mask is None:
            raise ValueError("model was trained with network.input_mask; "
                             "refine() requires obs_mask")
        obs_depth = (None if obs_depth is None
                     else np.asarray(obs_depth, np.float32))
        obs_mask = (None if obs_mask is None
                    else np.asarray(obs_mask, bool))

        futures = []
        for i in range(n):  # enqueue per-sample; worker coalesces
            f: Future = Future()
            self._queue.put((obs_rgb[i], init_pose[i], k[i], class_idx[i],
                             None if obs_depth is None else obs_depth[i],
                             None if obs_mask is None else obs_mask[i], f))
            futures.append(f)
        out = np.stack([f.result() for f in futures])
        self.stats.record(requests=1, poses=n)
        return out

    def close(self) -> None:
        self._running = False
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=10)
        # Fail any items still queued (callers blocked in f.result() would
        # otherwise deadlock — the worker exits without draining).
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[-1].done():
                item[-1].set_exception(
                    RuntimeError("PoseRefinerService closed before this "
                                 "request was processed"))

    # --- worker -----------------------------------------------------------

    def _gather(self):
        """Block for one item, then fill up to self.batch within the
        gather window."""
        import time

        first = self._queue.get()
        if first is None:
            return None
        items = [first]
        deadline = time.monotonic() + self.gather_window_s
        while len(items) < self.batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-post shutdown for next loop
                break
            items.append(nxt)
        return items

    def _worker_loop(self) -> None:
        np = self._np

        from deepim_tpu.refine import refine_poses

        nw = self.cfg.network

        def col(items, j, pad):
            return np.stack([it[j] for it in items] + [items[0][j]] * pad)

        while self._running:
            items = self._gather()
            if items is None:
                break
            b = self.batch
            n = len(items)
            pad = b - n
            obs, poses, ks, cls = (col(items, j, pad) for j in range(4))
            # depth/mask columns: refine() guarantees they are present on
            # every item when the model consumes them; otherwise ignored.
            depth = (col(items, 4, pad)
                     if nw.input_depth and items[0][4] is not None else None)
            mask = (col(items, 5, pad)
                    if nw.input_mask and items[0][5] is not None else None)
            try:
                out = refine_poses(
                    self.params, self.model, self.assets, obs, poses, ks,
                    cls, num_iters=self.num_iters, out_size=self._out_size,
                    renderer=self.cfg.test.renderer,
                    obs_depth=depth, obs_mask=mask,
                    coarse_iters=self._coarse_iters,
                    coarse_size=self._coarse,
                )
                out = np.asarray(out)
                for i, it in enumerate(items):
                    it[-1].set_result(out[i])
            except Exception as e:  # surface device errors to callers
                for it in items:
                    if not it[-1].done():
                        it[-1].set_exception(e)
                continue
            self.stats.record(batches=1, padded=pad)
