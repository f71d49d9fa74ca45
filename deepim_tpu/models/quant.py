"""Calibrated static-scale int8 inference (``network.quant: int8_static``).

The dynamic-scale int8 mode (DESIGN.md §14) measured throughput-neutral:
its per-layer max-abs reduction re-reads every activation, giving the
int8 MXU-rate win back as HBM traffic.  Static calibrated scales delete
that pass — the quantize becomes pure elementwise work fused into the
producing conv's epilogue, and the tensor that crosses HBM between
encoder layers is int8 (half of bf16).

Calibration reuses the dynamic mode itself: every quantized layer sows
its running activation max-abs into a ``quant_stats`` collection (a
no-op unless the collection is marked mutable), so one forward pass over
representative inputs yields per-layer scales.  The scales ride the
model object as a hashable tuple attribute (``DeepIMFlowNet.act_scales``)
— NOT the checkpoint: parameters stay bit-identical to the plain model,
and the refine loop's ``static_argnames=("model",)`` jit caching keeps
working.

Reference mapping: the reference has no quantized path (MXNet fp32
throughout, SURVEY §2.5); this is a rebuild-only serving lever.
"""

from __future__ import annotations

from typing import Iterable

import jax

from deepim_tpu.config.config import QUANT_MODES  # noqa: F401 (re-export)
from deepim_tpu.models.flownet import DeepIMFlowNet

__all__ = ["CALIB_MODES", "calibrate_act_scales", "calibrate_model",
           "QUANT_MODES"]


#: Calibration estimators for the static activation scale.  "max" is
#: plain max-abs (no clipping, coarsest resolution); "p999" clips the
#: top 0.1% activation tail for 8-bit resolution on the body; the "_c"
#: variants measure per input channel and fold the scales into the
#: consuming layer's weights (flownet._int8_conv) — finer resolution
#: where channel dynamic ranges differ.  "max_c" is the DEFAULT
#: everywhere (cli.test --quant-calib, serve, calibrate_model): on the
#: occlusion protocol at n=2048 it measured -0.16 ADD vs bf16 (inside
#: noise) where max-abs lost -1.75, at the same folded-weight cost.
CALIB_MODES = ("max", "p999", "max_c", "p999_c")
_STAT_KEY = {"max": "amax", "p999": "p999",
             "max_c": "amax_c", "p999_c": "p999_c"}


def calibrate_act_scales(
    model: DeepIMFlowNet,
    variables,
    inputs: Iterable[jax.Array],
    mode: str = "max",
) -> tuple:
    """Measure per-layer activation statistics → static int8 scales.

    ``inputs`` iterates assembled network-input batches (the (B, H, W, C)
    tensors the refine loop feeds the CNN — build them with
    ``refine.build_network_inputs`` so calibration sees the true input
    distribution).  Returns a sorted, hashable tuple of
    ``(layer_name, scale)`` pairs for ``DeepIMFlowNet(act_scales=...)`` /
    ``model.clone(act_scales=...)``; per-channel modes yield tuple-valued
    scales.

    ``mode`` picks the estimator (see :data:`CALIB_MODES`); statistics
    aggregate across batches with an elementwise max, scale = stat / 127
    (symmetric, zero-point 0 — anything beyond the calibrated range
    saturates).
    """
    import numpy as np

    if mode not in CALIB_MODES:
        raise ValueError(f"mode={mode!r} not in {CALIB_MODES}")
    want = _STAT_KEY[mode]
    qm = model.clone(quant="int8", act_scales=())
    fwd = jax.jit(lambda v, x: qm.apply(v, x, pose_only=True,
                                        mutable=["quant_stats"])[1])
    stat: dict[str, np.ndarray] = {}
    n_batches = 0
    for x in inputs:
        n_batches += 1
        stats = jax.device_get(fwd(variables, x))["quant_stats"]
        flat = jax.tree_util.tree_flatten_with_path(stats)[0]
        for path, value in flat:
            # sow path: (<layer module name>, <stat name>)
            if path[-1].key != want:
                continue
            name = path[-2].key
            value = np.asarray(value, np.float64)
            stat[name] = (value if name not in stat
                          else np.maximum(stat[name], value))
    if n_batches == 0:
        raise ValueError("calibrate_act_scales needs >=1 input batch")

    def to_scale(v):
        s = np.where(v > 0, v, 1.0) / 127.0
        if s.ndim == 0:
            return float(s)
        return tuple(float(e) for e in s)

    return tuple(sorted((k, to_scale(v)) for k, v in stat.items()))


def calibrate_model(
    model: DeepIMFlowNet,
    variables,
    assets,
    batches: Iterable[dict],
    k_cam,
    out_size: tuple[int, int],
    renderer: str = "xla",
    num_iters: int = 4,
    mode: str = "max_c",
) -> DeepIMFlowNet:
    """``int8_static`` entry-point wiring: eval batches → calibrated model.

    ``batches`` iterates eval-style batch dicts (``obs_rgb``, ``pose_src``,
    ``class_idx`` [, ``obs_mask``, ``obs_depth``] — what ``cli.test``'s
    batch streams yield).  Each batch is walked through ``num_iters``
    refine iterations and the CNN input is measured at EVERY iteration —
    not just at the init pose.  Calibrating on iteration-1 inputs alone
    was measured catastrophically wrong on the flagship protocol (ADD
    95.5 → 70.8, one class 96 → 4): later iterations see sharply aligned
    obs/render pairs whose activations exceed the init-pose max-abs, and
    static scales CLIP anything beyond the calibrated range.  Walking the
    trajectory costs a few extra forward steps once, at calibration time.
    Parameters are untouched — the clone loads/serves the same checkpoint.
    """
    import jax.numpy as jnp

    from deepim_tpu.refine.refiner import (
        build_network_inputs, gather_class, refine_step,
    )

    def inputs():
        for b in batches:
            pose = jnp.asarray(b["pose_src"])
            cls = jnp.asarray(b["class_idx"])
            ks = jnp.tile(jnp.asarray(k_cam)[None], (pose.shape[0], 1, 1))
            obs = jnp.asarray(b["obs_rgb"])
            obs_mask = b.get("obs_mask")
            obs_mask = None if obs_mask is None else jnp.asarray(obs_mask)
            obs_depth = b.get("obs_depth")
            obs_depth = (None if obs_depth is None
                         else jnp.asarray(obs_depth))
            ab = gather_class(assets, cls)
            for it in range(num_iters):
                ni = build_network_inputs(
                    model, ab, obs, pose, ks, out_size, renderer,
                    obs_mask=obs_mask, obs_depth=obs_depth,
                )
                yield ni.x
                if it + 1 < num_iters:
                    pose = refine_step(
                        variables, model, ab, obs, pose, ks, cls,
                        out_size, renderer,
                        obs_mask=obs_mask, obs_depth=obs_depth,
                    ).pose
    scales = calibrate_act_scales(model, variables, inputs(), mode=mode)
    return model.clone(quant="int8", act_scales=scales)
