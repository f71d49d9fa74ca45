"""Video pose propagation: refine through a frame sequence (YCB-Video).

The reference evaluates YCB-Video per keyframe with PoseCNN inits; DeepIM's
video mode instead propagates: frame t's refined pose initializes frame
t+1 (cheaper + temporally consistent).  On TPU this is a ``lax.scan`` over
frames with the whole render→zoom→CNN→compose step inside — one compiled
program for the entire sequence (SURVEY.md §5: the video axis is a scan,
not sequence-parallelism).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepim_tpu.refine.refiner import RenderAssets, gather_class, refine_step


@partial(
    jax.jit,
    static_argnames=("model", "iters_first", "iters_rest", "out_size",
                     "renderer"),
)
def refine_video(
    variables,
    model,
    assets: RenderAssets,
    frames: jax.Array,  # (T, B, H, W, 3) frames — or (T, H, W, 3) SHARED
    init_pose: jax.Array,  # (B, 3, 4) init for frame 0 (PoseCNN-style)
    k: jax.Array,  # (B, 3, 3)
    class_idx: jax.Array,  # (B,)
    iters_first: int = 4,
    iters_rest: int = 2,
    out_size: tuple[int, int] = (480, 640),
    renderer: str = "pallas",
    obs_masks: jax.Array | None = None,  # (T, B, H, W) for input_mask
    obs_depths: jax.Array | None = None,  # (T, B, H, W) — or (T, H, W)
) -> jax.Array:
    """Track B objects through T frames -> refined poses (T, B, 3, 4).

    ``iters_first`` refinement iterations on frame 0 (large init error),
    ``iters_rest`` on subsequent frames (small frame-to-frame motion) —
    the standard tracking budget split.  Models trained with
    ``input_mask``/``input_depth`` take per-frame observed masks/depths;
    without them refine_step falls back to the rendered channels (a
    train/test input mismatch that degrades such models).

    4-dim ``frames`` (and 3-dim ``obs_depths``) are one stream SHARED by
    all B tracked objects — broadcast per scan step instead of being
    materialized B-fold in HBM (every object of a scene sees the same
    camera frame; the B-fold copy is pure waste).  ``obs_masks`` are
    inherently per-object and stay (T, B, H, W).
    """
    assets_b = gather_class(assets, class_idx)
    b = init_pose.shape[0]
    shared_frames = frames.ndim == 4
    shared_depths = obs_depths is not None and obs_depths.ndim == 3

    def refine_n(pose, frame, mask, depth, n):
        if shared_frames:
            frame = jnp.broadcast_to(frame, (b, *frame.shape))
        if depth is not None and shared_depths:
            depth = jnp.broadcast_to(depth, (b, *depth.shape))

        def one(p, _):
            outs = refine_step(variables, model, assets_b, frame, p, k,
                               class_idx, out_size, renderer,
                               obs_mask=mask, obs_depth=depth)
            return outs.pose, None

        pose, _ = jax.lax.scan(one, pose, None, length=n)
        return pose

    m0 = None if obs_masks is None else obs_masks[0]
    d0 = None if obs_depths is None else obs_depths[0]
    pose0 = refine_n(init_pose, frames[0], m0, d0, iters_first)

    # Optional streams scan as a dict pytree with only the present keys.
    xs = {"frame": frames[1:]}
    if obs_masks is not None:
        xs["mask"] = obs_masks[1:]
    if obs_depths is not None:
        xs["depth"] = obs_depths[1:]

    def step(pose, x):
        pose = refine_n(pose, x["frame"], x.get("mask"), x.get("depth"),
                        iters_rest)
        return pose, pose

    _, rest = jax.lax.scan(step, pose0, xs)
    return jnp.concatenate([pose0[None], rest], axis=0)
