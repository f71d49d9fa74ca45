"""Video pose propagation: refine through a frame sequence (YCB-Video).

The reference evaluates YCB-Video per keyframe with PoseCNN inits; DeepIM's
video mode instead propagates: frame t's refined pose initializes frame
t+1 (cheaper + temporally consistent).  On TPU this is a ``lax.scan`` over
frames with the whole render→zoom→CNN→compose step inside — one compiled
program for the entire sequence (SURVEY.md §5: the video axis is a scan,
not sequence-parallelism).

Plain propagation loses the track permanently once an occluder (or a
motion spike) pushes the pose outside the refiner's basin — every later
frame inits from garbage.  ``recover_threshold`` arms per-frame
re-acquisition: the render-vs-observed agreement score
(:func:`~deepim_tpu.refine.hypotheses.score_poses`) acts as a tracking
confidence monitor, and when it collapses below the threshold the scan
step re-seeds from a batch of perturbed hypotheses around the current
estimate, refines each, and keeps the best-scoring one.  The extra
hypothesis work sits behind a batch-level ``lax.cond`` — frames with a
healthy track pay one score render and nothing else.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepim_tpu.refine.hypotheses import score_poses
from deepim_tpu.refine.refiner import RenderAssets, gather_class, refine_step


@partial(
    jax.jit,
    static_argnames=("model", "iters_first", "iters_rest", "out_size",
                     "renderer", "recover_threshold", "recover_hypotheses",
                     "recover_iters", "recover_rot_deg", "recover_trans"),
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
    recover_threshold: float | None = None,  # arm lost-track recovery
    recover_hypotheses: int = 4,
    recover_iters: int = 4,
    recover_rot_deg: float = 20.0,
    recover_trans: tuple = (0.04, 0.04, 0.04),
    recover_margin: float = 0.05,
    key: jax.Array | None = None,  # PRNG for recovery perturbations
):
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

    With ``recover_threshold`` set (a ``score_poses`` value; scores are
    ``-mean truncated |RGB diff|`` over visible foreground, so e.g. -0.12
    means "worse than a 0.12 mean diff"), the return value becomes
    ``(traj (T, B, 3, 4), scores (T, B))`` and lost tracks re-acquire via
    ``recover_hypotheses`` perturbed re-seeds (see module docstring).
    """
    assets_b = gather_class(assets, class_idx)
    b = init_pose.shape[0]
    shared_frames = frames.ndim == 4
    shared_depths = obs_depths is not None and obs_depths.ndim == 3

    def bcast_frame(frame):
        return jnp.broadcast_to(frame, (b, *frame.shape)) if shared_frames \
            else frame

    def bcast_depth(depth):
        if depth is not None and shared_depths:
            return jnp.broadcast_to(depth, (b, *depth.shape))
        return depth

    def refine_n(pose, frame, mask, depth, n):
        frame = bcast_frame(frame)
        depth = bcast_depth(depth)

        def one(p, _):
            outs = refine_step(variables, model, assets_b, frame, p, k,
                               class_idx, out_size, renderer,
                               obs_mask=mask, obs_depth=depth)
            return outs.pose, None

        pose, _ = jax.lax.scan(one, pose, None, length=n)
        return pose

    def score(pose, frame, depth):
        return score_poses(assets_b, bcast_frame(frame), pose, k, out_size,
                           renderer, obs_depth=bcast_depth(depth))

    def reacquire(pose, frame, mask, depth, sub):
        """Refine a fan of perturbed re-seeds, keep the best scorer."""
        from deepim_tpu.data.pairs import perturb_poses

        nh = recover_hypotheses
        pert = perturb_poses(
            sub, jnp.tile(pose, (nh - 1, 1, 1)),
            rot_std_deg=recover_rot_deg,
            rot_max_deg=3.0 * recover_rot_deg,
            trans_std=recover_trans,
            trans_max=tuple(3.0 * t for t in recover_trans),
        )
        cand = jnp.concatenate([pose, pert])  # (nh*B, 3, 4), hyp-major
        cls_h = jnp.tile(class_idx, (nh,))
        assets_h = gather_class(assets, cls_h)
        k_h = jnp.tile(k, (nh, 1, 1))
        frame_h = jnp.tile(bcast_frame(frame), (nh, 1, 1, 1))
        mask_h = None if mask is None else jnp.tile(mask, (nh, 1, 1))
        depth_b = bcast_depth(depth)
        depth_h = None if depth_b is None else jnp.tile(depth_b, (nh, 1, 1))

        def one(p, _):
            outs = refine_step(variables, model, assets_h, frame_h, p, k_h,
                               cls_h, out_size, renderer,
                               obs_mask=mask_h, obs_depth=depth_h)
            return outs.pose, None

        cand, _ = jax.lax.scan(one, cand, None, length=recover_iters)
        # Rank in the INCUMBENT's zoom frame: per-candidate frames bias
        # toward nearer-z re-seeds (see score_poses docstring).
        from deepim_tpu.ops.zoom import compute_zoom_box

        box = jax.vmap(
            lambda p, kk, c: compute_zoom_box(p, kk, c, out_size)
        )(pose, k, assets_b.corners)
        box_h = jax.tree.map(lambda v: jnp.tile(v, (nh,)), box)
        sc = score_poses(assets_h, frame_h, cand, k_h, out_size, renderer,
                         obs_depth=depth_h, box=box_h)
        sc = sc.reshape(nh, b)
        best = jnp.argmax(sc, axis=0)  # (B,)
        cand = cand.reshape(nh, b, 3, 4)
        pose_best = jnp.take_along_axis(
            cand, best[None, :, None, None], axis=0)[0]
        return pose_best, jnp.max(sc, axis=0)

    def monitor(pose, frame, mask, depth, sub):
        """Score the track; re-acquire collapsed objects (cond-gated)."""
        sc = score(pose, frame, depth)
        lost = sc < recover_threshold

        def do_recover(args):
            pose, sc = args
            pose_r, sc_r = reacquire(pose, frame, mask, depth, sub)
            # Margin hysteresis, same rationale as hypotheses.py
            # §refine_multi_hypothesis: a re-seed must win DECISIVELY,
            # not by score noise.  Without it, symmetry-equivalent
            # re-seeds (a z-symmetric torus at any spin renders
            # identically) tie with the incumbent and argmax scrambles
            # the propagated spin — measured as proj2d 96.9 → 68.8 on
            # occluded-tracking sequences while ADD-S was unaffected.  A
            # genuinely lost track loses by >> the margin, so real
            # recoveries keep firing.
            take = lost & (sc_r > sc + recover_margin)
            return (jnp.where(take[:, None, None], pose_r, pose),
                    jnp.where(take, sc_r, sc))

        return jax.lax.cond(jnp.any(lost), do_recover, lambda a: a,
                            (pose, sc))

    m0 = None if obs_masks is None else obs_masks[0]
    d0 = None if obs_depths is None else obs_depths[0]
    pose0 = refine_n(init_pose, frames[0], m0, d0, iters_first)

    if recover_threshold is None:
        # Plain propagation (original return contract, no score renders).
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

    if key is None:
        key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    pose0, score0 = monitor(pose0, frames[0], m0, d0, k0)

    xs = {"frame": frames[1:],
          "key": jax.random.split(key, frames.shape[0])[1:]}
    if obs_masks is not None:
        xs["mask"] = obs_masks[1:]
    if obs_depths is not None:
        xs["depth"] = obs_depths[1:]

    def step(pose, x):
        pose = refine_n(pose, x["frame"], x.get("mask"), x.get("depth"),
                        iters_rest)
        pose, sc = monitor(pose, x["frame"], x.get("mask"), x.get("depth"),
                           x["key"])
        return pose, (pose, sc)

    _, (rest, rest_sc) = jax.lax.scan(step, pose0, xs)
    traj = jnp.concatenate([pose0[None], rest], axis=0)
    scores = jnp.concatenate([score0[None], rest_sc], axis=0)
    return traj, scores
