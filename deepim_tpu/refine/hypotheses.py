"""Multi-hypothesis refinement: refine N inits per image, keep the best.

The occluded-LINEMOD configuration of the north star (BASELINE.json
config[2]): under heavy occlusion a single init often locks onto the wrong
local minimum; refining several perturbed hypotheses in one batched pass
and scoring them by render-vs-observed agreement is the TPU-native answer
(hypotheses are the scaling axis — SURVEY.md §2.7 — so N× hypotheses is
just a larger raster/CNN batch, not N× host loops).

Scoring: negative mean absolute RGB difference over the rendered
foreground of the final pose's zoom crop — cheap, fully on-device, and
robust to background clutter (only object pixels count).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepim_tpu.data.pairs import perturb_poses
from deepim_tpu.ops.zoom import (
    compute_zoom_box, zoom_image_batch, zoom_intrinsics,
)
from deepim_tpu.refine.refiner import (
    RenderAssets,
    gather_class,
    refine_poses,
    render_crops,
)


def score_poses(
    assets_b: RenderAssets,  # batch-gathered
    obs_rgb: jax.Array,  # (N, H, W, 3) full frames
    poses: jax.Array,  # (N, 3, 4)
    k: jax.Array,  # (N, 3, 3)
    out_size: tuple[int, int],
    renderer: str = "pallas",
) -> jax.Array:
    """Render-vs-observed agreement score per pose -> (N,) (higher=better)."""
    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, out_size)
    )(poses, k, assets_b.corners)
    kz = zoom_intrinsics(k, box)
    ren_rgb, ren_depth = render_crops(assets_b, poses, kz, out_size, renderer)
    obs_crop = zoom_image_batch(obs_rgb, box, out_size,
                                precision=jax.lax.Precision.DEFAULT)
    fg = (ren_depth > 0).astype(jnp.float32)
    diff = jnp.mean(jnp.abs(obs_crop - ren_rgb), axis=-1) * fg
    fg_count = jnp.sum(fg, axis=(1, 2))
    score = -jnp.sum(diff, axis=(1, 2)) / jnp.maximum(fg_count, 1.0)
    # A pose that renders NO foreground (diverged past the near plane /
    # out of frame) would otherwise score a perfect 0.0 and beat every
    # valid hypothesis at the argmax; it must lose to any visible one.
    return jnp.where(fg_count > 0, score, -jnp.inf)


@partial(
    jax.jit,
    static_argnames=("model", "num_hypotheses", "num_iters", "out_size",
                     "renderer"),
)
def refine_multi_hypothesis(
    variables,
    model,
    assets: RenderAssets,
    obs_rgb: jax.Array,  # (B, H, W, 3)
    init_pose: jax.Array,  # (B, 3, 4) base init (e.g. detector output)
    k: jax.Array,  # (B, 3, 3)
    class_idx: jax.Array,  # (B,)
    key: jax.Array,  # hypothesis-perturbation randomness
    num_hypotheses: int = 4,
    num_iters: int = 4,
    out_size: tuple[int, int] = (480, 640),
    renderer: str = "pallas",
    hyp_rot_deg: float = 20.0,
    hyp_trans: tuple = (0.02, 0.02, 0.08),
    obs_mask: jax.Array | None = None,  # (B, H, W) for input_mask models
    obs_depth: jax.Array | None = None,  # (B, H, W) for input_depth models
) -> tuple[jax.Array, jax.Array]:
    """Refine ``num_hypotheses`` perturbations of each init, keep the best.

    Hypothesis 0 is the unperturbed init.  Returns (best poses (B, 3, 4),
    scores (B, num_hypotheses)).
    """
    b = init_pose.shape[0]
    nh = num_hypotheses
    reps = jnp.tile(init_pose, (nh, 1, 1))  # (nh*B, 3, 4), hyp-major
    noise = perturb_poses(
        key, reps, rot_std_deg=hyp_rot_deg, rot_max_deg=3 * hyp_rot_deg,
        trans_std=hyp_trans, trans_max=tuple(3 * t for t in hyp_trans),
    )
    hyps = jnp.where(
        (jnp.arange(nh * b) < b)[:, None, None], reps, noise
    )  # keep hypothesis 0 exact

    obs_r = jnp.tile(obs_rgb, (nh, 1, 1, 1))
    k_r = jnp.tile(k, (nh, 1, 1))
    cls_r = jnp.tile(class_idx, (nh,))

    refined = refine_poses(
        variables, model, assets, obs_r, hyps, k_r, cls_r,
        num_iters=num_iters, out_size=out_size, renderer=renderer,
        obs_mask=None if obs_mask is None else jnp.tile(obs_mask, (nh, 1, 1)),
        obs_depth=(None if obs_depth is None
                   else jnp.tile(obs_depth, (nh, 1, 1))),
    )
    ab = gather_class(assets, cls_r)
    scores = score_poses(ab, obs_r, refined, k_r, out_size, renderer)

    refined = refined.reshape(nh, b, 3, 4)
    scores = scores.reshape(nh, b)
    best = jnp.argmax(scores, axis=0)  # (B,)
    best_pose = jnp.take_along_axis(
        refined, best[None, :, None, None].astype(jnp.int32), axis=0
    )[0]
    return best_pose, scores.T
