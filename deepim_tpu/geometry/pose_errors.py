"""6D pose error metrics: ADD, ADD-S, rotation/translation error, Proj-2D, AUC.

These are the evaluation metrics used by the reference's per-dataset
``evaluate_pose`` methods (mx-DeepIM ``lib/dataset/LM6d_*.py`` /
``lib/pair_matching`` pose-error helpers) and by the DeepIM paper:

- **ADD**: mean L2 distance between model points under estimated vs GT pose.
- **ADD-S** (``adi``): for symmetric objects, mean distance from each
  GT-posed point to its *nearest* estimated-posed point.
- **(n°, n cm)**: geodesic rotation error (deg) and translation error.
- **Proj-2D**: mean reprojection pixel error of model points.
- **AUC**: area under the ADD(-S) accuracy-threshold curve (YCB-Video).

All metric kernels are jax-jittable; ADD-S uses an MXU-friendly pairwise
distance (‖a−b‖² = ‖a‖²+‖b‖²−2a·b) rather than a host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.rotations import rotation_angle
from deepim_tpu.geometry.se3 import transform_points, project_points


def add_error(points: jax.Array, pose_est: jax.Array, pose_gt: jax.Array) -> jax.Array:
    """ADD: mean ‖(R̂x+t̂) − (Rx+t)‖₂ over model points (..., N, 3) -> (...)."""
    p_est = transform_points(points, pose_est[..., :3], pose_est[..., 3])
    p_gt = transform_points(points, pose_gt[..., :3], pose_gt[..., 3])
    return jnp.mean(jnp.linalg.norm(p_est - p_gt, axis=-1), axis=-1)


def adds_error(points: jax.Array, pose_est: jax.Array, pose_gt: jax.Array) -> jax.Array:
    """ADD-S: mean over GT points of distance to the nearest estimated point.

    Uses the matmul form of pairwise squared distances so the (N, N) block
    lands on the MXU.  For the usual N≈3000 sampled points this is a single
    ~3000x3000 distance matrix per object.
    """
    p_est = transform_points(points, pose_est[..., :3], pose_est[..., 3])
    p_gt = transform_points(points, pose_gt[..., :3], pose_gt[..., 3])
    # Center on the GT centroid: the ‖a‖²+‖b‖²−2a·b form loses float32
    # precision when coordinate magnitude (camera z ≈ 1 m) dwarfs the
    # mm-scale distances we measure; centering removes the bulk offset.
    center = jnp.mean(p_gt, axis=-2, keepdims=True)
    p_est = p_est - center
    p_gt = p_gt - center
    sq_est = jnp.sum(p_est * p_est, axis=-1)  # (..., N)
    sq_gt = jnp.sum(p_gt * p_gt, axis=-1)  # (..., N)
    # HIGHEST precision: the default TPU matmul path drops to bf16 inputs,
    # which is fine for the CNN but not for mm-scale metric geometry.
    cross = jnp.einsum(
        "...ni,...mi->...nm", p_gt, p_est, precision=jax.lax.Precision.HIGHEST
    )  # (..., N_gt, N_est)
    d2 = sq_gt[..., :, None] + sq_est[..., None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=-1)), axis=-1)


def rot_error_deg(pose_est: jax.Array, pose_gt: jax.Array) -> jax.Array:
    """Geodesic rotation error in degrees."""
    r_rel = jnp.matmul(pose_est[..., :3], jnp.swapaxes(pose_gt[..., :3], -1, -2),
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.degrees(rotation_angle(r_rel))


def trans_error(pose_est: jax.Array, pose_gt: jax.Array) -> jax.Array:
    """Translation error ‖t̂ − t‖₂ (meters in LM6d convention)."""
    return jnp.linalg.norm(pose_est[..., 3] - pose_gt[..., 3], axis=-1)


def proj2d_error(
    points: jax.Array, pose_est: jax.Array, pose_gt: jax.Array, k: jax.Array
) -> jax.Array:
    """Mean 2D reprojection error (pixels) of model points."""
    p_est = transform_points(points, pose_est[..., :3], pose_est[..., 3])
    p_gt = transform_points(points, pose_gt[..., :3], pose_gt[..., 3])
    uv_est = project_points(p_est, k)
    uv_gt = project_points(p_gt, k)
    return jnp.mean(jnp.linalg.norm(uv_est - uv_gt, axis=-1), axis=-1)


def add_auc(errors: jax.Array, max_threshold: float = 0.1, steps: int = 1000) -> jax.Array:
    """Area under the accuracy-vs-threshold curve (YCB-Video protocol).

    ``errors``: per-sample ADD(-S) errors (meters).  Accuracy(τ) is the
    fraction of errors < τ for τ in (0, max_threshold]; AUC is the mean
    accuracy over a dense threshold grid, normalized to [0, 1].
    """
    thresholds = jnp.linspace(0.0, max_threshold, steps + 1)[1:]
    acc = jnp.mean((errors[..., None] < thresholds).astype(jnp.float32), axis=-2)
    return jnp.mean(acc, axis=-1)
