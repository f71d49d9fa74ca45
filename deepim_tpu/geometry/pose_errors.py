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


def adds_error(
    points: jax.Array,
    pose_est: jax.Array,
    pose_gt: jax.Array,
    point_block: int | None = None,
) -> jax.Array:
    """ADD-S: mean over GT points of distance to the nearest estimated point.

    Uses the matmul form of pairwise squared distances so the (N, N) block
    lands on the MXU.  ``point_block`` tiles the estimated-point axis so the
    live distance matrix is (..., N_gt, point_block) instead of the full
    (..., N_gt, N_est) — at the protocol's N≈3000 the full matrix is
    36 MB/sample, so a batched eval MUST tile (a 13k-sample LINEMOD eval
    would otherwise need ~470 GB).  ``point_block=None`` keeps the single
    full matrix (fine for one small batch).
    """
    p_est = transform_points(points, pose_est[..., :3], pose_est[..., 3])
    p_gt = transform_points(points, pose_gt[..., :3], pose_gt[..., 3])
    # Center on the GT centroid: the ‖a‖²+‖b‖²−2a·b form loses float32
    # precision when coordinate magnitude (camera z ≈ 1 m) dwarfs the
    # mm-scale distances we measure; centering removes the bulk offset.
    center = jnp.mean(p_gt, axis=-2, keepdims=True)
    p_est = p_est - center
    p_gt = p_gt - center
    sq_gt = jnp.sum(p_gt * p_gt, axis=-1)  # (..., N)
    n_est = p_est.shape[-2]

    def _min_d2_to_block(block):  # (..., blk, 3) -> (..., N_gt)
        sq_blk = jnp.sum(block * block, axis=-1)  # (..., blk)
        # HIGHEST precision: the default TPU matmul path drops to bf16
        # inputs, which is fine for the CNN but not for mm-scale geometry.
        cross = jnp.einsum(
            "...ni,...mi->...nm", p_gt, block,
            precision=jax.lax.Precision.HIGHEST,
        )  # (..., N_gt, blk)
        d2 = sq_gt[..., :, None] + sq_blk[..., None, :] - 2.0 * cross
        return jnp.min(jnp.maximum(d2, 0.0), axis=-1)

    if point_block is None or point_block >= n_est:
        min_d2 = _min_d2_to_block(p_est)
    else:
        # Pad the est points far away (1e3 m ≫ any object) so padding never
        # wins the nearest-point min, then scan a running min over blocks.
        nb = -(-n_est // point_block)
        pad = nb * point_block - n_est
        p_est_p = jnp.concatenate(
            [p_est, jnp.full(p_est.shape[:-2] + (pad, 3), 1e3, p_est.dtype)],
            axis=-2,
        )
        blocks = jnp.moveaxis(
            p_est_p.reshape(p_est.shape[:-2] + (nb, point_block, 3)), -3, 0
        )  # (nb, ..., blk, 3)
        min_d2 = jax.lax.scan(
            lambda carry, blk: (jnp.minimum(carry, _min_d2_to_block(blk)),
                                None),
            jnp.full(sq_gt.shape, jnp.inf, p_gt.dtype),
            blocks,
        )[0]
    return jnp.mean(jnp.sqrt(min_d2), axis=-1)


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
