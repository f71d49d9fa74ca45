"""The DeepIM "untangled" delta-pose parameterization.

The network predicts a relative pose update that is *untangled* from the
absolute object pose and from the camera intrinsics scale:

- **Rotation**: a quaternion ``Δq`` applied about the *object center* in the
  camera frame: ``R_tgt = ΔR @ R_src`` with translation unaffected by the
  rotation (rotating about the object center, not the camera origin).
- **Translation**: image-relative offsets
  ``vx = fx * (x_t/z_t − x_s/z_s)``, ``vy = fy * (y_t/z_t − y_s/z_s)``
  (pixel motion of the object center on the image plane) and a log-scale
  depth change ``vz = log(z_s / z_t)`` (positive vz moves the object closer).

``calc_delta`` (training-target construction) and ``apply_delta`` (test-time
composition) are exact inverses:  ``apply_delta(src, calc_delta(src, tgt))
== tgt``.

Parity target: ``lib/pair_matching/RT_transform.py §calc_RT_delta
§RT_transform`` in mx-DeepIM; representation from the DeepIM paper §3.2
(ECCV 2018).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.rotations import quat2mat, mat2quat
from deepim_tpu.geometry.se3 import se3_from_rt, _mm


class DeltaPose(NamedTuple):
    """Untangled relative pose: quat (..., 4) + image-relative trans (..., 3)."""

    quat: jax.Array  # (..., 4) (w, x, y, z), ΔR about object center
    trans: jax.Array  # (..., 3) (vx, vy, vz)


def calc_delta(pose_src: jax.Array, pose_tgt: jax.Array, k: jax.Array) -> DeltaPose:
    """Untangled delta taking ``pose_src`` to ``pose_tgt``; poses (..., 3, 4).

    ``k`` is the (..., 3, 3) camera intrinsics used to express vx/vy in
    pixel units (so the CNN's prediction is resolution-equivariant).
    """
    r_src, t_src = pose_src[..., :3], pose_src[..., 3]
    r_tgt, t_tgt = pose_tgt[..., :3], pose_tgt[..., 3]

    r_delta = _mm(r_tgt, jnp.swapaxes(r_src, -1, -2))
    quat = mat2quat(r_delta)

    fx = k[..., 0, 0]
    fy = k[..., 1, 1]
    zs = t_src[..., 2]
    zt = t_tgt[..., 2]
    vx = fx * (t_tgt[..., 0] / zt - t_src[..., 0] / zs)
    vy = fy * (t_tgt[..., 1] / zt - t_src[..., 1] / zs)
    vz = jnp.log(zs / zt)
    return DeltaPose(quat=quat, trans=jnp.stack([vx, vy, vz], axis=-1))


def apply_delta(pose_src: jax.Array, delta: DeltaPose, k: jax.Array) -> jax.Array:
    """Compose an untangled delta onto ``pose_src``; the refine-loop update.

    Inverse of :func:`calc_delta`.  All ops are elementwise/small-matmul and
    jit/vmap-safe, so this runs inside the on-device refinement loop.
    """
    r_src, t_src = pose_src[..., :3], pose_src[..., 3]
    r_delta = quat2mat(delta.quat)
    r_tgt = _mm(r_delta, r_src)

    fx = k[..., 0, 0]
    fy = k[..., 1, 1]
    vx, vy, vz = delta.trans[..., 0], delta.trans[..., 1], delta.trans[..., 2]
    zs = t_src[..., 2]
    zt = zs * jnp.exp(-vz)
    xt = (vx / fx + t_src[..., 0] / zs) * zt
    yt = (vy / fy + t_src[..., 1] / zs) * zt
    return se3_from_rt(r_tgt, jnp.stack([xt, yt, zt], axis=-1))
