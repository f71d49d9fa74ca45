"""Rigid-transform (SE(3)) helpers on (R, t) pairs and 3x4 pose matrices.

A "pose" throughout this framework is the camera-from-object transform
``X_cam = R @ X_obj + t`` stored either as a pair ``(R: (...,3,3),
t: (...,3))`` or packed as ``(..., 3, 4)``.

Parity target: ``lib/pair_matching/RT_transform.py §se3_mul §se3_inverse``
in mx-DeepIM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# All geometry matmuls are tiny (3x3); force f32 MXU passes — the default
# TPU precision is bf16-in, which costs ~1 mm of pose accuracy under vmap.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def se3_from_rt(r: jax.Array, t: jax.Array) -> jax.Array:
    """Pack (R (...,3,3), t (...,3)) into a (..., 3, 4) pose matrix."""
    return jnp.concatenate([r, t[..., None]], axis=-1)


def se3_mul(rt1: jax.Array, rt2: jax.Array) -> jax.Array:
    """Compose pose matrices: result maps X through rt2 then rt1.

    (..., 3, 4) x (..., 3, 4) -> (..., 3, 4):
    ``R = R1 @ R2``, ``t = R1 @ t2 + t1``.
    """
    r1, t1 = rt1[..., :3], rt1[..., 3]
    r2, t2 = rt2[..., :3], rt2[..., 3]
    r = _mm(r1, r2)
    t = jnp.einsum("...ij,...j->...i", r1, t2, precision=_HI) + t1
    return se3_from_rt(r, t)


def se3_inverse(rt: jax.Array) -> jax.Array:
    """Inverse pose: (..., 3, 4) -> (..., 3, 4)."""
    r, t = rt[..., :3], rt[..., 3]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", r_inv, t, precision=_HI)
    return se3_from_rt(r_inv, t_inv)


def transform_points(points: jax.Array, r: jax.Array, t: jax.Array) -> jax.Array:
    """Apply X -> R X + t to points (..., N, 3); R (..., 3, 3), t (..., 3)."""
    return jnp.einsum("...ij,...nj->...ni", r, points, precision=_HI) + t[..., None, :]


def project_points(points_cam: jax.Array, k: jax.Array) -> jax.Array:
    """Pinhole-project camera-frame points (..., N, 3) with K (..., 3, 3).

    Returns pixel coords (..., N, 2) as (u, v).  No distortion (the
    reference datasets use rectified intrinsics).
    """
    z = jnp.maximum(points_cam[..., 2:3], 1e-8)
    uvw = jnp.einsum("...ij,...nj->...ni", k, points_cam / z, precision=_HI)
    return uvw[..., :2]
