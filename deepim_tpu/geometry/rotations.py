"""Rotation parameterizations: quaternion / matrix / euler / axis-angle.

Conventions (matching the reference's use of ``transforms3d``):

- Quaternions are ``(w, x, y, z)``, scalar-first, unit-norm.
- Euler angles use the static ``sxyz`` convention (rotating frame about
  fixed axes x, then y, then z):  ``R = Rz(az) @ Ry(ay) @ Rx(ax)``.
- All inputs/outputs are ``float32`` jax arrays; every function maps over
  trailing dims only so it composes with ``jax.vmap``.

Parity target: ``lib/pair_matching/RT_transform.py §euler2quat §quat2mat
§mat2euler §euler2mat`` in mx-DeepIM (which delegates to ``transforms3d``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit norm; (..., 4) -> (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quats); (..., 4) -> (..., 4)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2; rotation composition R(q1) @ R(q2)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat2mat(q: jax.Array) -> jax.Array:
    """Unit quaternion(s) (..., 4) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat2quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd's method: compute all four candidate solutions and
    select by the largest diagonal combination (jit/vmap safe, no data-
    dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*component².
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    idx = jnp.argmax(scores, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def euler2mat(ax: jax.Array, ay: jax.Array, az: jax.Array) -> jax.Array:
    """Static-sxyz euler angles (radians) -> (..., 3, 3): Rz @ Ry @ Rx."""
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    m = jnp.stack(
        [
            cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz,
            cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz,
            -sy, sx * cy, cx * cy,
        ],
        axis=-1,
    )
    return m.reshape(jnp.shape(ax) + (3, 3))


def mat2euler(m: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(..., 3, 3) -> (ax, ay, az) static-sxyz euler angles (radians).

    Gimbal-safe via clipping; at |cy| ~ 0 falls back to ax-carrying solution
    with jnp.where (branch-free).
    """
    cy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    safe = cy > 1e-6
    ax = jnp.where(safe, jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
                   jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]))
    ay = jnp.arctan2(-m[..., 2, 0], cy)
    az = jnp.where(safe, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]), 0.0)
    return ax, ay, az


def euler2quat(ax: jax.Array, ay: jax.Array, az: jax.Array) -> jax.Array:
    """Static-sxyz euler -> quaternion (w, x, y, z)."""
    return mat2quat(euler2mat(ax, ay, az))


def quat2euler(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quaternion -> static-sxyz euler angles."""
    return mat2euler(quat2mat(q))


def axangle2quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis (..., 3) (need not be unit) + angle (...,) -> quaternion."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def axangle2mat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix."""
    return quat2mat(axangle2quat(axis, angle))


def random_quat(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random unit quaternion(s) with w >= 0 (shape + (4,))."""
    q = jax.random.normal(key, shape + (4,), dtype=jnp.float32)
    q = quat_normalize(q)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation between unit quats; t in [0, 1] (...,).

    Shortest-path (sign-corrected); falls back to lerp for nearly-parallel
    quats (branch-free).  Used by the video-trajectory generator.
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    safe = sin_theta > 1e-5
    t = t[..., None] if jnp.ndim(t) < jnp.ndim(dot) else t
    w0 = jnp.where(safe, jnp.sin((1 - t) * theta) / jnp.maximum(sin_theta, 1e-9),
                   1 - t)
    w1 = jnp.where(safe, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-9), t)
    return quat_normalize(w0 * q0 + w1 * q1)


def rotation_angle(m: jax.Array) -> jax.Array:
    """Geodesic rotation angle (radians) of rotation matrix(es) (..., 3, 3)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
