"""Unit tests for rotation conversions: round-trips + closed-form checks.

Mirrors SURVEY.md §4's "do better cheaply" plan: SE(3) math vs closed form
and round-trip identities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepim_tpu.geometry import (
    quat_normalize,
    quat_mul,
    quat_conjugate,
    quat2mat,
    mat2quat,
    euler2mat,
    mat2euler,
    euler2quat,
    quat2euler,
    axangle2mat,
    axangle2quat,
    random_quat,
    rotation_angle,
)

RNG = np.random.RandomState(0)


def _rand_quats(n):
    return random_quat(jax.random.PRNGKey(0), (n,))


def test_quat2mat_identity():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat2mat(q), np.eye(3), atol=1e-6)


def test_quat2mat_closed_form_z90():
    # 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(quat2mat(q), expected, atol=1e-6)


def test_quat_mat_round_trip():
    q = _rand_quats(64)
    q2 = mat2quat(quat2mat(q))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_mat2quat_near_singular_traces():
    # 180° rotations about each axis exercise all four Shepperd branches.
    for axis in np.eye(3):
        m = axangle2mat(jnp.asarray(axis, jnp.float32), jnp.float32(np.pi))
        q = mat2quat(m)
        m2 = quat2mat(q)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_quat_mul_matches_matmul():
    q1, q2 = _rand_quats(2)
    m = quat2mat(quat_mul(q1, q2))
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(quat2mat(q1) @ quat2mat(q2)), atol=1e-5
    )


def test_quat_conjugate_is_inverse():
    q = _rand_quats(8)
    qq = quat_mul(q, quat_conjugate(q))
    expected = np.tile(np.array([1.0, 0, 0, 0]), (8, 1))
    np.testing.assert_allclose(np.asarray(qq), expected, atol=1e-5)


def test_euler_mat_round_trip():
    angles = RNG.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
    ax, ay, az = (jnp.asarray(angles[:, i]) for i in range(3))
    m = euler2mat(ax, ay, az)
    ax2, ay2, az2 = mat2euler(m)
    np.testing.assert_allclose(np.asarray(ax2), angles[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(ay2), angles[:, 1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(az2), angles[:, 2], atol=1e-4)


def test_euler_convention_sxyz():
    # R = Rz @ Ry @ Rx; check against explicit single-axis matrices.
    ax, ay, az = 0.3, -0.5, 0.9
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    m = euler2mat(jnp.float32(ax), jnp.float32(ay), jnp.float32(az))
    np.testing.assert_allclose(np.asarray(m), rz @ ry @ rx, atol=1e-6)


def test_euler_quat_round_trip():
    angles = RNG.uniform(-1.0, 1.0, size=(8, 3)).astype(np.float32)
    ax, ay, az = (jnp.asarray(angles[:, i]) for i in range(3))
    q = euler2quat(ax, ay, az)
    ax2, ay2, az2 = quat2euler(q)
    np.testing.assert_allclose(np.asarray(ax2), angles[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(az2), angles[:, 2], atol=1e-4)


def test_axangle_angle_recovered():
    angle = jnp.float32(0.7)
    m = axangle2mat(jnp.array([0.0, 1.0, 0.0]), angle)
    np.testing.assert_allclose(float(rotation_angle(m)), 0.7, atol=1e-5)


def test_rotation_matrices_orthonormal():
    q = _rand_quats(16)
    m = quat2mat(q)
    eye = np.tile(np.eye(3, dtype=np.float32), (16, 1, 1))
    np.testing.assert_allclose(
        np.asarray(m @ jnp.swapaxes(m, -1, -2)), eye, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), np.ones(16), atol=1e-5)


def test_vmap_and_jit_compatible():
    q = _rand_quats(8)
    out = jax.jit(jax.vmap(quat2mat))(q)
    assert out.shape == (8, 3, 3)


def test_euler_gimbal_lock_neighborhood():
    """ay -> ±π/2 (gimbal lock): euler2mat must stay orthonormal and the
    mat->euler->mat round trip must reproduce the MATRIX (angles are not
    unique at the singularity — the matrix is the invariant)."""
    eps = np.float32(1e-4)
    for ay in [np.pi / 2 - eps, np.pi / 2, np.pi / 2 + eps,
               -np.pi / 2, -np.pi / 2 + eps]:
        ax, az = np.float32(0.3), np.float32(-0.8)
        m = euler2mat(jnp.float32(ax), jnp.float32(ay), jnp.float32(az))
        eye = np.asarray(m) @ np.asarray(m).T
        np.testing.assert_allclose(eye, np.eye(3), atol=1e-5)
        a2 = mat2euler(m)
        m2 = euler2mat(*a2)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)


def test_quat_round_trip_fuzz_batched():
    """512 random rotations through quat->mat->quat under vmap+jit —
    quaternions equal up to sign (the verify-checklist batched probe)."""
    from deepim_tpu.geometry import mat2quat

    q = RNG.normal(size=(512, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rt = jax.jit(jax.vmap(lambda qq: mat2quat(quat2mat(qq))))
    q2 = np.asarray(rt(jnp.asarray(q)))
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
