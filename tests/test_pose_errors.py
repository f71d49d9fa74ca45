"""Tests for ADD/ADD-S/rot/trans/proj2d/AUC metrics vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from deepim_tpu.geometry import (
    add_error,
    adds_error,
    rot_error_deg,
    trans_error,
    proj2d_error,
    add_auc,
    se3_from_rt,
    axangle2mat,
)

K = jnp.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]], jnp.float32)


def _pose(r=None, t=(0.0, 0.0, 1.0)):
    r = jnp.eye(3) if r is None else r
    return se3_from_rt(r, jnp.asarray(t, jnp.float32))


def test_add_zero_for_identical_poses():
    pts = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 0.05
    p = _pose()
    assert float(add_error(pts, p, p)) == 0.0


def test_add_pure_translation():
    pts = jax.random.normal(jax.random.PRNGKey(0), (100, 3)) * 0.05
    p1, p2 = _pose(), _pose(t=(0.003, 0.004, 1.0))
    np.testing.assert_allclose(float(add_error(pts, p1, p2)), 0.005, rtol=1e-4)


def test_adds_leq_add():
    pts = jax.random.normal(jax.random.PRNGKey(1), (200, 3)) * 0.05
    p1 = _pose(axangle2mat(jnp.array([0.0, 0, 1]), jnp.float32(0.3)))
    p2 = _pose(t=(0.01, 0.0, 1.0))
    assert float(adds_error(pts, p1, p2)) <= float(add_error(pts, p1, p2)) + 1e-6


def test_adds_symmetric_object_invariance():
    # Points symmetric under 180° about z: ADD-S of the rotated pose ~ 0.
    base = jax.random.normal(jax.random.PRNGKey(2), (128, 3)) * 0.05
    pts = jnp.concatenate([base, base * jnp.array([-1.0, -1.0, 1.0])])
    rot180 = axangle2mat(jnp.array([0.0, 0, 1]), jnp.float32(np.pi))
    p1, p2 = _pose(), _pose(rot180)
    assert float(adds_error(pts, p1, p2)) < 1e-3
    assert float(add_error(pts, p1, p2)) > 0.01  # ADD is NOT invariant


def test_adds_matches_numpy_oracle():
    pts = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 0.05
    p1 = _pose(axangle2mat(jnp.array([1.0, 2, 3]), jnp.float32(0.2)), (0.01, 0, 1.0))
    p2 = _pose()
    a = np.asarray(pts) @ np.asarray(p1[:, :3]).T + np.asarray(p1[:, 3])
    b = np.asarray(pts) @ np.asarray(p2[:, :3]).T + np.asarray(p2[:, 3])
    d = np.linalg.norm(b[:, None, :] - a[None, :, :], axis=-1)
    oracle = d.min(axis=1).mean()
    np.testing.assert_allclose(float(adds_error(pts, p1, p2)), oracle, rtol=1e-4)


def test_adds_point_block_matches_full():
    """Tiled ADD-S (bounded-memory eval path) == the full (N, N) matrix,
    including when the block size does not divide the point count."""
    pts = jax.random.normal(jax.random.PRNGKey(5), (4, 97, 3)) * 0.05
    p1 = jnp.stack([
        _pose(axangle2mat(jnp.array([1.0, 2, 3]), jnp.float32(0.1 * i)),
              (0.01 * i, 0, 1.0))
        for i in range(4)
    ])
    p2 = jnp.stack([_pose() for _ in range(4)])
    full = np.asarray(adds_error(pts, p1, p2))
    for blk in (16, 32, 97, 128):
        tiled = np.asarray(adds_error(pts, p1, p2, point_block=blk))
        # atol covers f32 noise near zero (i=0 is the identical-pose pair)
        np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=2e-6)


def test_rot_trans_errors():
    r = axangle2mat(jnp.array([0.0, 1, 0]), jnp.float32(np.radians(10)))
    p_est, p_gt = _pose(r, (0.0, 0.0, 1.05)), _pose()
    np.testing.assert_allclose(float(rot_error_deg(p_est, p_gt)), 10.0, rtol=1e-3)
    np.testing.assert_allclose(float(trans_error(p_est, p_gt)), 0.05, rtol=1e-4)


def test_proj2d_zero_same_pose():
    pts = jax.random.normal(jax.random.PRNGKey(4), (32, 3)) * 0.05
    p = _pose()
    assert float(proj2d_error(pts, p, p, K)) < 1e-4


def test_auc_extremes():
    assert float(add_auc(jnp.zeros(10))) > 0.99
    assert float(add_auc(jnp.full((10,), 10.0))) == 0.0
    # Half perfect, half terrible → AUC ≈ 0.5
    errs = jnp.concatenate([jnp.zeros(5), jnp.full((5,), 10.0)])
    np.testing.assert_allclose(float(add_auc(errs)), 0.5, atol=0.01)
