"""Tests for SE(3) composition and the untangled delta-pose representation.

The critical identity (SURVEY.md §4): ``apply_delta ∘ calc_delta = id``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepim_tpu.geometry import (
    se3_mul,
    se3_inverse,
    se3_from_rt,
    transform_points,
    project_points,
    quat2mat,
    random_quat,
    calc_delta,
    apply_delta,
    DeltaPose,
)

K = jnp.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
    dtype=jnp.float32,
)  # LINEMOD intrinsics


def _rand_poses(n, seed=0, z_range=(0.4, 1.5)):
    key = jax.random.PRNGKey(seed)
    kq, kt, kz = jax.random.split(key, 3)
    r = quat2mat(random_quat(kq, (n,)))
    xy = jax.random.uniform(kt, (n, 2), minval=-0.2, maxval=0.2)
    z = jax.random.uniform(kz, (n, 1), minval=z_range[0], maxval=z_range[1])
    t = jnp.concatenate([xy, z], axis=-1)
    return se3_from_rt(r, t)


def test_se3_mul_inverse_identity():
    poses = _rand_poses(16)
    ident = se3_mul(poses, se3_inverse(poses))
    expected = np.tile(np.eye(3, 4, dtype=np.float32), (16, 1, 1))
    np.testing.assert_allclose(np.asarray(ident), expected, atol=1e-5)


def test_se3_mul_on_points():
    a, b = _rand_poses(1, 1)[0], _rand_poses(1, 2)[0]
    pts = jax.random.normal(jax.random.PRNGKey(3), (50, 3))
    ab = se3_mul(a, b)
    direct = transform_points(pts, ab[:, :3], ab[:, 3])
    chained = transform_points(
        transform_points(pts, b[:, :3], b[:, 3]), a[:, :3], a[:, 3]
    )
    np.testing.assert_allclose(np.asarray(direct), np.asarray(chained), atol=1e-5)


def test_project_points_center():
    # A point on the optical axis projects to the principal point.
    pts = jnp.array([[0.0, 0.0, 1.0]])
    uv = project_points(pts, K)
    np.testing.assert_allclose(np.asarray(uv[0]), [325.2611, 242.04899], atol=1e-4)


def test_delta_round_trip():
    src = _rand_poses(32, seed=10)
    tgt = _rand_poses(32, seed=11)
    delta = calc_delta(src, tgt, K)
    recovered = apply_delta(src, delta, K)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(tgt), atol=1e-4)


def test_zero_delta_is_identity():
    src = _rand_poses(8, seed=12)
    delta = DeltaPose(
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (8, 1)), trans=jnp.zeros((8, 3))
    )
    out = apply_delta(src, delta, K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-6)


def test_delta_rotation_preserves_translation():
    # A pure-rotation delta must leave t untouched (rotation about object
    # center — the core "untangled" property from the DeepIM paper).
    src = _rand_poses(8, seed=13)
    dq = random_quat(jax.random.PRNGKey(14), (8,))
    out = apply_delta(src, DeltaPose(quat=dq, trans=jnp.zeros((8, 3))), K)
    np.testing.assert_allclose(
        np.asarray(out[..., 3]), np.asarray(src[..., 3]), atol=1e-6
    )


def test_delta_vz_sign_convention():
    # vz = log(z_src/z_tgt): moving the object closer (z_tgt < z_src) => vz > 0.
    src = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 1.0]))
    tgt = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.5]))
    delta = calc_delta(src, tgt, K)
    assert float(delta.trans[2]) > 0
    np.testing.assert_allclose(float(delta.trans[2]), np.log(2.0), atol=1e-5)


def test_delta_vx_pixel_units():
    # Pure x-shift at z=1: vx should be fx * Δx (pixel motion of center).
    src = se3_from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 1.0]))
    tgt = se3_from_rt(jnp.eye(3), jnp.array([0.01, 0.0, 1.0]))
    delta = calc_delta(src, tgt, K)
    np.testing.assert_allclose(float(delta.trans[0]), 572.4114 * 0.01, rtol=1e-4)
    np.testing.assert_allclose(float(delta.trans[1]), 0.0, atol=1e-5)


def test_delta_jit_vmap():
    src = _rand_poses(4, seed=20)
    tgt = _rand_poses(4, seed=21)
    f = jax.jit(lambda s, t: apply_delta(s, calc_delta(s, t, K), K))
    np.testing.assert_allclose(np.asarray(f(src, tgt)), np.asarray(tgt), atol=1e-4)


def test_delta_round_trip_depth_extremes():
    """apply_delta ∘ calc_delta = id must hold at near/far depth extremes
    (vz = log-ratio: catastrophic if naively differenced) and for big
    src→tgt depth jumps."""
    src = _rand_poses(16, seed=20, z_range=(0.05, 0.08))   # very near
    tgt = _rand_poses(16, seed=21, z_range=(4.0, 8.0))     # very far
    for a, b in [(src, tgt), (tgt, src)]:
        rec = apply_delta(a, calc_delta(a, b, K), K)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_delta_round_trip_tiny_motion():
    """Sub-millimeter, sub-0.01° deltas survive the round trip in f32
    (refinement converges through vanishing deltas)."""
    src = _rand_poses(16, seed=22)
    nudge = jnp.concatenate(
        [jnp.zeros((16, 3, 3)), jnp.full((16, 3, 1), 2e-4)], axis=-1)
    tgt = src + nudge
    rec = apply_delta(src, calc_delta(src, tgt, K), K)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(tgt), atol=2e-5)
