"""Pose sampling and SE(3) perturbation for training-pair synthesis.

Rebuild of the reference's pair generation (``toolkit/gen_rendered``-style
scripts + ``lib/pair_matching/data_pair.py``): training pairs are (src =
perturbed pose, tgt = GT pose), with per-axis gaussian rotation noise and
gaussian translation noise, truncated at configured maxima.

Everything here is ``jax.random``-based and jit-safe so pairs can be
synthesized *inside* the training step — no host round-trips (the reference
does this offline on the host with numpy + OpenGL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.rotations import euler2mat
from deepim_tpu.geometry.se3 import se3_from_rt


def sample_poses_in_frustum(
    key: jax.Array,
    n: int,
    k: jax.Array,  # (3, 3) intrinsics
    image_size: tuple[int, int],
    z_range: tuple[float, float] = (0.5, 1.5),
    border_frac: float = 0.25,
) -> jax.Array:
    """Uniformly random GT poses visible in the camera -> (n, 3, 4).

    Rotation is uniform over SO(3); the object center projects inside the
    central (1 - 2*border_frac) region of the image at a depth uniform in
    ``z_range`` (keeps the zoom crop inside the frame, like the reference's
    synthetic-data generator keeps objects in view).
    """
    from deepim_tpu.geometry.rotations import quat2mat, random_quat

    kq, ku, kv, kz = jax.random.split(key, 4)
    h, w = image_size
    r = quat2mat(random_quat(kq, (n,)))
    z = jax.random.uniform(kz, (n,), minval=z_range[0], maxval=z_range[1])
    u = jax.random.uniform(ku, (n,), minval=border_frac * w,
                           maxval=(1 - border_frac) * w)
    v = jax.random.uniform(kv, (n,), minval=border_frac * h,
                           maxval=(1 - border_frac) * h)
    x = (u - k[0, 2]) / k[0, 0] * z
    y = (v - k[1, 2]) / k[1, 1] * z
    return se3_from_rt(r, jnp.stack([x, y, z], axis=-1))


def perturb_poses(
    key: jax.Array,
    poses: jax.Array,  # (n, 3, 4) GT poses
    rot_std_deg: float = 15.0,
    rot_max_deg: float = 45.0,
    trans_std: tuple[float, float, float] = (0.01, 0.01, 0.05),
    trans_max: tuple[float, float, float] = (0.03, 0.03, 0.15),
) -> jax.Array:
    """Noisy src poses from GT (reference training-pair perturbation).

    Per-axis gaussian euler angles (deg), clipped at ``rot_max_deg``,
    applied as ΔR·R about the object center (camera-frame left-multiply,
    translation kept); per-axis gaussian translation noise clipped at
    ``trans_max``.  Matches the reference's noise model (truncation instead
    of its rejection-resampling — same support, jit-friendly).
    """
    n = poses.shape[0]
    kr, kt = jax.random.split(key)
    ang = jax.random.normal(kr, (n, 3)) * jnp.radians(rot_std_deg)
    ang = jnp.clip(ang, -jnp.radians(rot_max_deg), jnp.radians(rot_max_deg))
    dr = euler2mat(ang[:, 0], ang[:, 1], ang[:, 2])
    dt = jax.random.normal(kt, (n, 3)) * jnp.asarray(trans_std)
    dt = jnp.clip(dt, -jnp.asarray(trans_max), jnp.asarray(trans_max))
    r = jnp.matmul(dr, poses[..., :3], precision=jax.lax.Precision.HIGHEST)
    t = poses[..., 3] + dt
    # Keep z positive (in front of the camera) after noise.
    t = t.at[..., 2].set(jnp.maximum(t[..., 2], 0.1))
    return se3_from_rt(r, t)
