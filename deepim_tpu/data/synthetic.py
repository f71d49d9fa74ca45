"""Fully on-device synthetic training-pair generator.

The reference generates synthetic data *offline* on the host
(``toolkit/gen_syn``-style scripts: OpenGL render at randomized pose +
light, saved to disk, then loaded by ``TrainDataLoader``).  The TPU-native
rasterizer makes the online-only path feasible (SURVEY.md §3.4): a whole
training batch — GT pose, perturbed src pose, observed full-frame render
with randomized lighting and noise background — is synthesized inside jit,
so training needs **zero input pipeline** for the synthetic configs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.raster.raster_xla import Lighting
from deepim_tpu.refine.refiner import RenderAssets, gather_class, render_crops


def random_lighting(key: jax.Array) -> Lighting:
    """Randomized point+ambient light (reference render_py_light* variants)."""
    ka, kd, kdir = jax.random.split(key, 3)
    ambient = jax.random.uniform(ka, (), minval=0.4, maxval=0.9)
    diffuse = jax.random.uniform(kd, (), minval=0.2, maxval=0.8)
    d = jax.random.normal(kdir, (3,))
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-6)
    # Light from the camera hemisphere (−z points at the camera).
    d = d.at[2].set(-jnp.abs(d[2]) - 0.2)
    return Lighting(ambient=ambient, diffuse=diffuse, direction=d)


def synthetic_batch(
    key: jax.Array,
    assets: RenderAssets,
    batch_size: int,
    k: jax.Array,  # (3, 3) camera intrinsics (shared)
    image_size: tuple[int, int],
    rot_noise_deg: float = 15.0,
    rot_max_deg: float = 45.0,
    trans_noise: tuple = (0.01, 0.01, 0.05),
    trans_max: tuple = (0.03, 0.03, 0.15),
    z_range: tuple = (0.5, 1.4),
    renderer: str = "pallas",
    bg_noise: bool = True,
) -> dict[str, Any]:
    """One jit-safe training batch of render-and-compare pairs.

    Returns ``{obs_rgb, obs_depth, obs_mask, pose_src, pose_tgt, k,
    class_idx}`` — observed data is the *full camera frame* at the GT pose
    (the refine/train zoom crops it on the fly, same as for real images).
    """
    kc, kp, kn, kl, kb = jax.random.split(key, 5)
    b = batch_size
    class_idx = jax.random.randint(kc, (b,), 0, assets.num_classes)
    pose_tgt = sample_poses_in_frustum(kp, b, k, image_size, z_range)
    pose_src = perturb_poses(kn, pose_tgt, rot_noise_deg, rot_max_deg,
                             trans_noise, trans_max)

    assets_b = gather_class(assets, class_idx)
    ks = jnp.tile(k[None], (b, 1, 1))
    # One randomized light per batch (poses already randomize appearance;
    # reference render_py_light* randomizes per frame on the host).
    obs_rgb, obs_depth = render_crops(
        assets_b, pose_tgt, ks, image_size, renderer,
        lighting=random_lighting(kl),
    )

    obs_mask = obs_depth > 0
    if bg_noise:
        bg = jax.random.uniform(kb, obs_rgb.shape)
        obs_rgb = jnp.where(obs_mask[..., None], obs_rgb, bg)
    return {
        "obs_rgb": obs_rgb,
        "obs_depth": obs_depth,
        "obs_mask": obs_mask,
        "pose_src": pose_src,
        "pose_tgt": pose_tgt,
        "k": ks,
        "class_idx": class_idx,
    }
