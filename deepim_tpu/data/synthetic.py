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
from deepim_tpu.refine.refiner import (
    RenderAssets,
    gather_class,
    render_crops,
    render_scene,
)


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


def synthetic_occlusion_batch(
    key: jax.Array,
    assets: RenderAssets,
    batch_size: int,
    k: jax.Array,
    image_size: tuple[int, int],
    num_distractors: int = 2,
    rot_noise_deg: float = 15.0,
    rot_max_deg: float = 45.0,
    trans_noise: tuple = (0.01, 0.01, 0.05),
    trans_max: tuple = (0.03, 0.03, 0.15),
    z_range: tuple = (0.5, 1.4),
    renderer: str = "pallas",
) -> dict[str, Any]:
    """Occlusion training batch (Occluded-LINEMOD protocol, SURVEY.md §2.3).

    The observed frame is a multi-object scene: the target object at its GT
    pose plus ``num_distractors`` other objects at nearby poses, depth-
    tested against each other (reference: real occ-LM frames / multi-object
    synthetic scenes).  ``obs_mask`` is the target's *visible* mask — scene
    depth within tolerance of the target-only depth.
    """
    kc, kp, kn, kd, kdc, kb, kl = jax.random.split(key, 7)
    b = batch_size
    m = 1 + num_distractors
    class_idx = jax.random.randint(kc, (b,), 0, assets.num_classes)
    pose_tgt = sample_poses_in_frustum(kp, b, k, image_size, z_range)
    pose_src = perturb_poses(kn, pose_tgt, rot_noise_deg, rot_max_deg,
                             trans_noise, trans_max)

    # Distractors: other classes at jittered poses slightly in front/around.
    d_cls = jax.random.randint(kdc, (b, num_distractors), 0,
                               assets.num_classes)
    d_poses = jax.vmap(
        lambda kk, p: perturb_poses(
            kk, jnp.tile(p[None], (num_distractors, 1, 1)),
            rot_std_deg=60.0, rot_max_deg=180.0,
            trans_std=(0.06, 0.06, 0.08), trans_max=(0.15, 0.15, 0.2),
        )
    )(jax.random.split(kd, b), pose_tgt)

    scene_cls = jnp.concatenate([class_idx[:, None], d_cls], axis=1)
    scene_poses = jnp.concatenate([pose_tgt[:, None], d_poses], axis=1)
    valid = jnp.ones((b, m), bool)
    ks = jnp.tile(k[None], (b, 1, 1))

    interpret = renderer == "pallas_interpret"
    if renderer == "xla":
        # CPU/test path: render each object separately and depth-merge.
        rgbs, depths = [], []
        for j in range(m):
            ab = gather_class(assets, scene_cls[:, j])
            rgb_j, dep_j = render_crops(ab, scene_poses[:, j], ks,
                                        image_size, "xla")
            rgbs.append(rgb_j)
            depths.append(dep_j)
        rgbs = jnp.stack(rgbs)  # (M, B, H, W, 3)
        depths = jnp.stack(depths)
        big = jnp.where(depths > 0, depths, jnp.inf)
        best = jnp.argmin(big, axis=0)  # (B, H, W)
        hit = jnp.any(depths > 0, axis=0)
        scene_depth = jnp.where(hit, jnp.min(big, axis=0), 0.0)
        scene_rgb = jnp.take_along_axis(
            rgbs, best[None, ..., None].astype(jnp.int32), axis=0
        )[0]
        scene_rgb = jnp.where(hit[..., None], scene_rgb, 0.0)
    else:
        scene_rgb, scene_depth = render_scene(
            assets, scene_cls, scene_poses, valid, ks, image_size,
            lighting=random_lighting(kl), interpret=interpret,
        )

    # Target-only depth for the visibility mask.
    ab_t = gather_class(assets, class_idx)
    _, tgt_depth = render_crops(ab_t, pose_tgt, ks, image_size, renderer)
    visible = (tgt_depth > 0) & (scene_depth >= tgt_depth - 1e-4) & (
        jnp.abs(scene_depth - tgt_depth) < 5e-3
    )

    bg = jax.random.uniform(kb, scene_rgb.shape)
    obs_rgb = jnp.where((scene_depth > 0)[..., None], scene_rgb, bg)
    return {
        "obs_rgb": obs_rgb,
        "obs_depth": scene_depth,
        "obs_mask": visible,
        "pose_src": pose_src,
        "pose_tgt": pose_tgt,
        "k": ks,
        "class_idx": class_idx,
        "visible_frac": jnp.sum(visible, axis=(1, 2))
        / jnp.maximum(jnp.sum(tgt_depth > 0, axis=(1, 2)), 1),
    }
