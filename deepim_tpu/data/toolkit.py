"""Dataset preparation tools: generate an on-disk LM6d-layout dataset.

Rebuild of the reference's ``toolkit/`` prep scripts (``gen_observed`` /
``gen_rendered`` / synthetic-data generation): where the reference drives
OpenGL on the host to pre-render observed frames and perturbed pairs, this
uses the framework's own rasterizer — the same renderer the refine loop
trusts — and writes the LM6d_converted-style layout that
:class:`deepim_tpu.data.lm6d.LM6DDataset` reads.

Primarily used to materialize synthetic benchmark/test datasets in the
sandbox (no LINEMOD/YCB assets available) and as the template for
converting real datasets.
"""

from __future__ import annotations

import numpy as np

from deepim_tpu.data.lm6d import LM6DDataset
from deepim_tpu.raster.mesh import PROCEDURAL_MESHES, Mesh


def gen_observed(
    root: str,
    meshes: dict[str, Mesh],
    k: np.ndarray,  # (3, 3)
    image_size: tuple[int, int],
    frames_per_obj: int = 20,
    split_fracs: dict[str, float] | None = None,
    seed: int = 0,
    z_range: tuple[float, float] = (0.5, 1.4),
    init_noise: tuple[float, float] = (15.0, 0.05),  # (deg std, m std)
) -> LM6DDataset:
    """Render GT-pose frames per object and write the full layout.

    Also writes perturbed init poses (``init_poses/``) standing in for the
    reference's imported PoseCNN results, so test-time refinement has a
    realistic noisy starting point.
    """
    import jax
    import jax.numpy as jnp

    from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
    from deepim_tpu.refine import build_assets, gather_class
    from deepim_tpu.refine.refiner import render_crops

    split_fracs = split_fracs or {"train": 0.7, "test": 0.3}
    objects = list(meshes)
    ds = LM6DDataset(root, objects)
    assets = build_assets([meshes[o] for o in objects], num_points=256)
    kj = jnp.asarray(k, jnp.float32)

    for ci, obj in enumerate(objects):
        ds.write_model(obj, meshes[obj])
        key = jax.random.PRNGKey(seed + ci)
        kp, kn = jax.random.split(key)
        poses = sample_poses_in_frustum(kp, frames_per_obj, kj, image_size,
                                        z_range)
        inits = perturb_poses(
            kn, poses, rot_std_deg=init_noise[0], rot_max_deg=45.0,
            trans_std=(init_noise[1],) * 3, trans_max=(0.1, 0.1, 0.2),
        )
        cls = jnp.full((frames_per_obj,), ci, jnp.int32)
        ab = gather_class(assets, cls)
        ks = jnp.tile(kj[None], (frames_per_obj, 1, 1))
        rgb, depth = render_crops(ab, poses, ks, image_size, renderer="xla")
        rgb, depth = np.asarray(rgb), np.asarray(depth)
        poses_np, inits_np = np.asarray(poses), np.asarray(inits)

        scene = f"{ci:02d}"
        frames = []
        for fi in range(frames_per_obj):
            frame = f"{fi:06d}"
            label = np.where(depth[fi] > 0, ci + 1, 0).astype(np.uint8)
            ds.write_frame(scene, frame, rgb[fi], depth[fi], label,
                           {obj: poses_np[fi]})
            frames.append((scene, frame))

        # splits + init poses per split
        start = 0
        rng = np.random.RandomState(seed)
        order = rng.permutation(frames_per_obj)
        for split, frac in split_fracs.items():
            cnt = max(1, int(round(frac * frames_per_obj)))
            idx = order[start : start + cnt]
            start += cnt
            ds.write_image_set(obj, split, [frames[i] for i in idx])
            ds.write_init_poses(obj, split, inits_np[idx])
    return ds


def gen_rendered(
    ds: LM6DDataset,
    meshes: dict[str, Mesh],
    k: np.ndarray,  # (3, 3)
    image_size: tuple[int, int],
    split: str = "train",
    per_frame: int = 1,
    noise: tuple[float, float] = (15.0, 0.05),  # (deg std, m std)
    seed: int = 0,
) -> int:
    """Pre-render perturbed-pose views for every frame of ``split`` and
    write them under ``data/rendered/<obj>/<scene>/<frame>_<i>-*``.

    Rebuild of the reference's ``gen_rendered``-style prep (sample poses
    around GT per cfg noise, render, store image+depth+pose).  The online
    training path supersedes this on TPU — pairs are re-rendered in-graph
    every step, so each epoch sees fresh perturbations — but the on-disk
    form remains useful for inspection, external tooling, and parity with
    the reference's data layout.  Returns the number of renders written.
    """
    import jax
    import jax.numpy as jnp

    from deepim_tpu.data.pairs import perturb_poses
    from deepim_tpu.refine import build_assets, gather_class
    from deepim_tpu.refine.refiner import render_crops

    objects = list(meshes)
    assets = build_assets([meshes[o] for o in objects], num_points=256)
    kj = jnp.asarray(k, jnp.float32)
    written = 0
    for ci, obj in enumerate(objects):
        recs = ds.gt_roidb(obj, split)
        if not recs:
            continue
        gt = jnp.asarray(np.stack([r.pose for r in recs]))
        for i in range(per_frame):
            key = jax.random.PRNGKey(seed * 1000003 + ci * 1009 + i)
            src = perturb_poses(
                key, gt, rot_std_deg=noise[0], rot_max_deg=45.0,
                trans_std=(noise[1],) * 3, trans_max=(0.1, 0.1, 0.2),
            )
            cls = jnp.full((len(recs),), ci, jnp.int32)
            ab = gather_class(assets, cls)
            ks = jnp.tile(kj[None], (len(recs), 1, 1))
            rgb, depth = render_crops(ab, src, ks, image_size,
                                      renderer="xla")
            rgb, depth = np.asarray(rgb), np.asarray(depth)
            src_np = np.asarray(src)
            for fi, rec in enumerate(recs):
                ds.write_rendered(obj, rec.scene, rec.frame, i,
                                  rgb[fi], depth[fi], src_np[fi])
                written += 1
    return written


def gen_procedural_dataset(root: str, objects: list[str], k: np.ndarray,
                           image_size: tuple[int, int],
                           frames_per_obj: int = 20, seed: int = 0
                           ) -> LM6DDataset:
    """Sandbox stand-in for LINEMOD: procedural meshes through gen_observed."""
    meshes = {name: PROCEDURAL_MESHES[name]() for name in objects}
    return gen_observed(root, meshes, k, image_size, frames_per_obj,
                        seed=seed)
