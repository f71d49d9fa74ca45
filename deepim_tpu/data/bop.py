"""BOP-format dataset converter -> the framework's LM6d layout.

The reference's ``toolkit/`` converts the original LINEMOD/Occ-LM/YCB
releases into its ``LM6d_converted`` layout.  Today those datasets ship in
the BOP challenge format, so the practical equivalent is a BOP -> LM6d
converter:

    {bop_root}/{split}/{scene:06d}/
        rgb/{im:06d}.png
        depth/{im:06d}.png              # uint16 * depth_scale = mm
        scene_gt.json                   # per-image list of
                                        #   {cam_R_m2c, cam_t_m2c(mm), obj_id}
        scene_camera.json               # {cam_K, depth_scale}
        mask_visib/{im:06d}_{i:06d}.png # optional visible masks
    {bop_root}/models/obj_{id:06d}.ply  # mm units

Output: the layout :class:`deepim_tpu.data.lm6d.LM6DDataset` reads
(meters, per-object pose txt, image sets).
"""

from __future__ import annotations

import json
import os

import numpy as np

from deepim_tpu.data.lm6d import LM6DDataset

MM_TO_M = 1e-3


def convert_bop_split(
    bop_root: str,
    split: str,
    out_root: str,
    obj_names: dict[int, str],
    out_split: str = "test",
    max_images_per_scene: int | None = None,
) -> LM6DDataset:
    """Convert one BOP split into the LM6d layout.

    ``obj_names``: BOP ``obj_id`` -> object name (defines the class order
    via sorted obj_id).  Scenes become LM6d 'scene' dirs; meshes are
    converted from mm to meters.
    """
    from PIL import Image

    from deepim_tpu.raster.mesh import Mesh, load_ply

    names = [obj_names[k] for k in sorted(obj_names)]
    ids = {obj_names[k]: k for k in obj_names}
    ds = LM6DDataset(out_root, names)

    # models (mm -> m)
    for name in names:
        ply = os.path.join(bop_root, "models", f"obj_{ids[name]:06d}.ply")
        mesh = load_ply(ply)
        mesh_m = Mesh(mesh.vertices * MM_TO_M, mesh.faces, mesh.colors,
                      mesh.normals)
        ds.write_model(name, mesh_m)

    split_dir = os.path.join(bop_root, split)
    frames_per_obj: dict[str, list] = {n: [] for n in names}
    for scene in sorted(os.listdir(split_dir)):
        sdir = os.path.join(split_dir, scene)
        with open(os.path.join(sdir, "scene_gt.json")) as f:
            scene_gt = json.load(f)
        with open(os.path.join(sdir, "scene_camera.json")) as f:
            scene_cam = json.load(f)
        im_ids = sorted(scene_gt, key=int)
        if max_images_per_scene:
            im_ids = im_ids[:max_images_per_scene]
        for im_id in im_ids:
            frame = f"{int(im_id):06d}"
            rgb = np.asarray(
                Image.open(os.path.join(sdir, "rgb", f"{frame}.png")),
                np.float32,
            ) / 255.0
            depth_scale = scene_cam[im_id].get("depth_scale", 1.0)
            depth_path = os.path.join(sdir, "depth", f"{frame}.png")
            if os.path.exists(depth_path):
                depth = np.asarray(Image.open(depth_path), np.float32)
                depth = depth * depth_scale * MM_TO_M
            else:
                depth = np.zeros(rgb.shape[:2], np.float32)

            poses = {}
            label = np.zeros(rgb.shape[:2], np.uint8)
            for gt_idx, gt in enumerate(scene_gt[im_id]):
                oid = int(gt["obj_id"])
                if oid not in obj_names:
                    continue
                name = obj_names[oid]
                r = np.asarray(gt["cam_R_m2c"], np.float32).reshape(3, 3)
                t = np.asarray(gt["cam_t_m2c"], np.float32) * MM_TO_M
                poses[name] = np.concatenate([r, t[:, None]], axis=1)
                mask_path = os.path.join(
                    sdir, "mask_visib", f"{frame}_{gt_idx:06d}.png"
                )
                if os.path.exists(mask_path):
                    m = np.asarray(Image.open(mask_path)) > 0
                    label[m] = names.index(name) + 1
                frames_per_obj[name].append((scene, frame))
            ds.write_frame(scene, frame, rgb, depth, label, poses)

    for name in names:
        if frames_per_obj[name]:
            ds.write_image_set(name, out_split, frames_per_obj[name])
    return ds


def bop_camera_k(bop_root: str, split: str, scene: str) -> np.ndarray:
    """First frame's K of a scene (BOP keeps K per image; LM6d assumes one
    camera — LINEMOD/YCB use a fixed camera per sequence)."""
    with open(os.path.join(bop_root, split, scene, "scene_camera.json")) as f:
        cam = json.load(f)
    first = cam[sorted(cam, key=int)[0]]
    return np.asarray(first["cam_K"], np.float32).reshape(3, 3)
