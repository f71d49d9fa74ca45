"""Tests: BOP-format converter round-trip + textured-PLY baking."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from deepim_tpu.data.bop import bop_camera_k, convert_bop_split
from deepim_tpu.data.lm6d import LM6DDataset
from deepim_tpu.raster.mesh import box_mesh, load_ply


def _write_mini_bop(root, obj_id=5):
    """Two-frame single-scene BOP fixture with one box object (mm units)."""
    mesh = box_mesh((80.0, 100.0, 60.0))  # mm scale
    mdir = os.path.join(root, "models")
    os.makedirs(mdir, exist_ok=True)
    from deepim_tpu.raster.mesh import save_ply

    save_ply(os.path.join(mdir, f"obj_{obj_id:06d}.ply"), mesh)

    sdir = os.path.join(root, "test", "000001")
    os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "depth"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "mask_visib"), exist_ok=True)
    rng = np.random.RandomState(0)
    scene_gt, scene_cam = {}, {}
    k = [300.0, 0.0, 64.0, 0.0, 300.0, 48.0, 0.0, 0.0, 1.0]
    for im in range(2):
        rgb = rng.randint(0, 255, (96, 128, 3), np.uint8)
        Image.fromarray(rgb).save(os.path.join(sdir, "rgb", f"{im:06d}.png"))
        depth = (rng.rand(96, 128) * 1000).astype(np.uint16)
        Image.fromarray(depth).save(
            os.path.join(sdir, "depth", f"{im:06d}.png")
        )
        mask = np.zeros((96, 128), np.uint8)
        mask[30:60, 40:80] = 255
        Image.fromarray(mask).save(
            os.path.join(sdir, "mask_visib", f"{im:06d}_000000.png")
        )
        r = np.eye(3).reshape(-1).tolist()
        scene_gt[str(im)] = [
            {"cam_R_m2c": r, "cam_t_m2c": [10.0, -20.0, 700.0],
             "obj_id": obj_id}
        ]
        scene_cam[str(im)] = {"cam_K": k, "depth_scale": 0.1}
    with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
        json.dump(scene_gt, f)
    with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
        json.dump(scene_cam, f)


def test_bop_convert_roundtrip(tmp_path):
    bop = str(tmp_path / "bop")
    out = str(tmp_path / "lm6d")
    _write_mini_bop(bop)
    ds = convert_bop_split(bop, "test", out, {5: "box"})
    # models converted to meters
    mesh = ds.load_meshes()[0]
    assert 0.05 < mesh.diameter < 0.2  # ~0.13 m box diagonal
    recs = ds.gt_roidb("box", "test")
    assert len(recs) == 2
    np.testing.assert_allclose(recs[0].pose[:, 3], [0.01, -0.02, 0.7],
                               atol=1e-6)
    frame = ds.load_frame(recs[0])
    assert frame["obs_rgb"].shape == (96, 128, 3)
    # depth_scale 0.1: uint16 1000 -> 0.1 m max
    assert frame["obs_depth"].max() <= 0.11
    assert frame["obs_mask"].sum() == 30 * 40  # visib mask became the label
    k = bop_camera_k(bop, "test", "000001")
    assert k[0, 0] == 300.0 and k[1, 2] == 48.0


def _write_mini_sixd(root, obj_id=5):
    """SIXD-era (original LINEMOD_6D distribution) fixture: gt.yml /
    info.yml, 4-digit image names, obj_{id:02d}.ply models."""
    import yaml

    from deepim_tpu.raster.mesh import save_ply

    mesh = box_mesh((80.0, 100.0, 60.0))  # mm scale
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    save_ply(os.path.join(root, "models", f"obj_{obj_id:02d}.ply"), mesh)
    sdir = os.path.join(root, "test", "01")
    os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "depth"), exist_ok=True)
    rng = np.random.RandomState(1)
    gt, info = {}, {}
    for im in range(2):
        Image.fromarray(
            rng.randint(0, 255, (96, 128, 3), np.uint8)
        ).save(os.path.join(sdir, "rgb", f"{im:04d}.png"))
        Image.fromarray(
            (rng.rand(96, 128) * 1000).astype(np.uint16)
        ).save(os.path.join(sdir, "depth", f"{im:04d}.png"))
        gt[im] = [{"cam_R_m2c": np.eye(3).reshape(-1).tolist(),
                   "cam_t_m2c": [10.0, -20.0, 700.0], "obj_id": obj_id}]
        info[im] = {"cam_K": [300.0, 0.0, 64.0, 0.0, 300.0, 48.0,
                              0.0, 0.0, 1.0],
                    "depth_scale": 0.1}
    with open(os.path.join(sdir, "gt.yml"), "w") as f:
        yaml.safe_dump(gt, f)
    with open(os.path.join(sdir, "info.yml"), "w") as f:
        yaml.safe_dump(info, f)


def test_sixd_yaml_convert_roundtrip(tmp_path):
    """The original-release (SIXD gt.yml) LINEMOD distribution converts
    through the same path as BOP, with identical outputs."""
    sixd = str(tmp_path / "sixd")
    out = str(tmp_path / "lm6d")
    _write_mini_sixd(sixd)
    ds = convert_bop_split(sixd, "test", out, {5: "box"})
    mesh = ds.load_meshes()[0]
    assert 0.05 < mesh.diameter < 0.2
    recs = ds.gt_roidb("box", "test")
    assert len(recs) == 2
    np.testing.assert_allclose(recs[0].pose[:, 3], [0.01, -0.02, 0.7],
                               atol=1e-6)
    frame = ds.load_frame(recs[0])
    assert frame["obs_rgb"].shape == (96, 128, 3)
    assert frame["obs_depth"].max() <= 0.11  # depth_scale honored
    k = bop_camera_k(sixd, "test", "01")
    assert k[0, 0] == 300.0 and k[1, 2] == 48.0


def test_sniff_not_fooled_by_vertex_indices(tmp_path):
    """A PLY with a stale TextureFile comment but NO per-vertex UVs must
    not be classified textured ('property list uchar int vertex_indices'
    used to match the UV suffix check)."""
    from deepim_tpu.raster.mesh import _sniff_texture

    tex = np.zeros((4, 4, 3), np.uint8)
    Image.fromarray(tex).save(tmp_path / "tex.png")
    p = str(tmp_path / "nouv.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment TextureFile tex.png\n")
        f.write("element vertex 3\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("element face 1\n"
                "property list uchar int vertex_indices\nend_header\n")
        f.write("0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    assert _sniff_texture(p) is None
    m = load_ply(p)  # takes the fast native path, no texture
    assert m.texture is None and m.num_faces == 1


def test_decimate_preserves_texture_and_uv():
    from deepim_tpu.raster.mesh import Mesh, decimate_mesh, icosphere_mesh

    m = icosphere_mesh(0.05, subdivisions=3)  # 1280 faces
    uv = np.random.RandomState(0).rand(m.num_vertices, 2).astype(np.float32)
    tex = np.random.RandomState(1).rand(8, 8, 3).astype(np.float32)
    mt = Mesh(m.vertices, m.faces, m.colors, m.normals, uv=uv, texture=tex)
    md = decimate_mesh(mt, max_faces=300)
    assert md.num_faces <= 300
    assert md.texture is not None  # texture survives decimation
    assert md.uv is not None and md.uv.shape == (md.num_vertices, 2)
    assert np.isfinite(md.uv).all()
    assert (md.uv >= 0).all() and (md.uv <= 1).all()  # cluster means


def test_textured_ply_baking(tmp_path):
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = [255, 0, 0]
    tex[:, 4:] = [0, 0, 255]
    Image.fromarray(tex).save(tmp_path / "tex.png")
    p = str(tmp_path / "m.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment TextureFile tex.png\n")
        f.write("element vertex 3\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property float texture_u\nproperty float texture_v\n")
        f.write("element face 1\n"
                "property list uchar int vertex_indices\nend_header\n")
        f.write("0 0 0 0.1 0.5\n1 0 0 0.9 0.5\n0 1 0 0.1 0.9\n")
        f.write("3 0 1 2\n")
    m = load_ply(p)
    assert m.colors[0][0] > 0.9  # left of texture = red
    assert m.colors[1][2] > 0.9  # right of texture = blue
