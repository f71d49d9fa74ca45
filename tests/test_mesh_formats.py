"""Tests: .obj (+MTL/texture) and .off loaders vs the PLY path.

Reference parity: ``render_py.py §Render_Py.__init__`` loads textured
.ply/.obj (YCB ships textured.obj); ModelNet experiments consume .off
CAD files (SURVEY.md §2.2/§2.3).  Fixtures are tiny hand-written files;
OBJ/OFF geometry must round-trip against the equivalent PLY and render
identically through both raster paths.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from deepim_tpu.raster.mesh import (
    box_mesh,
    load_mesh,
    load_obj,
    load_off,
    load_ply,
    normalize_mesh,
    save_ply,
)

K_CAM = jnp.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]], jnp.float32)
POSE = jnp.asarray(
    np.concatenate([np.eye(3, dtype=np.float32), [[0.0], [0.0], [0.6]]], 1)
)


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


BOX_V = [
    (-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
    (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),
]
# quad faces (fan-triangulated by every loader)
BOX_QUADS = [
    (0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
    (2, 3, 7, 6), (1, 2, 6, 5), (3, 0, 4, 7),
]


def _obj_text(scale=0.05, with_colors=False):
    lines = []
    for v in BOX_V:
        row = f"v {v[0]*scale} {v[1]*scale} {v[2]*scale}"
        if with_colors:
            row += f" {0.5 + 0.5 * (v[0] > 0)} 0.25 0.75"
        lines.append(row)
    for q in BOX_QUADS:
        lines.append("f " + " ".join(str(i + 1) for i in q))
    return "\n".join(lines) + "\n"


def _off_text(scale=0.05, glued_header=False, face_colors=False):
    head = "OFF8 12 0" if glued_header else "OFF\n8 12 0"
    lines = [head]
    for v in BOX_V:
        lines.append(f"{v[0]*scale} {v[1]*scale} {v[2]*scale}")
    for q in BOX_QUADS:
        for k in range(1, 3):
            row = f"3 {q[0]} {q[k]} {q[k+1]}"
            if face_colors:
                row += " 255 0 0"
            lines.append(row)
    return "\n".join(lines) + "\n"


def test_obj_basic_geometry(tmp_path):
    m = load_obj(_write(tmp_path / "box.obj", _obj_text()))
    assert m.num_vertices == 8
    assert m.num_faces == 12  # quads fan-triangulated
    assert abs(m.diameter - 0.1 * np.sqrt(3)) < 1e-6
    ref = box_mesh((0.1, 0.1, 0.1))
    assert abs(ref.diameter - m.diameter) < 1e-6


def test_obj_vertex_colors(tmp_path):
    m = load_obj(_write(tmp_path / "boxc.obj", _obj_text(with_colors=True)))
    assert m.colors.max() <= 1.0
    # +x vertices were written brighter red than -x ones
    assert m.colors[m.vertices[:, 0] > 0, 0].mean() > \
        m.colors[m.vertices[:, 0] < 0, 0].mean()


def test_obj_negative_indices(tmp_path):
    text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
    m = load_obj(_write(tmp_path / "neg.obj", text))
    assert m.num_faces == 1
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])


def test_obj_mtl_and_texture_bake(tmp_path):
    # 2x1 texture: left black, right white; a unit quad with u=0 corners
    # on vertices 0/3 and u=1 on 1/2 -> baked colors split black/white.
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, 4:] = 255
    Image.fromarray(tex).save(tmp_path / "tex.png")
    _write(tmp_path / "m.mtl",
           "newmtl mat0\nKd 0.2 0.4 0.6\nmap_Kd tex.png\n")
    obj = (
        "mtllib m.mtl\n"
        "v 0 0 0\nv 0.1 0 0\nv 0.1 0.1 0\nv 0 0.1 0\n"
        "vt 0.05 0.5\nvt 0.95 0.5\nvt 0.95 0.5\nvt 0.05 0.5\n"
        "usemtl mat0\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    m = load_obj(_write(tmp_path / "q.obj", obj))
    assert m.num_faces == 2
    assert m.uv is not None and m.texture is not None
    assert m.texture.shape == (8, 8, 3)
    left = m.colors[np.isclose(m.uv[:, 0], 0.05)]
    right = m.colors[np.isclose(m.uv[:, 0], 0.95)]
    assert left.max() < 0.2 and right.min() > 0.8

    # Kd-only material (no texture): flat diffuse color
    _write(tmp_path / "kd.mtl", "newmtl flat\nKd 0.9 0.1 0.3\n")
    obj2 = ("mtllib kd.mtl\nv 0 0 0\nv 0.1 0 0\nv 0 0.1 0\n"
            "usemtl flat\nf 1 2 3\n")
    m2 = load_obj(_write(tmp_path / "kd.obj", obj2))
    np.testing.assert_allclose(m2.colors[0], [0.9, 0.1, 0.3], atol=1e-6)


def test_obj_uv_corner_dedup(tmp_path):
    """A vertex reused with two different UVs must be duplicated so UVs
    are per-vertex (seam handling)."""
    obj = (
        "v 0 0 0\nv 0.1 0 0\nv 0 0.1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "f 1/1 2/2 3/3\n"
        "f 1/4 2/2 3/3\n"  # vertex 1 reappears with uv 4
    )
    m = load_obj(_write(tmp_path / "seam.obj", obj))
    assert m.num_vertices == 4  # vertex 0 split into two corners
    assert m.num_faces == 2


def test_off_geometry_and_quirks(tmp_path):
    m = load_off(_write(tmp_path / "box.off", _off_text()))
    assert (m.num_vertices, m.num_faces) == (8, 12)
    # ModelNet glued-header quirk: counts on the OFF line itself
    m2 = load_off(_write(tmp_path / "glued.off", _off_text(glued_header=True)))
    np.testing.assert_array_equal(m.vertices, m2.vertices)
    np.testing.assert_array_equal(m.faces, m2.faces)
    # per-face trailing colors scatter to vertices
    m3 = load_off(_write(tmp_path / "fc.off", _off_text(face_colors=True)))
    np.testing.assert_allclose(m3.colors[:, 0], 1.0)
    np.testing.assert_allclose(m3.colors[:, 1], 0.0)


def test_coff_vertex_colors(tmp_path):
    lines = ["COFF", "3 1 0"]
    for i, v in enumerate([(0, 0, 0), (0.1, 0, 0), (0, 0.1, 0)]):
        lines.append(f"{v[0]} {v[1]} {v[2]} {85 * (i + 1)} 0 0 255")
    lines.append("3 0 1 2")
    m = load_off(_write(tmp_path / "c.off", "\n".join(lines) + "\n"))
    np.testing.assert_allclose(m.colors[:, 0], [1 / 3, 2 / 3, 1.0], atol=0.01)


def test_obj_off_ply_roundtrip_and_render_parity(tmp_path):
    """The same box written as OBJ, OFF, and PLY loads to identical
    geometry and renders identically through BOTH raster paths."""
    from deepim_tpu.raster.raster_pallas import render_batch
    from deepim_tpu.raster.raster_xla import render_mesh

    obj = load_mesh(_write(tmp_path / "box.obj", _obj_text()))
    off = load_mesh(_write(tmp_path / "box.off", _off_text()))
    save_ply(str(tmp_path / "box.ply"), obj)
    ply = load_mesh(str(tmp_path / "box.ply"))

    for other in (off, ply):
        np.testing.assert_allclose(obj.vertices, other.vertices, atol=1e-6)
        np.testing.assert_array_equal(obj.faces, other.faces)

    imgs = []
    for m in (obj, off, ply):
        v, f, c, nrm = (jnp.asarray(x) for x in
                        (m.vertices, m.faces, m.colors, m.normals))
        rgb_x, depth_x = render_mesh(v, f, c, nrm, POSE, K_CAM, (32, 64))
        rgb_p, depth_p = render_batch(
            v, f, c, nrm, POSE[None], K_CAM[None], (32, 64), interpret=True)
        assert float(depth_x.max()) > 0  # the box is visible
        np.testing.assert_allclose(np.asarray(depth_p[0]),
                                   np.asarray(depth_x), atol=1e-3)
        imgs.append((np.asarray(rgb_x), np.asarray(depth_x)))
    for rgb, depth in imgs[1:]:
        # rgb atol: the ASCII-PLY round trip quantizes colors to uint8
        np.testing.assert_allclose(rgb, imgs[0][0], atol=3e-3)
        np.testing.assert_allclose(depth, imgs[0][1], atol=1e-5)


def test_normalize_mesh():
    m = normalize_mesh(box_mesh((0.3, 0.2, 0.1)), diameter=0.15)
    assert abs(m.diameter - 0.15) < 1e-5
    center = (m.vertices.max(0) + m.vertices.min(0)) / 2
    np.testing.assert_allclose(center, 0.0, atol=1e-7)


def test_load_mesh_dispatch_unknown(tmp_path):
    with pytest.raises(ValueError, match="unsupported mesh format"):
        load_mesh(str(tmp_path / "x.stl"))


def test_lm6d_model_path_probes_obj(tmp_path):
    """LM6DDataset finds textured.obj when no .ply exists (YCB layout)."""
    from deepim_tpu.data.lm6d import LM6DDataset

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "models", "thing"))
    _write(os.path.join(root, "models", "thing", "textured.obj"), _obj_text())
    ds = LM6DDataset(root, ["thing"])
    assert ds.model_path("thing").endswith("textured.obj")
    (mesh,) = ds.load_meshes()
    assert mesh.num_faces == 12
