"""Original (pre-SIXD) LINEMOD release converter tests.

Reference parity: the reference toolkit's original->LM6d_converted
conversion (SURVEY §2.6).  Fixtures are written in the release's own
formats (.dpt binary depth, headed .rot/.tra text, mm mesh, jpg color)
with adversarial variants for each unit convention.
"""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from deepim_tpu.data.lm6d import LM6DDataset
from deepim_tpu.data.lm_original import (
    convert_lm_original, read_dpt, read_rot, read_tra,
)
from deepim_tpu.data.validate import validate_lm6d

H, W = 48, 64


def _write_dpt(path, depth_mm, swap_header=False):
    rows, cols = depth_mm.shape
    hdr = (cols, rows) if swap_header else (rows, cols)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", *hdr))
        depth_mm.astype(np.uint16).tofile(f)


def _write_original_object(root, obj, n_frames=2, tra_unit_cm=True):
    """One object of the release: mm mesh.ply, data/{color,depth,rot,tra}."""
    from deepim_tpu.raster.mesh import Mesh, box_mesh, save_ply

    odir = os.path.join(root, obj)
    data = os.path.join(odir, "data")
    os.makedirs(data, exist_ok=True)
    m = box_mesh((0.08, 0.1, 0.06))  # meters
    save_ply(os.path.join(odir, "mesh.ply"),
             Mesh(m.vertices * 1000.0, m.faces, m.colors, m.normals))
    rng = np.random.RandomState(hash(obj) % 1000)
    poses = []
    for i in range(n_frames):
        rgb = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(data, f"color{i}.jpg"))
        t = np.array([0.02, -0.01, 0.7 + 0.05 * i])  # meters
        # depth: object plane at t_z over half the image, rest far
        depth_m = np.full((H, W), 1.5)
        depth_m[H // 4: 3 * H // 4, W // 4: 3 * W // 4] = t[2]
        _write_dpt(os.path.join(data, f"depth{i}.dpt"), depth_m * 1000.0,
                   swap_header=(i % 2 == 1))
        th = 0.3 * i
        c, s = np.cos(th), np.sin(th)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        with open(os.path.join(data, f"rot{i}.rot"), "w") as f:
            f.write("3 3\n" + "\n".join(
                " ".join(f"{v:.9f}" for v in row) for row in r))
        scale = 100.0 if tra_unit_cm else 1000.0  # cm (release) or mm (bad)
        with open(os.path.join(data, f"tra{i}.tra"), "w") as f:
            f.write("1 3\n" + " ".join(f"{v:.9f}" for v in t * scale))
        poses.append(np.concatenate([r, t[:, None]], axis=1))
    return poses


def test_read_dpt_header_and_swap(tmp_path):
    d = np.arange(H * W, dtype=np.float64).reshape(H, W)
    p = str(tmp_path / "a.dpt")
    _write_dpt(p, d)
    np.testing.assert_allclose(read_dpt(p), d / 1000.0, rtol=1e-6)
    # swapped (cols, rows) header re-distributions load identically
    p2 = str(tmp_path / "b.dpt")
    _write_dpt(p2, d, swap_header=True)
    np.testing.assert_allclose(read_dpt(p2), d / 1000.0, rtol=1e-6)


def test_read_dpt_rejects_truncated(tmp_path):
    p = str(tmp_path / "bad.dpt")
    with open(p, "wb") as f:
        f.write(struct.pack("<ii", H, W))
        np.zeros(10, np.uint16).tofile(f)
    with pytest.raises(ValueError, match="payload"):
        read_dpt(p)


def test_read_rot_tra_units(tmp_path):
    rp, tp = str(tmp_path / "r.rot"), str(tmp_path / "t.tra")
    with open(rp, "w") as f:
        f.write("3 3\n1 0 0\n0 1 0\n0 0 1\n")
    np.testing.assert_array_equal(read_rot(rp), np.eye(3))
    with open(tp, "w") as f:
        f.write("1 3\n2.0 -1.0 70.0\n")  # centimeters
    np.testing.assert_allclose(read_tra(tp), [0.02, -0.01, 0.7])
    # headerless files (some mirrors strip it) still parse
    with open(rp, "w") as f:
        f.write("1 0 0 0 1 0 0 0 1\n")
    np.testing.assert_array_equal(read_rot(rp), np.eye(3))
    with open(rp, "w") as f:
        f.write("2 2\n1 0 0 1\n")
    with pytest.raises(ValueError):
        read_rot(rp)


def test_convert_and_preflight(tmp_path):
    src = str(tmp_path / "orig")
    poses = _write_original_object(src, "cat")
    _write_original_object(src, "duck")
    out = str(tmp_path / "lm6d")
    ds = convert_lm_original(src, out)
    assert ds.objects == ["cat", "duck"]

    recs = ds.gt_roidb("cat", "test")
    assert len(recs) == 2
    np.testing.assert_allclose(recs[0].pose, poses[0], atol=1e-6)
    fr = ds.load_frame(recs[0])
    assert fr["obs_rgb"].shape == (H, W, 3)
    # depth survived the .dpt -> png re-encode (mm precision)
    assert abs(float(np.median(fr["obs_depth"][fr["obs_depth"] < 1.0]))
               - 0.7) < 2e-3
    # mesh came out meter-scale
    mesh = ds.load_meshes()[0]
    assert float(np.abs(mesh.vertices).max()) < 0.2

    findings = validate_lm6d(out)
    assert not [f for f in findings if f.level == "ERROR"], \
        [str(f) for f in findings]


def test_convert_flags_wrong_tra_units(tmp_path):
    """A drop whose .tra is secretly mm (not the release's cm) converts
    to 10x-too-far poses — the preflight must catch it."""
    src = str(tmp_path / "orig")
    _write_original_object(src, "cat", tra_unit_cm=False)
    out = str(tmp_path / "lm6d")
    convert_lm_original(src, out)
    codes = {f.code for f in validate_lm6d(out)}
    assert codes & {"pose-translation-range", "depth-pose-mismatch",
                    "pose-translation-units"}, codes


def test_no_label_written_uses_depth_fallback(tmp_path):
    src = str(tmp_path / "orig")
    _write_original_object(src, "cat")
    out = str(tmp_path / "lm6d")
    ds = convert_lm_original(src, out)
    rec = ds.gt_roidb("cat", "test")[0]
    assert not os.path.exists(
        os.path.join(out, "data", "observed", "cat", "000000-label.png"))
    fr = LM6DDataset(out, ["cat"]).load_frame(rec)
    assert fr["obs_mask"].any()  # depth>0 fallback
