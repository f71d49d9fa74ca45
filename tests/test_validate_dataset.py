"""Adversarial dataset-preflight tests (tools/validate_dataset.py).

The readers' own fixtures are written by the same code that reads them —
self-parity.  These tests build drops that deliberately violate each
real-world convention (depth factors, mm/cm poses, world-to-camera
rotations, reflected axes, mm meshes, label id conventions, missing
frames) and assert the preflight validator flags each one loudly and
actionably — the offline maximum for real-data readiness (SURVEY
§2.3/§2.6 toolkit rows).
"""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

from deepim_tpu.data.lm6d import DEPTH_FACTOR, LM6DDataset
from deepim_tpu.data.toolkit import gen_procedural_dataset
from deepim_tpu.data.validate import (
    check_pose, detect_format, format_findings, validate, validate_bop,
    validate_lm6d, validate_ycb_video,
)

K_CAM = np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]], np.float32)
H, W = 64, 128
OBJECTS = ["box", "icosphere"]


@pytest.fixture(scope="module")
def pristine(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm6d_good"))
    gen_procedural_dataset(root, OBJECTS, K_CAM, (H, W), frames_per_obj=3,
                           seed=0)
    return root


@pytest.fixture()
def lm6d_root(pristine, tmp_path):
    """Per-test mutable copy of the pristine drop."""
    dst = str(tmp_path / "lm6d")
    shutil.copytree(pristine, dst)
    return dst


def _codes(findings):
    return {f.code for f in findings}


def _first_record(root):
    ds = LM6DDataset(root, OBJECTS)
    rec = ds.gt_roidb("box", "test")[0]
    return ds, rec


# -- the healthy drop passes ------------------------------------------------


def test_good_lm6d_passes(pristine):
    findings = validate_lm6d(pristine, OBJECTS)
    assert not [f for f in findings if f.level == "ERROR"], \
        format_findings(findings)


def test_detect_format(pristine, tmp_path):
    assert detect_format(pristine) == "lm6d"
    bop = tmp_path / "bop" / "test" / "000001"
    bop.mkdir(parents=True)
    (bop / "scene_gt.json").write_text("{}")
    assert detect_format(str(tmp_path / "bop")) == "bop:test"
    with pytest.raises(SystemExit):
        detect_format(str(tmp_path))


# -- pose conventions -------------------------------------------------------


def test_mm_translation_flagged(lm6d_root):
    ds, rec = _first_record(lm6d_root)
    bad = rec.pose.copy()
    bad[:, 3] *= 1000.0  # millimeters
    np.savetxt(ds._obs(rec.scene, rec.frame, "pose_box.txt"), bad)
    assert "pose-translation-units" in _codes(validate_lm6d(lm6d_root,
                                                            OBJECTS))


def test_w2c_pose_flagged(lm6d_root):
    """Inverse (world/camera-to-model) pose stored as model-to-camera."""
    ds, rec = _first_record(lm6d_root)
    r, t = rec.pose[:, :3], rec.pose[:, 3]
    inv = np.concatenate([r.T, (-r.T @ t)[:, None]], axis=1)
    np.savetxt(ds._obs(rec.scene, rec.frame, "pose_box.txt"), inv)
    assert "pose-behind-camera" in _codes(validate_lm6d(lm6d_root, OBJECTS))


def test_nonorthonormal_rotation_flagged(lm6d_root):
    ds, rec = _first_record(lm6d_root)
    bad = rec.pose.copy()
    bad[:, :3] *= 1.2  # scale baked into R (e.g. K leaked in)
    np.savetxt(ds._obs(rec.scene, rec.frame, "pose_box.txt"), bad)
    assert "pose-rotation-not-orthonormal" in _codes(
        validate_lm6d(lm6d_root, OBJECTS))


def test_reflected_rotation_flagged(lm6d_root):
    """One axis flipped (single OpenCV<->OpenGL flip): det(R) = -1."""
    ds, rec = _first_record(lm6d_root)
    bad = rec.pose.copy()
    bad[1, :3] *= -1.0
    np.savetxt(ds._obs(rec.scene, rec.frame, "pose_box.txt"), bad)
    assert "pose-rotation-reflected" in _codes(validate_lm6d(lm6d_root,
                                                             OBJECTS))


def test_check_pose_accepts_healthy():
    r = np.eye(3)
    pose = np.concatenate([r, [[0.02], [-0.01], [0.7]]], axis=1)
    assert check_pose(pose, "mem") == []


# -- depth factor -----------------------------------------------------------


def test_wrong_depth_factor_flagged(lm6d_root):
    """Depth written at the ORIGINAL YCB release factor (10000) but read
    at the framework factor (1000): 10x depth, caught by the depth-vs-
    pose-z cross check (or the range check at larger z)."""
    ds, rec = _first_record(lm6d_root)
    dpath = ds._obs(rec.scene, rec.frame, "depth.png")
    raw = np.asarray(Image.open(dpath)).astype(np.float64)
    Image.fromarray(np.clip(raw * 10.0, 0, 65535).astype(np.uint16)).save(
        dpath)
    codes = _codes(validate_lm6d(lm6d_root, OBJECTS))
    assert codes & {"depth-factor", "depth-pose-mismatch"}, codes


# -- layout / bookkeeping ---------------------------------------------------


def test_missing_frame_flagged(lm6d_root):
    path = os.path.join(lm6d_root, "image_set", "observed", "box_test.txt")
    with open(path, "a") as f:
        f.write("scene_99/999999\n")
    # the phantom frame is beyond max_frames_per_obj=3 by default
    assert "frame-missing" in _codes(
        validate_lm6d(lm6d_root, OBJECTS, max_frames_per_obj=10))


def test_init_pose_count_mismatch_flagged(lm6d_root):
    ds, rec = _first_record(lm6d_root)
    ds.write_init_poses("box", "test", np.tile(rec.pose[None], (7, 1, 1)))
    assert "init-poses-count" in _codes(validate_lm6d(lm6d_root, OBJECTS))


def test_label_id_out_of_range_flagged(lm6d_root):
    ds, rec = _first_record(lm6d_root)
    lpath = ds._obs(rec.scene, rec.frame, "label.png")
    label = np.asarray(Image.open(lpath)).copy()
    label[:4, :4] = 200  # not a 1-based class id over 2 objects
    Image.fromarray(label).save(lpath)
    assert "label-id-range" in _codes(validate_lm6d(lm6d_root, OBJECTS))


def test_mm_mesh_flagged(lm6d_root):
    from deepim_tpu.raster.mesh import Mesh, load_ply, save_ply

    ds = LM6DDataset(lm6d_root, OBJECTS)
    mesh = load_ply(ds.model_path("box"))
    save_ply(ds.model_path("box"),
             Mesh(mesh.vertices * 1000.0, mesh.faces, mesh.colors,
                  mesh.normals))
    assert "mesh-units-mm" in _codes(validate_lm6d(lm6d_root, OBJECTS))


# -- BOP/SIXD source trees --------------------------------------------------


def _write_bop_scene(root, scene="000001", gt_entry=None, cam=None,
                     with_rgb=True):
    sdir = os.path.join(root, "test", scene)
    os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
    if with_rgb:
        Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
            os.path.join(sdir, "rgb", "000000.png"))
    r = np.eye(3)
    gt_entry = gt_entry if gt_entry is not None else {
        "cam_R_m2c": r.reshape(-1).tolist(),
        "cam_t_m2c": [20.0, -10.0, 700.0],  # mm
        "obj_id": 1,
    }
    cam = cam if cam is not None else {
        "cam_K": K_CAM.reshape(-1).tolist(), "depth_scale": 1.0,
    }
    with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
        json.dump({"0": [gt_entry]}, f)
    with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
        json.dump({"0": cam}, f)
    return root


def test_bop_healthy_passes(tmp_path):
    root = _write_bop_scene(str(tmp_path))
    findings = validate_bop(root, "test")
    assert not [f for f in findings if f.level == "ERROR"], \
        format_findings(findings)


def test_bop_w2c_key_flagged(tmp_path):
    root = _write_bop_scene(str(tmp_path), gt_entry={
        "cam_R_w2c": np.eye(3).reshape(-1).tolist(),
        "cam_t_w2c": [0.0, 0.0, 700.0], "obj_id": 1,
    })
    assert "pose-w2c" in _codes(validate_bop(root, "test"))


def test_bop_meter_translation_flagged(tmp_path):
    root = _write_bop_scene(str(tmp_path), gt_entry={
        "cam_R_m2c": np.eye(3).reshape(-1).tolist(),
        "cam_t_m2c": [0.02, -0.01, 0.7],  # meters, not the required mm
        "obj_id": 1,
    })
    assert "bop-t-meters" in _codes(validate_bop(root, "test"))


def test_bop_bad_depth_scale_flagged(tmp_path):
    root = _write_bop_scene(str(tmp_path), cam={
        "cam_K": K_CAM.reshape(-1).tolist(), "depth_scale": 1000.0,
    })
    assert "depth-scale" in _codes(validate_bop(root, "test"))


def test_bop_missing_rgb_flagged(tmp_path):
    root = _write_bop_scene(str(tmp_path), with_rgb=False)
    assert "rgb-missing" in _codes(validate_bop(root, "test"))


def test_bop_bad_cam_k_flagged(tmp_path):
    root = _write_bop_scene(str(tmp_path), cam={
        "cam_K": [1, 2, 3], "depth_scale": 1.0,
    })
    assert "cam-k-shape" in _codes(validate_bop(root, "test"))


# -- YCB-Video layout -------------------------------------------------------


@pytest.fixture()
def ycb_root(tmp_path):
    from deepim_tpu.data.video import gen_video
    from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh

    root = str(tmp_path / "ycbv")
    ds = gen_video(root, {"box": box_mesh((0.3, 0.3, 0.06)),
                          "icosphere": icosphere_mesh(0.05)},
                   K_CAM, (H, W), num_frames=4, num_sequences=1, seed=0)
    ds.write_keyframes([(s, fid) for s in ds.sequences()
                        for fid in ds.frame_ids(s)[::2]])
    return root


def test_ycb_healthy_passes(ycb_root):
    findings = validate_ycb_video(ycb_root)
    assert not [f for f in findings if f.level == "ERROR"], \
        format_findings(findings)


def test_ycb_global_label_ids_flagged(ycb_root):
    """ORIGINAL-release global class ids in a label (beyond the sequence's
    slot count) must be caught — the slot convention is 1 + index into
    {seq}_objects.txt."""
    from deepim_tpu.data.video import VideoDataset

    ds = VideoDataset(ycb_root, OBJECTS)
    seq, fid = ds.keyframes()[0]
    lpath = ds._vid(seq, fid, "label.png")
    label = np.asarray(Image.open(lpath)).copy()
    label[:4, :4] = 15  # a global YCB class id; this sequence has 2 slots
    Image.fromarray(label).save(lpath)
    assert "label-slot-range" in _codes(validate_ycb_video(ycb_root))


def test_ycb_keyframe_unknown_sequence_flagged(ycb_root):
    with open(os.path.join(ycb_root, "video_sets", "keyframe.txt"),
              "a") as f:
        f.write("9999/000042\n")
    assert "keyframe-unknown-seq" in _codes(validate_ycb_video(ycb_root))


def test_sequences_excludes_keyframe_list(ycb_root):
    """keyframe.txt must not be mistaken for a sequence (cli.track
    iterates sequences())."""
    from deepim_tpu.data.video import VideoDataset

    assert "keyframe" not in VideoDataset(ycb_root, OBJECTS).sequences()


# -- CLI --------------------------------------------------------------------


def test_cli_validate_dataset(pristine, capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "validate_dataset",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "validate_dataset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main([pristine])
    out = capsys.readouterr().out
    assert rc == 0 and "lm6d" in out and "OK" in out
