"""Tests: YCB-Video keyframe evaluation protocol + PoseCNN .mat import.

Reference parity (SURVEY.md §2.3 YCB-Video row): keyframe test list,
per-keyframe batched refinement (not tracking), PoseCNN init poses from
the released per-keyframe .mat results, AUC tables.
"""

import os

import numpy as np
import pytest

from deepim_tpu.data.video import (
    VideoDataset,
    apply_posecnn_mat_init,
    gen_video,
    iter_keyframe_batches,
    keyframe_records,
)
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh

K_CAM = np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]], np.float32)
H, W = 64, 128
OBJECTS = ["box", "icosphere"]


@pytest.fixture(scope="module")
def video_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ycbv"))
    ds = gen_video(root, {"box": box_mesh((0.3, 0.3, 0.06)),
                          "icosphere": icosphere_mesh(0.05)},
                   K_CAM, (H, W), num_frames=6, num_sequences=1, seed=0)
    # keyframe list: every other frame (the YCB release also subsamples)
    seqs = ds.sequences()
    ds.write_keyframes([(s, fid) for s in seqs
                        for fid in ds.frame_ids(s)[::2]])
    return ds


def test_keyframe_records(video_ds):
    recs = keyframe_records(video_ds)
    kfs = video_ds.keyframes()
    assert len(kfs) == 3  # 6 frames, every other
    # one record per (keyframe, object-in-sequence)
    assert len(recs) == sum(len(video_ds.objects_in(s)) for s, _ in kfs)
    r = recs[0]
    assert r.pose.shape == (3, 4)
    # GT pose matches the stored per-frame pose file
    np.testing.assert_array_equal(
        r.pose, video_ds.keyframe_pose(r.scene, r.frame, r.obj))


def test_keyframe_batches_and_masks(video_ds):
    recs = keyframe_records(video_ds)
    bs = 4
    pad_to = (len(recs) + bs - 1) // bs * bs
    got = list(iter_keyframe_batches(video_ds, recs, bs, pad_to=pad_to))
    assert len(got) == pad_to // bs
    b0 = got[0]
    assert b0["obs_rgb"].shape == (bs, H, W, 3)
    assert b0["obs_depth"].max() > 0.3
    # per-sequence slot label convention: each record's mask selects only
    # its own object's pixels, so the two objects' masks are disjoint
    m_box, m_ico = b0["obs_mask"][0], b0["obs_mask"][1]
    assert m_box.sum() > 0 and m_ico.sum() > 0
    assert not (m_box & m_ico).any()


def test_keyframe_batches_decode_each_frame_once(video_ds, monkeypatch):
    """A multi-object scene decodes its PNGs once per keyframe, not once
    per object — and the deduped batches match the naive per-record path."""
    recs = keyframe_records(video_ds)
    bs = len(recs)  # one batch holding every record
    naive = [video_ds.load_keyframe(r.scene, r.frame, r.obj) for r in recs]

    calls = []
    orig = VideoDataset.load_frame_raw

    def counting(self, seq, frame):
        calls.append((seq, frame))
        return orig(self, seq, frame)

    monkeypatch.setattr(VideoDataset, "load_frame_raw", counting)
    (batch,) = iter_keyframe_batches(video_ds, recs, bs)
    unique_frames = {(r.scene, r.frame) for r in recs}
    assert len(calls) == len(unique_frames)  # 3 keyframes, 6 records
    assert len(calls) < len(recs)
    for i, f in enumerate(naive):
        np.testing.assert_array_equal(batch["obs_rgb"][i], f["obs_rgb"])
        np.testing.assert_array_equal(batch["obs_depth"][i], f["obs_depth"])
        np.testing.assert_array_equal(batch["obs_mask"][i], f["obs_mask"])


def test_posecnn_mat_import(video_ds, tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    from deepim_tpu.geometry.rotations import mat2quat
    import jax.numpy as jnp

    recs = keyframe_records(video_ds)
    kfs = video_ds.keyframes()
    results = str(tmp_path / "posecnn")
    os.makedirs(results)
    # write one released-style .mat per keyframe: rois column 1 holds the
    # 1-based class id, poses rows are wxyz-quat + txyz
    want = {}
    for ki, (seq, fid) in enumerate(kfs):
        objs = video_ds.objects_in(seq)
        rois, poses = [], []
        for obj in objs:
            cls1 = video_ds.class_to_idx[obj] + 1
            gt = video_ds.keyframe_pose(seq, fid, obj)
            q = np.asarray(mat2quat(jnp.asarray(gt[:, :3])))
            t = gt[:, 3] + np.float32([0.01, 0.0, 0.02])  # offset != GT
            rois.append([0, cls1, 0, 0, 0, 0, 0.9])
            poses.append(np.concatenate([q, t]))
            want[(seq, fid, obj)] = (q, t)
        scipy_io.savemat(os.path.join(results, f"{ki:06d}.mat"),
                         {"rois": np.asarray(rois, np.float32),
                          "poses": np.asarray(poses, np.float32)})

    init = np.stack([r.pose for r in recs]).copy()
    matched = apply_posecnn_mat_init(recs, init, results)
    assert matched == len(recs)
    for i, r in enumerate(recs):
        q, t = want[(r.scene, r.frame, r.obj)]
        np.testing.assert_allclose(init[i, :, 3], t, atol=1e-6)
        # rotation round-trips through the quaternion
        np.testing.assert_allclose(init[i, :, :3] @ init[i, :, :3].T,
                                   np.eye(3), atol=1e-5)
        np.testing.assert_allclose(init[i, :, :3], r.pose[:, :3], atol=1e-4)

    # a results dir with missing files matches nothing extra
    init2 = np.stack([r.pose for r in recs]).copy()
    assert apply_posecnn_mat_init(recs, init2, str(tmp_path / "nope")) == 0


def test_convert_ycb_original(tmp_path):
    """The ORIGINAL YCB-Video release layout (meta.mat poses/cls_indexes/
    factor_depth, global-id labels, image_sets/keyframe.txt, textured.obj
    models) converts into the video layout: poses/depths/labels/keyframes
    all round-trip."""
    scipy_io = pytest.importorskip("scipy.io")
    from PIL import Image

    from deepim_tpu.data.video import convert_ycb_original

    classes = ["alpha", "beta", "gamma"]
    src = str(tmp_path / "ycb_src")
    rng = np.random.RandomState(0)
    seq, fids = "0003", ["000001", "000002"]
    sdir = os.path.join(src, "data", seq)
    os.makedirs(sdir)
    # the sequence contains classes beta (2) and gamma (3), 1-based
    cls_indexes = np.asarray([[2], [3]], np.uint8)
    gt = {}
    for fid in fids:
        Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            os.path.join(sdir, f"{fid}-color.png"))
        depth_m = rng.rand(48, 64).astype(np.float32)
        Image.fromarray((depth_m * 10000).astype(np.uint16)).save(
            os.path.join(sdir, f"{fid}-depth.png"))
        lab = np.zeros((48, 64), np.uint8)
        lab[:10, :10] = 2  # global class id for beta
        lab[20:30, :10] = 3  # gamma
        Image.fromarray(lab).save(os.path.join(sdir, f"{fid}-label.png"))
        poses = rng.randn(3, 4, 2).astype(np.float32)
        scipy_io.savemat(os.path.join(sdir, f"{fid}-meta.mat"),
                         {"poses": poses, "cls_indexes": cls_indexes,
                          "factor_depth": np.asarray([[10000.0]]),
                          "intrinsic_matrix": np.eye(3)})
        gt[fid] = (poses, depth_m)
    # models: beta as textured.obj with texture; gamma as plain obj
    for name in ("beta", "gamma"):
        mdir = os.path.join(src, "models", name)
        os.makedirs(mdir)
        with open(os.path.join(mdir, "textured.obj"), "w") as f:
            f.write("v 0 0 0\nv 0.1 0 0\nv 0 0.1 0\nf 1 2 3\n")
    os.makedirs(os.path.join(src, "image_sets"))
    with open(os.path.join(src, "image_sets", "keyframe.txt"), "w") as f:
        f.write(f"{seq}/{fids[1]}\n0099/000777\n")  # one outside seq list

    out = str(tmp_path / "ycb_video")
    ds = convert_ycb_original(src, out, classes)
    assert ds.objects_in(seq) == ["beta", "gamma"]
    assert ds.keyframes() == [(seq, fids[1])]  # foreign seq filtered
    # pose and depth round-trip
    np.testing.assert_allclose(
        ds.keyframe_pose(seq, fids[0], "beta"), gt[fids[0]][0][:, :, 0],
        atol=1e-6)
    frame = ds.load_keyframe(seq, fids[0], "gamma")
    np.testing.assert_allclose(frame["obs_depth"], gt[fids[0]][1],
                               atol=2e-3)  # uint16 mm requantization
    # labels remapped global->slot: gamma (global 3) is slot 2 in-seq
    assert frame["obs_mask"][20:30, :10].all()
    assert not frame["obs_mask"][:10, :10].any()
    # models copied verbatim and loadable
    (m1, m2) = LM6DDatasetFor(out, ["beta", "gamma"])
    assert m1.num_faces == 1 and m2.num_faces == 1


def LM6DDatasetFor(root, objs):
    from deepim_tpu.data.lm6d import LM6DDataset

    return LM6DDataset(root, objs).load_meshes()


@pytest.mark.slow
def test_cli_ycb_keyframe_end_to_end(video_ds, tmp_path):
    """cli.test --cfg ycb_video runs the keyframe protocol end to end:
    streamed keyframe batches, refinement, AUC table, BOP export."""
    import json

    import yaml

    from deepim_tpu.cli import test as cli_test

    cfg = {
        "experiment": "ycb_kf",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "ycb_video", "root": video_ds.root,
                    "objects": OBJECTS, "obj_ids": [3, 7],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "test": {"test_iter": 1, "batch_size": 4, "renderer": "xla",
                 "init": "perturb"},
    }
    cfg_path = str(tmp_path / "ycb.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    assert cli_test.main(["--cfg", cfg_path, "--save-poses"]) == 0

    out = os.path.join(str(tmp_path / "out"), "ycb_kf")
    with open(os.path.join(out, "eval_results.json")) as f:
        results = json.load(f)
    n_recs = len(keyframe_records(video_ds))
    assert sum(r["n"] for r in results["per_class"].values()) == n_recs
    # the YCB metric: AUC ADD(-S) present per class
    for row in results["per_class"].values():
        assert 0.0 <= row["auc_add(-s)"] <= 100.0

    from deepim_tpu.eval.bop_results import read_bop_csv

    bop = read_bop_csv(os.path.join(out, "bop_results.csv"))
    assert len(bop["poses"]) == n_recs
    assert set(bop["obj_ids"]) <= {3, 7}
