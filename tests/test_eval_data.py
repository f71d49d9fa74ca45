"""Tests: evaluation tables, LM6d on-disk layout round-trip, toolkit gen,
and the CLI drivers end-to-end (tiny shapes, CPU mesh).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepim_tpu.data.lm6d import LM6DDataset, make_eval_arrays
from deepim_tpu.data.toolkit import gen_procedural_dataset
from deepim_tpu.eval import evaluate_poses, format_table
from deepim_tpu.geometry.symmetry import rot_z_syms
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
from deepim_tpu.refine import build_assets

K_CAM = np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]], np.float32)
H, W = 64, 128


@pytest.fixture(scope="module")
def assets():
    return build_assets([box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05)],
                        sym_transforms=[rot_z_syms(2), None], num_points=64)


def _pose(rx=0.0, tz=0.7):
    c, s = np.cos(rx), np.sin(rx)
    r = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    return np.concatenate([r, [[0.0], [0.0], [tz]]], 1)


def test_evaluate_poses_perfect(assets):
    n = 6
    gt = np.stack([_pose(0.1 * i) for i in range(n)])
    cls = np.asarray([0, 1] * 3, np.int32)
    k = np.tile(K_CAM[None], (n, 1, 1))
    res = evaluate_poses(assets, ["box", "icosphere"], [True, False],
                         gt, gt, cls, k)
    assert res["mean"]["add(-s)_0.1d"] == 100.0
    assert res["mean"]["5deg_5cm"] == 100.0
    assert res["mean"]["proj2d_5px"] == 100.0
    table = format_table(res)
    assert "box" in table and "MEAN" in table


def test_evaluate_poses_symmetric_class(assets):
    """A 180°-rotated pose scores 100% ADD(-S) for the symmetric class but
    ~0% plain ADD (the eval protocol distinction)."""
    from deepim_tpu.geometry.se3 import se3_mul

    gt = np.stack([_pose(0.3)] * 4)
    sym = np.asarray(rot_z_syms(2))[1]
    est = np.asarray(se3_mul(jnp.asarray(gt), jnp.tile(sym, (4, 1, 1))))
    cls = np.zeros(4, np.int32)  # box = symmetric
    k = np.tile(K_CAM[None], (4, 1, 1))
    res = evaluate_poses(assets, ["box", "icosphere"], [True, False],
                         est, gt, cls, k)
    row = res["per_class"]["box"]
    assert row["adds_0.1d"] > 90.0  # nearest-point metric forgives symmetry
    assert row["add_0.1d"] < 50.0  # plain ADD does not
    assert row["add(-s)_0.1d"] == row["adds_0.1d"]  # symmetric class uses ADD-S


def test_evaluate_poses_degrades_with_error(assets):
    n = 8
    gt = np.stack([_pose(0.1 * i) for i in range(n)])
    est = gt.copy()
    est[:, :, 3] += np.array([0.05, 0.05, 0.1])  # big translation error
    cls = np.asarray([1] * n, np.int32)
    k = np.tile(K_CAM[None], (n, 1, 1))
    res = evaluate_poses(assets, ["box", "icosphere"], [False, False],
                         est, gt, cls, k)
    assert res["per_class"]["icosphere"]["add(-s)_0.1d"] < 50.0


def test_evaluate_poses_chunked_matches_whole(assets):
    """Sample chunking + ADD-S point tiling (the bounded-memory eval for
    real-dataset scale) must reproduce the one-shot numbers exactly."""
    rng = np.random.RandomState(3)
    n = 21  # deliberately not a chunk multiple
    gt = np.stack([_pose(0.2 * i, 0.6 + 0.02 * i) for i in range(n)])
    est = gt.copy()
    est[:, :, 3] += rng.uniform(-0.03, 0.03, (n, 3)).astype(np.float32)
    cls = rng.randint(0, 2, n).astype(np.int32)
    k = np.tile(K_CAM[None], (n, 1, 1))
    ref = evaluate_poses(assets, ["box", "icosphere"], [True, False],
                         est, gt, cls, k)
    chunked = evaluate_poses(assets, ["box", "icosphere"], [True, False],
                             est, gt, cls, k, chunk=8, point_block=24)
    for name, row in ref["per_class"].items():
        for key, val in row.items():
            if key == "ci95":
                assert chunked["per_class"][name][key] == val, name
                continue
            assert abs(chunked["per_class"][name][key] - val) < 1e-4, (
                name, key)


# --- LM6d layout ------------------------------------------------------------


@pytest.fixture(scope="module")
def disk_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm6d"))
    return gen_procedural_dataset(root, ["box", "icosphere"], K_CAM, (H, W),
                                  frames_per_obj=6, seed=0)


def test_lm6d_roundtrip(disk_ds):
    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    meshes = ds.load_meshes()
    assert meshes[0].num_faces == 12  # box survives PLY round-trip
    recs = ds.gt_roidb("box", "test")
    assert len(recs) >= 1
    frame = ds.load_frame(recs[0])
    assert frame["obs_rgb"].shape == (H, W, 3)
    assert frame["obs_rgb"].max() <= 1.0
    assert frame["obs_depth"].max() > 0.3  # metric depth present
    assert frame["obs_mask"].sum() > 0
    # depth quantization from uint16 png is sub-mm
    assert recs[0].init_pose is not None


def test_lm6d_eval_arrays_padding(disk_ds):
    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    recs = ds.gt_roidb("box", "test")
    arrs = make_eval_arrays(ds, recs, pad_to=len(recs) + 3)
    assert arrs["obs_rgb"].shape[0] == len(recs) + 3
    assert arrs["num_real"] == len(recs)
    # pose file round-trip is exact in f32
    np.testing.assert_allclose(arrs["pose_gt"][0], recs[0].pose, rtol=1e-6)


def test_iter_frame_batches_matches_eval_arrays(disk_ds):
    """The streaming loader (real-dataset-scale eval path) yields exactly
    the frames make_eval_arrays stacks, padding included, and survives the
    IO-prefetch wrapper."""
    from deepim_tpu.data.lm6d import iter_frame_batches, prefetch_iter

    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    recs = ds.gt_roidb("box", "test") + ds.gt_roidb("icosphere", "test")
    bs = 4
    pad_to = (len(recs) + bs - 1) // bs * bs
    whole = make_eval_arrays(ds, recs, pad_to=pad_to)
    got = list(prefetch_iter(iter_frame_batches(ds, recs, bs, pad_to=pad_to)))
    assert len(got) == pad_to // bs
    for key in ("obs_rgb", "obs_depth", "obs_mask"):
        streamed = np.concatenate([b[key] for b in got])
        np.testing.assert_array_equal(streamed, whole[key])


def test_prefetch_iter_propagates_worker_errors():
    from deepim_tpu.data.lm6d import prefetch_iter

    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch_iter(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        next(it)


def test_gen_rendered_roundtrip(disk_ds):
    """gen_rendered writes perturbed pair renders readable via the layout,
    consistent with the stored src pose (depth median ~ pose z)."""
    from deepim_tpu.data.toolkit import gen_rendered
    from deepim_tpu.raster.mesh import PROCEDURAL_MESHES

    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    meshes = {n: PROCEDURAL_MESHES[n]() for n in ["box", "icosphere"]}
    n = gen_rendered(ds, meshes, K_CAM, (H, W), split="train",
                     per_frame=2, seed=1)
    recs = ds.gt_roidb("box", "train")
    assert n == 2 * 2 * len(recs)  # objects x per_frame x train frames
    rec = recs[0]
    assert ds.has_rendered(rec, 0) and ds.has_rendered(rec, 1)
    r = ds.load_rendered(rec, 1)
    assert r["ren_rgb"].shape == (H, W, 3)
    mask = r["ren_depth"] > 0
    assert mask.sum() > 0
    # perturbed, not the GT pose — and depth consistent with the src pose
    assert np.abs(r["pose_src"] - rec.pose).max() > 1e-4
    z = r["pose_src"][2, 3]
    d = r["ren_depth"][mask]
    assert abs(float(np.median(d)) - z) < 0.12


def test_lm6d_depth_consistency(disk_ds):
    """Written depth pngs decode to the rendered metric depth within 1mm."""
    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    rec = ds.gt_roidb("icosphere", "train")[0]
    frame = ds.load_frame(rec)
    d = frame["obs_depth"][frame["obs_mask"]]
    z = rec.pose[2, 3]
    assert abs(float(np.median(d)) - z) < 0.06  # sphere radius bound


# --- CLI end-to-end ----------------------------------------------------------


@pytest.mark.slow
def test_cli_train_and_test(tmp_path, monkeypatch):
    """Train 6 steps on the synthetic config, checkpoint, then evaluate —
    the reference's deepim_train_test.py flow at toy scale."""
    import yaml

    from deepim_tpu.cli import test as cli_test
    from deepim_tpu.cli import train as cli_train

    cfg = {
        "experiment": "toy",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "train": {"batch_size": 8, "num_steps": 6, "renderer": "xla",
                  "optimizer": "adam", "lr": 1e-4, "log_every": 3,
                  "checkpoint_every": 6, "warmup_steps": 0,
                  "w_flow": 0.0, "w_mask": 0.0},
        "test": {"test_iter": 1, "batch_size": 8, "renderer": "xla"},
    }
    cfg_path = str(tmp_path / "toy.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    assert cli_train.main(["--cfg", cfg_path, "--n-devices", "1"]) == 0
    ckpts = os.listdir(os.path.join(str(tmp_path / "out"), "toy",
                                    "checkpoints"))
    assert len(ckpts) >= 1

    assert cli_test.main(["--cfg", cfg_path, "--num-samples", "8",
                          "--vis", "2", "--save-poses"]) == 0
    poses = np.load(os.path.join(str(tmp_path / "out"), "toy",
                                 "refined_poses.npz"))
    assert poses["traj"].shape == (2, 8, 3, 4)  # K=1: init + 1 iter
    assert poses["pose_gt"].shape == (8, 3, 4)
    from deepim_tpu.eval import read_bop_csv

    bop = read_bop_csv(os.path.join(str(tmp_path / "out"), "toy",
                                    "bop_results.csv"))
    np.testing.assert_allclose(bop["poses"], poses["traj"][-1], atol=1e-6)
    assert os.path.exists(
        os.path.join(str(tmp_path / "out"), "toy", "eval_results.json")
    )
    # --vis: per-iteration rendered-vs-observed overlay montages
    # (reference tester's visualization flags).
    vis_dir = os.path.join(str(tmp_path / "out"), "toy", "vis")
    assert sorted(os.listdir(vis_dir)) == ["sample000.png", "sample001.png"]


@pytest.mark.slow
def test_cli_eval_excludes_padding_and_exports_real_ids(tmp_path, disk_ds):
    """Batch padding rows (repeated last record) must not be counted in
    the eval tables or exported to the BOP CSV; the CSV carries the
    records' real scene/im ids and the configured dataset.obj_ids."""
    import json

    import yaml

    from deepim_tpu.cli import test as cli_test
    from deepim_tpu.data.lm6d import LM6DDataset as DS
    from deepim_tpu.eval.bop_results import read_bop_csv

    ds = DS(disk_ds.root, ["box", "icosphere"])
    records = ds.gt_roidb("box", "test") + ds.gt_roidb("icosphere", "test")
    n_real = len(records)
    bs = 16  # > n_real: the single batch is mostly padding
    assert n_real < bs

    cfg = {
        "experiment": "pad_eval",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "lm6d", "root": disk_ds.root,
                    "objects": ["box", "icosphere"], "obj_ids": [8, 11],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "test": {"test_iter": 1, "batch_size": bs, "renderer": "xla",
                 "init": "posecnn"},
    }
    cfg_path = str(tmp_path / "pad_eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    assert cli_test.main(["--cfg", cfg_path, "--save-poses"]) == 0

    out = os.path.join(str(tmp_path / "out"), "pad_eval")
    with open(os.path.join(out, "eval_results.json")) as f:
        results = json.load(f)
    assert sum(r["n"] for r in results["per_class"].values()) == n_real

    bop = read_bop_csv(os.path.join(out, "bop_results.csv"))
    assert len(bop["poses"]) == n_real  # no duplicate padded estimates
    assert set(bop["obj_ids"]) <= {8, 11}  # configured ids, not idx+1
    assert [int(s) for s in bop["scene_ids"]] == \
        [int(r.scene) for r in records]
    assert [int(im) for im in bop["im_ids"]] == \
        [int(r.frame) for r in records]

    traj = np.load(os.path.join(out, "refined_poses.npz"))
    assert traj["traj"].shape[1] == n_real


@pytest.mark.slow
def test_cli_train_pretrained_init(tmp_path):
    """cfg train.pretrained: a fresh experiment fine-tunes from another
    experiment's checkpoint (the reference's pretrained-FlowNet init)."""
    import yaml

    from deepim_tpu.cli import train as cli_train
    from deepim_tpu.train.checkpoint import restore_params_raw

    base = {
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "train": {"batch_size": 8, "num_steps": 2, "renderer": "xla",
                  "optimizer": "adam", "lr": 1e-4, "log_every": 1,
                  "checkpoint_every": 2, "warmup_steps": 0,
                  "w_flow": 0.0, "w_mask": 0.0},
        "test": {"test_iter": 1, "batch_size": 8, "renderer": "xla"},
    }
    src_cfg = {**base, "experiment": "src"}
    src_path = str(tmp_path / "src.yaml")
    with open(src_path, "w") as f:
        yaml.safe_dump(src_cfg, f)
    assert cli_train.main(["--cfg", src_path, "--n-devices", "1"]) == 0
    src_ckpt = os.path.join(str(tmp_path / "out"), "src", "checkpoints")

    ft_cfg = {**base, "experiment": "ft"}
    ft_cfg["train"] = {**base["train"], "pretrained": src_ckpt,
                       "pretrained_reinit": ["fc_rot"]}
    ft_path = str(tmp_path / "ft.yaml")
    with open(ft_path, "w") as f:
        yaml.safe_dump(ft_cfg, f)
    assert cli_train.main(["--cfg", ft_path, "--n-devices", "1"]) == 0
    # the fine-tuned run trained (its own checkpoint exists and differs
    # from the source init)
    ft_ckpt = os.path.join(str(tmp_path / "out"), "ft", "checkpoints")
    src_params = restore_params_raw(src_ckpt)
    ft_params = restore_params_raw(ft_ckpt)
    a = np.asarray(src_params["params"]["conv2"]["Conv_0"]["kernel"])
    b = np.asarray(ft_params["params"]["conv2"]["Conv_0"]["kernel"])
    assert a.shape == b.shape and np.abs(a - b).max() > 0  # trained on


@pytest.mark.slow
def test_cli_train_on_disk_lm6d(tmp_path, disk_ds):
    """On-disk LM6d training: TrainBatcher frames + real/syn step mix —
    the reference's real-data TrainDataLoader flow at toy scale."""
    import yaml

    from deepim_tpu.cli import test as cli_test
    from deepim_tpu.cli import train as cli_train

    cfg = {
        "experiment": "toy_disk",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "lm6d", "root": disk_ds.root,
                    "objects": ["box", "icosphere"],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "train": {"batch_size": 4, "num_steps": 4, "renderer": "xla",
                  "optimizer": "adam", "lr": 1e-4, "log_every": 2,
                  "checkpoint_every": 4, "warmup_steps": 0,
                  "w_flow": 0.0, "w_mask": 0.0, "syn_fraction": 0.5},
        "test": {"test_iter": 1, "batch_size": 4, "renderer": "xla",
                 "init": "posecnn"},
    }
    cfg_path = str(tmp_path / "toy_disk.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    assert cli_train.main(["--cfg", cfg_path, "--n-devices", "1"]) == 0
    ckpts = os.listdir(os.path.join(str(tmp_path / "out"), "toy_disk",
                                    "checkpoints"))
    assert len(ckpts) >= 1
    assert cli_test.main(["--cfg", cfg_path]) == 0
    assert os.path.exists(
        os.path.join(str(tmp_path / "out"), "toy_disk", "eval_results.json")
    )


def test_train_batcher_epochs(disk_ds):
    from deepim_tpu.data.lm6d import TrainBatcher

    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    b = TrainBatcher(ds, ["box", "icosphere"], batch_size=4, seed=1)
    n = b.num_records
    seen = []
    for _ in range((2 * n) // 4):
        batch = b.next()
        assert batch["obs_rgb"].shape == (4, H, W, 3)
        assert batch["obs_mask"].dtype == np.float32
        seen.append(batch["class_idx"])
    # two epochs worth of draws cover both classes repeatedly
    cls = np.concatenate(seen)
    assert (cls == 0).sum() > 0 and (cls == 1).sum() > 0


@pytest.mark.slow
def test_cli_train_and_test_coarse_to_fine(tmp_path):
    """Mixed-resolution training + coarse-first eval schedule: half the
    train steps run at the coarse crop size through the shared flatten
    head (head_grid), and eval runs iteration 1 coarse / iteration 2 full."""
    import yaml

    from deepim_tpu.cli import test as cli_test
    from deepim_tpu.cli import train as cli_train

    cfg = {
        "experiment": "toy_c2f",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False,
                    "coarse_height": H // 2, "coarse_width": W // 2},
        "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "train": {"batch_size": 8, "num_steps": 4, "renderer": "xla",
                  "optimizer": "adam", "lr": 1e-4, "log_every": 2,
                  "checkpoint_every": 4, "warmup_steps": 0,
                  "w_flow": 0.0, "w_mask": 0.0, "coarse_fraction": 0.5},
        "test": {"test_iter": 2, "coarse_iters": 1, "batch_size": 8,
                 "renderer": "xla"},
    }
    cfg_path = str(tmp_path / "toy_c2f.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    assert cli_train.main(["--cfg", cfg_path, "--n-devices", "1"]) == 0
    assert cli_test.main(["--cfg", cfg_path, "--num-samples", "8"]) == 0
    assert os.path.exists(
        os.path.join(str(tmp_path / "out"), "toy_c2f", "eval_results.json")
    )


@pytest.mark.slow
def test_cli_train_test_combined(tmp_path):
    """The reference's single deepim_train_test.py entry point: one
    command trains, then evaluates the final checkpoint."""
    import yaml

    from deepim_tpu.cli import train_test as cli_train_test

    cfg = {
        "experiment": "toy_tt",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                    "image_height": H, "image_width": W,
                    "fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 32.0,
                    "num_points": 64},
        "train": {"batch_size": 8, "num_steps": 2, "renderer": "xla",
                  "optimizer": "adam", "lr": 1e-4, "log_every": 1,
                  "checkpoint_every": 2, "warmup_steps": 0,
                  "w_flow": 0.0, "w_mask": 0.0},
        "test": {"test_iter": 1, "batch_size": 8, "renderer": "xla"},
    }
    cfg_path = str(tmp_path / "toy_tt.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    assert cli_train_test.main(
        ["--cfg", cfg_path, "--n-devices", "1", "--num-samples", "8"]) == 0
    out = os.path.join(str(tmp_path / "out"), "toy_tt")
    assert os.path.exists(os.path.join(out, "eval_results.json"))
    assert len(os.listdir(os.path.join(out, "checkpoints"))) >= 1


def test_apply_bop_init(disk_ds, tmp_path):
    """External init poses (PoseCNN-style import) from a BOP results CSV
    overwrite matched records by (scene_id, im_id, obj_id)."""
    from deepim_tpu.data.lm6d import apply_bop_init
    from deepim_tpu.eval import write_bop_csv

    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    records = ds.gt_roidb("box", "test") + ds.gt_roidb("icosphere", "test")
    assert len(records) >= 2
    ext = np.stack([_pose(0.5, 0.9), _pose(-0.2, 0.5)])
    targets = [records[0], records[-1]]
    path = str(tmp_path / "init.csv")
    write_bop_csv(
        path, ext,
        obj_ids=np.array([r.class_idx + 1 for r in targets]),
        scene_ids=np.array([int(r.scene) for r in targets]),
        im_ids=np.array([int(r.frame) for r in targets]),
    )
    init = np.stack([r.pose for r in records]).astype(np.float32)
    before = init.copy()
    assert apply_bop_init(records, init, path) == 2
    np.testing.assert_allclose(init[0], ext[0], atol=1e-6)
    np.testing.assert_allclose(init[-1], ext[1], atol=1e-6)
    # unmatched rows untouched
    np.testing.assert_array_equal(init[1:-1], before[1:-1])


def test_apply_bop_init_obj_ids_mapping(disk_ds, tmp_path):
    """Real datasets use non-positional BOP object ids (LINEMOD 'driller'
    is obj 8): apply_bop_init must match via the dataset.obj_ids map, and
    the positional default must NOT match such a CSV."""
    from deepim_tpu.data.lm6d import apply_bop_init
    from deepim_tpu.eval import write_bop_csv

    ds = LM6DDataset(disk_ds.root, ["box", "icosphere"])
    records = ds.gt_roidb("box", "test")[:2]
    obj_ids = [8, 11]  # class_idx 0 -> BOP obj 8 (non-positional)
    ext = np.stack([_pose(0.5, 0.9), _pose(-0.2, 0.5)])
    path = str(tmp_path / "init_mapped.csv")
    write_bop_csv(
        path, ext,
        obj_ids=np.array([8, 8]),
        scene_ids=np.array([int(r.scene) for r in records]),
        im_ids=np.array([int(r.frame) for r in records]),
    )
    init = np.stack([r.pose for r in records]).astype(np.float32)
    # positional default (class_idx+1 = 1) does not match obj 8
    assert apply_bop_init(records, init.copy(), path) == 0
    got = init.copy()
    assert apply_bop_init(records, got, path, obj_ids=obj_ids) == 2
    np.testing.assert_allclose(got, ext, atol=1e-6)

    # an id map shorter than the class set fails fast, not IndexError
    with pytest.raises(ValueError, match="obj_ids"):
        apply_bop_init(records, init.copy(), path, obj_ids=[])


def test_apply_bop_init_keeps_best_scored_duplicate(disk_ds, tmp_path):
    """BOP CSVs may carry several scored estimates per (scene, im, obj);
    the max-score row must win, not whichever is listed last."""
    from deepim_tpu.data.lm6d import apply_bop_init
    from deepim_tpu.eval import write_bop_csv

    ds = LM6DDataset(disk_ds.root, ["box"])
    rec = ds.gt_roidb("box", "test")[0]
    good, bad = _pose(0.5, 0.9), _pose(-0.9, 0.4)
    path = str(tmp_path / "dup.csv")
    # good (score .9) listed FIRST, bad (score .1) last
    write_bop_csv(path, np.stack([good, bad]),
                  obj_ids=np.array([1, 1]),
                  scene_ids=np.array([int(rec.scene)] * 2),
                  im_ids=np.array([int(rec.frame)] * 2),
                  scores=np.array([0.9, 0.1]))
    init = rec.pose[None].astype(np.float32).copy()
    assert apply_bop_init([rec], init, path) == 1
    np.testing.assert_allclose(init[0], good, atol=1e-6)


def test_bop_results_csv_roundtrip(tmp_path):
    """BOP results CSV: write meters-frame poses, read back exactly
    (mm conversion, row-major R)."""
    from deepim_tpu.eval import read_bop_csv, write_bop_csv

    poses = np.stack([_pose(0.2, 0.6), _pose(-0.4, 0.9)])
    path = str(tmp_path / "res.csv")
    n = write_bop_csv(path, poses, obj_ids=np.array([1, 5]),
                      scene_ids=np.array([2, 2]), im_ids=np.array([10, 11]),
                      scores=np.array([0.9, 0.8]), time_s=0.05)
    assert n == 2
    back = read_bop_csv(path)
    np.testing.assert_allclose(back["poses"], poses, atol=1e-6)
    assert back["obj_ids"].tolist() == [1, 5]
    assert back["scene_ids"].tolist() == [2, 2]
    assert back["im_ids"].tolist() == [10, 11]
    np.testing.assert_allclose(back["scores"], [0.9, 0.8], atol=1e-6)
    with open(path) as f:
        assert f.readline().startswith("scene_id,im_id,obj_id,score,R,t")


def test_wilson_ci_behaviour():
    from deepim_tpu.eval.evaluator import ci_halfwidth, wilson_ci

    # n=512 at 76%: the round-3 A/B noise floor the tables must expose.
    hw = ci_halfwidth(76.0, 512)
    assert 3.0 < hw < 4.5
    # Wilson stays sane at the boundaries (normal approx would say ±0).
    assert ci_halfwidth(100.0, 64) > 4.0
    lo, hi = wilson_ci(0.0, 100)
    assert lo == 0.0 and 0 < hi < 5.0
    # Quadrupling n roughly halves the interval.
    assert ci_halfwidth(76.0, 2048) < 0.55 * ci_halfwidth(76.0, 512)


def test_eval_tables_carry_ci(assets):
    gt = np.stack([_pose(0.1 * i) for i in range(8)])
    k = np.tile(K_CAM[None], (8, 1, 1))
    cls = np.asarray([0, 1] * 4, np.int32)
    res = evaluate_poses(assets, ["box", "icosphere"], [True, False],
                         gt, gt, cls, k)
    for row in list(res["per_class"].values()) + [res["mean"]]:
        ci = row["ci95"]
        assert set(ci) == {"add(-s)_0.1d", "add_0.1d", "adds_0.1d",
                           "5deg_5cm", "proj2d_5px"}
        assert all(v >= 0 for v in ci.values())
    # 100% at n=4 must NOT read as certain.
    assert res["per_class"]["box"]["ci95"]["add(-s)_0.1d"] > 10.0
    txt = format_table(res)
    assert "±" in txt
