"""Asset-day runbook tests (tools/real_data_runbook.py).

The runbook is insurance for the day real LINEMOD/YCB assets are
mounted: one command must take any recognized drop through
detect -> convert -> validate -> eval config.  CI exercises it on
procedural stand-ins so zero plumbing is left for asset day
(round-3 VERDICT #8).
"""

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepim_tpu.data.toolkit import gen_procedural_dataset  # noqa: E402
from tools.real_data_runbook import detect_release, main  # noqa: E402
from tests.test_lm_original import _write_original_object  # noqa: E402

K_CAM = np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]], np.float32)


def _converted_root(tmp_path):
    root = str(tmp_path / "drop")
    gen_procedural_dataset(root, ["box", "icosphere"], K_CAM, (64, 128),
                           frames_per_obj=3, seed=0)
    return root


def test_detect_release_layouts(tmp_path):
    # converted LM6d
    conv = _converted_root(tmp_path)
    assert detect_release(conv) == "lm6d"
    # original ACCV'12 LINEMOD
    orig = str(tmp_path / "accv")
    _write_original_object(orig, "cat")
    assert detect_release(orig) == "lm_original"
    # original YCB release (landmarks only)
    ycb = str(tmp_path / "ycb")
    os.makedirs(os.path.join(ycb, "data", "0000"))
    os.makedirs(os.path.join(ycb, "image_sets"))
    open(os.path.join(ycb, "data", "0000", "000001-color.png"), "wb").close()
    assert detect_release(ycb) == "ycb_original"
    # converted video layout
    vid = str(tmp_path / "vid")
    os.makedirs(os.path.join(vid, "video_sets"))
    assert detect_release(vid) == "ycb_video"


def test_runbook_dry_run_on_converted_drop(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)  # output/ lands in the tmp dir
    root = _converted_root(tmp_path)
    rc = main([root, "--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "detected layout: lm6d" in out
    assert "already converted" in out
    assert "--no-refine" in out  # no checkpoint -> baseline eval planned
    cfg_path = os.path.join("output", "real_data_runbook", "config.yaml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    assert cfg["dataset"]["objects"] == ["box", "icosphere"]
    assert cfg["dataset"]["root"] == root
    assert cfg["dataset"]["name"] == "lm6d"


def test_runbook_converts_original_release(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    root = str(tmp_path / "accv")
    _write_original_object(root, "cat", n_frames=2)
    rc = main([root, "--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "detected layout: lm_original" in out
    assert os.path.isdir(root + "_converted")
    cfg_path = os.path.join("output", "real_data_runbook", "config.yaml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    assert cfg["dataset"]["objects"] == ["cat"]


def test_runbook_stops_on_validation_error(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    root = _converted_root(tmp_path)
    # Corrupt every pose file the validator samples: meters -> "mm".
    obs = os.path.join(root, "data", "observed")
    for scene in os.listdir(obs):
        sd = os.path.join(obs, scene)
        for fn in os.listdir(sd):
            if "-pose_" in fn and fn.endswith(".txt"):
                pose = np.loadtxt(os.path.join(sd, fn)).reshape(3, 4)
                pose[:, 3] *= 1000.0
                np.savetxt(os.path.join(sd, fn), pose)
    rc = main([root, "--dry-run"])
    assert rc == 2
    assert "stopping" in capsys.readouterr().out


def test_runbook_weights_overlay_dry_run(tmp_path, capsys, monkeypatch):
    """The --weights leg: a reference-style .npz dump must convert, save as
    a restorable checkpoint, and flip the planned eval off --no-refine —
    exercised in CI so asset day's *weights* path has zero untested
    plumbing (round-4 VERDICT #8)."""
    monkeypatch.chdir(tmp_path)
    root = _converted_root(tmp_path)

    # Small base config so the model init stays CI-cheap.
    mini_cfg = str(tmp_path / "mini.yaml")
    with open(mini_cfg, "w") as f:
        yaml.safe_dump({
            "experiment": "mini",
            "network": {"input_height": 64, "input_width": 128},
            "dataset": {"num_points": 32},
        }, f)

    import jax

    from deepim_tpu.config import update_config
    from deepim_tpu.config.config import config_from_dict
    from deepim_tpu.train import init_state, make_model
    from deepim_tpu.train.convert_mxnet import export_flax_to_mxnet_npz

    cfg = config_from_dict(
        {"dataset": {"objects": ["box", "icosphere"], "root": root,
                     "name": "lm6d"}},
        base=update_config(mini_cfg))
    model = make_model(cfg, 2)
    state = init_state(cfg, model, jax.random.PRNGKey(1))
    npz = str(tmp_path / "ref_dump.npz")
    export_flax_to_mxnet_npz(state.params, npz)

    rc = main([root, "--cfg", mini_cfg, "--weights", npz, "--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "converted weights ->" in out
    assert "--no-refine" not in out  # checkpoint present -> refined eval

    from deepim_tpu.train.checkpoint import latest_step

    ckpt_dir = os.path.join("output", "real_data_runbook", "checkpoints")
    assert latest_step(ckpt_dir) is not None
