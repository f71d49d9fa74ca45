"""Tests: multi-object scene render, occlusion batches, video propagation,
MXNet weight-converter round-trip.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepim_tpu.data.synthetic import synthetic_occlusion_batch
from deepim_tpu.models import DeepIMFlowNet
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
from deepim_tpu.refine import build_assets, gather_class
from deepim_tpu.refine.refiner import render_crops, render_scene
from deepim_tpu.refine.video import refine_video

H, W = 64, 128
K_CAM = jnp.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]])


@pytest.fixture(scope="module")
def assets():
    # Box large enough that a nearer sphere occludes only its center.
    return build_assets([box_mesh((0.3, 0.3, 0.06)), icosphere_mesh(0.05)],
                        num_points=64)


def _pose(tz=0.7, tx=0.0, ty=0.0):
    return jnp.asarray(
        np.concatenate([np.eye(3), [[tx], [ty], [tz]]], 1), jnp.float32
    )


def test_render_scene_occlusion(assets):
    """Two objects at different depths: the nearer one wins the z-test."""
    cls = jnp.array([[0, 1]])
    # sphere centered in front of the box (same line of sight)
    poses = jnp.stack([_pose(tz=0.9), _pose(tz=0.6)])[None]
    valid = jnp.ones((1, 2), bool)
    ks = K_CAM[None]
    rgb, depth = render_scene(assets, cls, poses, valid, ks, (H, W),
                              interpret=True)
    assert rgb.shape == (1, H, W, 3) and depth.shape == (1, H, W)
    # center pixel shows the sphere depth (~0.55, its near surface)
    c = depth[0, H // 2, W // 2]
    assert 0.5 < float(c) < 0.62, float(c)
    # box is still visible around the sphere (depth ~0.87 ring)
    ring = np.asarray(depth[0])
    assert ((ring > 0.8) & (ring < 0.92)).sum() > 20


def test_render_scene_valid_mask(assets):
    """Invalid slots render nothing."""
    cls = jnp.array([[0, 1]])
    poses = jnp.stack([_pose(tz=0.9), _pose(tz=0.6)])[None]
    ks = K_CAM[None]
    _, d_all = render_scene(assets, cls, poses, jnp.ones((1, 2), bool),
                            ks, (H, W), interpret=True)
    _, d_one = render_scene(assets, cls, poses,
                            jnp.array([[True, False]]), ks, (H, W),
                            interpret=True)
    # without the sphere, center shows the box depth
    assert float(d_one[0, H // 2, W // 2]) > 0.8
    assert float(d_all[0, H // 2, W // 2]) < 0.65


@pytest.mark.slow
def test_synthetic_occlusion_batch(assets):
    batch = synthetic_occlusion_batch(
        jax.random.PRNGKey(0), assets, 4, K_CAM, (H, W),
        num_distractors=2, renderer="xla",
    )
    assert batch["obs_rgb"].shape == (4, H, W, 3)
    vf = np.asarray(batch["visible_frac"])
    assert (vf >= 0).all() and (vf <= 1.0 + 1e-6).all()
    # distractors occlude at least one target partially in expectation
    assert vf.min() < 0.999
    # visible mask never exceeds the target's full silhouette
    ab = gather_class(assets, batch["class_idx"])
    _, tgt_depth = render_crops(
        ab, batch["pose_tgt"], batch["k"], (H, W), "xla"
    )
    assert not np.any(np.asarray(batch["obs_mask"]) & ~(np.asarray(tgt_depth) > 0))


def test_refine_video_shapes(assets):
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    T, B = 3, 2
    frames = jax.random.uniform(jax.random.PRNGKey(1), (T, B, 96, 160, 3))
    init = jnp.stack([_pose(0.7), _pose(0.8, tx=0.05)])
    k = jnp.tile(K_CAM[None], (B, 1, 1))
    out = refine_video(variables, model, assets, frames, init, k,
                       jnp.array([0, 1]), iters_first=2, iters_rest=1,
                       out_size=(H, W), renderer="xla")
    assert out.shape == (T, B, 3, 4)
    # identity-init net -> all frames keep the init pose
    np.testing.assert_allclose(out[0], init, atol=1e-5)
    np.testing.assert_allclose(out[-1], init, atol=1e-5)


def test_refine_video_shared_frames_matches_replicated(assets):
    """(T, H, W, 3) shared frames (the memory-bounded tracking path) give
    bit-identical trajectories to the explicit (T, B, ...) replication."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    T, B = 3, 2
    shared = jax.random.uniform(jax.random.PRNGKey(2), (T, 96, 160, 3))
    init = jnp.stack([_pose(0.7), _pose(0.8, tx=0.05)])
    k = jnp.tile(K_CAM[None], (B, 1, 1))
    cls = jnp.array([0, 1])
    out_rep = refine_video(variables, model, assets,
                           jnp.broadcast_to(shared[:, None],
                                            (T, B, 96, 160, 3)),
                           init, k, cls, iters_first=2, iters_rest=1,
                           out_size=(H, W), renderer="xla")
    out_shared = refine_video(variables, model, assets, shared, init, k,
                              cls, iters_first=2, iters_rest=1,
                              out_size=(H, W), renderer="xla")
    np.testing.assert_array_equal(np.asarray(out_shared),
                                  np.asarray(out_rep))


@pytest.mark.slow
def test_refine_video_obs_depth_plumbed(assets):
    """input_depth tracking consumes the per-frame observed depth stream
    (not the rendered fallback): different depths -> different outputs."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False,
                          input_depth=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 8)))
    # non-identity head weights so the depth channel can influence output
    variables = jax.tree.map(
        lambda p: p + 0.01 * jnp.arange(p.size, dtype=p.dtype
                                        ).reshape(p.shape) / p.size,
        variables)
    T, B = 2, 2
    frames = jax.random.uniform(jax.random.PRNGKey(1), (T, B, 96, 160, 3))
    init = jnp.stack([_pose(0.7), _pose(0.8, tx=0.05)])
    k = jnp.tile(K_CAM[None], (B, 1, 1))
    depths_a = jnp.full((T, B, 96, 160), 0.7)
    depths_b = jnp.full((T, B, 96, 160), 1.4)
    out_a = refine_video(variables, model, assets, frames, init, k,
                         jnp.array([0, 1]), iters_first=1, iters_rest=1,
                         out_size=(H, W), renderer="xla",
                         obs_depths=depths_a)
    out_b = refine_video(variables, model, assets, frames, init, k,
                         jnp.array([0, 1]), iters_first=1, iters_rest=1,
                         out_size=(H, W), renderer="xla",
                         obs_depths=depths_b)
    assert out_a.shape == (T, B, 3, 4)
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-7


@pytest.mark.slow
def test_mxnet_converter_roundtrip():
    from deepim_tpu.train.convert_mxnet import (
        convert_mxnet_dict, export_flax_to_mxnet_npz, load_mxnet_npz,
    )
    import tempfile, os

    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32, fc_dim=32)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, H, W, 6)))
    params = jax.tree.map(np.asarray, variables["params"])

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ref.npz")
        export_flax_to_mxnet_npz(params, path)
        mx = load_mxnet_npz(path)
        assert "arg:conv1_weight" in mx
        assert mx["arg:conv1_weight"].shape[0] == 64  # OIHW out-channels

        # fresh init -> overlay -> must equal the original params
        variables2 = model.init(jax.random.PRNGKey(99),
                                jnp.zeros((1, H, W, 6)))
        params2 = jax.tree.map(np.asarray, variables2["params"])
        converted, missing = convert_mxnet_dict(mx, params2)
        # mask head layers have no mxnet names mapped -> may be missing
        for name in ("conv1", "fc1", "fc_rot", "deconv5",
                     "upsample_flow6to5", "predict_flow2"):
            assert name not in [m.split()[0] for m in missing]
        got = converted["conv1"]
        want = params["conv1"]
        leaf_g = got[next(iter(got))] if "kernel" not in got else got
        leaf_w = want[next(iter(want))] if "kernel" not in want else want
        np.testing.assert_allclose(leaf_g["kernel"], leaf_w["kernel"],
                                   atol=1e-6)
        np.testing.assert_allclose(
            converted["fc_rot"]["kernel"], params["fc_rot"]["kernel"],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            converted["deconv5"][next(iter(converted["deconv5"]))]["kernel"]
            if "kernel" not in converted["deconv5"] else
            converted["deconv5"]["kernel"],
            params["deconv5"][next(iter(params["deconv5"]))]["kernel"]
            if "kernel" not in params["deconv5"] else
            params["deconv5"]["kernel"],
            atol=1e-6,
        )


def test_quat_slerp():
    from deepim_tpu.geometry.rotations import (
        axangle2quat, quat_slerp, quat2mat, rotation_angle,
    )

    axis = jnp.array([0.0, 0.0, 1.0])
    q0 = axangle2quat(axis, jnp.float32(0.0))
    q1 = axangle2quat(axis, jnp.float32(1.0))  # 1 rad about z
    qm = quat_slerp(q0, q1, jnp.float32(0.5))
    ang = rotation_angle(quat2mat(qm))
    np.testing.assert_allclose(float(ang), 0.5, atol=1e-5)
    # endpoint and sign handling
    np.testing.assert_allclose(
        np.asarray(quat_slerp(q0, -q1, jnp.float32(1.0))),
        np.asarray(q1), atol=1e-5,
    )


def test_video_dataset_roundtrip(tmp_path):
    from deepim_tpu.data.video import VideoDataset, gen_video
    from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh

    k = np.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]], np.float32)
    root = str(tmp_path / "vid")
    gen_video(root, {"box": box_mesh((0.3, 0.3, 0.06)),
                     "icosphere": icosphere_mesh(0.05)},
              k, (H, W), num_frames=4, renderer="xla")
    ds = VideoDataset(root, ["box", "icosphere"])
    assert ds.sequences() == ["0000"]
    data = ds.load_sequence("0000")
    assert data["frames"].shape == (4, H, W, 3)
    assert data["poses"].shape == (4, 2, 3, 4)
    # poses move smoothly over the sequence
    step = np.linalg.norm(
        data["poses"][1:, :, :, 3] - data["poses"][:-1, :, :, 3], axis=-1
    )
    assert (step < 0.1).all()
    inits = ds.init_poses("0000")
    assert inits.shape == (2, 3, 4)
    # generated sequences carry depth AND a slot-convention label stream
    assert data["depths"].shape == (4, H, W)
    assert data["labels"].shape == (4, H, W)
    assert set(np.unique(data["labels"])) <= {0, 1, 2}
    # label pixels are exactly the rendered (depth-hit) pixels
    np.testing.assert_array_equal(data["labels"] > 0, data["depths"] > 0)
    # lazy loading: skipped streams come back None
    lazy = ds.load_sequence("0000", with_depths=False, with_labels=False)
    assert lazy["depths"] is None and lazy["labels"] is None


def test_video_label_stream_roundtrip(tmp_path):
    """Sequences written with a label stream load it back; pixel value =
    1 + object slot (the convention cli/track derives obs masks from)."""
    from deepim_tpu.data.video import VideoDataset

    ds = VideoDataset(str(tmp_path / "v"), ["box", "icosphere"])
    T = 2
    rgbs = np.zeros((T, H, W, 3), np.float32)
    depths = np.zeros((T, H, W), np.float32)
    labels = np.zeros((T, H, W), np.uint8)
    labels[:, :10, :10] = 1  # object slot 0
    labels[:, 20:30, 20:30] = 2  # object slot 1
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (T, 2, 1, 1))
    ds.write_sequence("0000", [f"{t:06d}" for t in range(T)],
                      ["box", "icosphere"], rgbs, depths, poses,
                      poses[0], labels=labels)
    data = ds.load_sequence("0000")
    np.testing.assert_array_equal(data["labels"], labels)


@pytest.mark.slow
def test_cli_track_end_to_end(tmp_path):
    import yaml

    from deepim_tpu.cli import track as cli_track

    cfg = {
        "experiment": "trk",
        "output_dir": str(tmp_path / "out"),
        "network": {"input_height": H, "input_width": W, "dtype": "float32",
                    "fc_dim": 32, "with_flow": False, "with_mask": False},
        "dataset": {"name": "synthetic", "objects": ["box", "icosphere"],
                    "image_height": 96, "image_width": 160,
                    "fx": 120.0, "fy": 120.0, "cx": 80.0, "cy": 48.0,
                    "num_points": 64},
        "train": {"batch_size": 8, "renderer": "xla"},
        "test": {"test_iter": 1, "renderer": "xla"},
    }
    cfg_path = str(tmp_path / "trk.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    rc = cli_track.main(["--cfg", cfg_path, "--num-frames", "3",
                         "--iters-first", "1", "--iters-rest", "1"])
    assert rc == 0
    results_path = str(tmp_path / "out" / "trk" / "track_results.json")
    assert os.path.exists(results_path)
    with open(results_path) as f:
        whole = json.load(f)

    # windowed streaming (--window 2 over 3 frames: a boundary crossing)
    # must reproduce the single-window trajectory metrics exactly — the
    # pose carries across windows, frame-0 budget only on frame 0.
    rc = cli_track.main(["--cfg", cfg_path, "--num-frames", "3",
                         "--iters-first", "1", "--iters-rest", "1",
                         "--window", "2"])
    assert rc == 0
    with open(results_path) as f:
        windowed = json.load(f)
    assert windowed["mean"] == whole["mean"]


@pytest.mark.slow
def test_refine_video_lost_track_recovery(assets):
    """Confidence-gated re-acquisition (round-3 VERDICT #7): with an
    identity refiner, plain propagation keeps a broken init forever;
    armed recovery must (a) leave healthy tracks bit-identical, (b) only
    ever improve the agreement score, and (c) actually pull a grossly
    broken track closer to GT on a static scene."""
    from deepim_tpu.refine.hypotheses import score_poses

    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    T, B = 3, 1
    cls = jnp.array([1])  # icosphere
    gt = _pose(0.7)[None]
    k = jnp.tile(K_CAM[None], (B, 1, 1))
    ab = gather_class(assets, cls)
    frame, fdepth = render_crops(ab, gt, k, (H, W), "xla")
    frames = jnp.broadcast_to(frame[0][None], (T, H, W, 3))
    # depth stream: the zoom crop normalizes object scale, so the RGB
    # score alone is z-ambiguous; depth anchors the recovery in z
    depths = jnp.broadcast_to(fdepth[0][None], (T, H, W))

    bad = _pose(0.7, tx=0.06, ty=0.03)[None]
    sc_gt = float(score_poses(ab, frame, gt, k, (H, W), "xla",
                              obs_depth=fdepth)[0])
    sc_bad = float(score_poses(ab, frame, bad, k, (H, W), "xla",
                               obs_depth=fdepth)[0])
    assert sc_bad < sc_gt  # the broken pose is detectably worse
    thresh = 0.5 * (sc_gt + sc_bad)

    common = dict(iters_first=1, iters_rest=1, out_size=(H, W),
                  renderer="xla", obs_depths=depths)
    # (a) healthy track: armed == disarmed, bit-identical
    plain = refine_video(variables, model, assets, frames, gt, k, cls,
                         **common)
    armed, sc = refine_video(variables, model, assets, frames, gt, k, cls,
                             recover_threshold=thresh,
                             key=jax.random.PRNGKey(3), **common)
    assert armed.shape == (T, B, 3, 4) and sc.shape == (T, B)
    np.testing.assert_array_equal(np.asarray(armed), np.asarray(plain))
    assert np.all(np.asarray(sc) >= thresh)

    # (b)+(c) broken track: identity net never recovers on its own...
    lost = refine_video(variables, model, assets, frames, bad, k, cls,
                        **common)
    np.testing.assert_allclose(np.asarray(lost[-1]), np.asarray(bad),
                               atol=1e-5)
    # ...armed recovery improves the score monotonically vs the stuck
    # track and lands measurably closer to GT
    rec, sc_rec = refine_video(variables, model, assets, frames, bad, k,
                               cls, recover_threshold=thresh,
                               recover_hypotheses=16, recover_iters=1,
                               # margin 0: this asserts the re-seed
                               # MECHANISM moves the score at all with an
                               # identity net, whose improvements are
                               # sub-margin by construction; the default
                               # margin's job (reject symmetry-equivalent
                               # score-noise winners) is a protocol-level
                               # property (README occluded-tracking row)
                               recover_margin=0.0,
                               key=jax.random.PRNGKey(4), **common)
    assert float(sc_rec[-1, 0]) > sc_bad
    err_lost = float(jnp.linalg.norm(lost[-1, 0, :, 3] - gt[0, :, 3]))
    err_rec = float(jnp.linalg.norm(rec[-1, 0, :, 3] - gt[0, :, 3]))
    assert err_rec < err_lost
