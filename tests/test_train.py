"""Training-layer tests: config overlay, pair synthesis, train step
(single + 8-device sharded), checkpoint round-trip, and a micro-overfit.

Distributed contract (SURVEY.md §4): the sharded step on the 8-device CPU
mesh must match the unsharded step bit-for-bit-ish (same global batch, f32).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepim_tpu.config import Config, config_from_dict
from deepim_tpu.data import perturb_poses, sample_poses_in_frustum, synthetic_batch
from deepim_tpu.parallel import make_mesh, DATA_AXIS
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
from deepim_tpu.refine import build_assets
from deepim_tpu.train import (
    compute_losses,
    init_state,
    make_model,
    make_synthetic_train_step,
    make_train_step,
)

H, W = 64, 128
K_CAM = jnp.array([[120.0, 0, 64], [0, 120.0, 32], [0, 0, 1]])


def tiny_cfg(**train_overrides):
    return config_from_dict(
        {
            "network": {"input_height": H, "input_width": W,
                        "dtype": "float32", "fc_dim": 64},
            "dataset": {"image_height": H, "image_width": W,
                        "objects": ("box", "icosphere")},
            "train": {"batch_size": 8, "renderer": "xla",
                      "warmup_steps": 0, "lr": 1e-3,
                      **train_overrides},
        }
    )


@pytest.fixture(scope="module")
def assets():
    return build_assets([box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05)],
                        num_points=64)


# --- config ----------------------------------------------------------------


def test_config_yaml_roundtrip(tmp_path):
    from deepim_tpu.config import save_config, update_config

    cfg = tiny_cfg()
    p = tmp_path / "exp.yaml"
    save_config(cfg, str(p))
    cfg2 = update_config(str(p))
    assert cfg2 == cfg


def test_config_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_dict({"train": {"not_a_key": 1}})


def test_config_defaults_match_reference_semantics():
    cfg = Config()
    assert cfg.test.test_iter == 4  # reference cfg.TEST.test_iter
    assert cfg.network.rot_type == "quat"
    assert cfg.train.optimizer == "sgd"


def test_all_shipped_experiment_cfgs_load():
    """Every YAML under experiments/cfgs (incl. the generated per-class
    LINEMOD/occ/YCB tree) must parse against the config schema."""
    import glob
    import os

    from deepim_tpu.config import update_config

    root = os.path.join(os.path.dirname(__file__), "..", "experiments",
                        "cfgs")
    paths = sorted(glob.glob(os.path.join(root, "**", "*.yaml"),
                             recursive=True))
    assert len(paths) >= 25  # 12 protocol cfgs + 15 generated lm6d/ycb
    for p in paths:
        cfg = update_config(p)
        assert cfg.experiment, p
        assert cfg.test.test_iter >= 1, p


# --- pair sampling ----------------------------------------------------------


def test_sample_poses_in_frustum():
    poses = sample_poses_in_frustum(jax.random.PRNGKey(0), 64, K_CAM, (H, W))
    assert poses.shape == (64, 3, 4)
    # all centers project inside the image
    t = poses[..., 3]
    u = K_CAM[0, 0] * t[:, 0] / t[:, 2] + K_CAM[0, 2]
    v = K_CAM[1, 1] * t[:, 1] / t[:, 2] + K_CAM[1, 2]
    assert (u >= 0).all() and (u <= W).all()
    assert (v >= 0).all() and (v <= H).all()
    # rotations are orthonormal
    r = poses[..., :3]
    eye = jnp.matmul(r, jnp.swapaxes(r, -1, -2))
    np.testing.assert_allclose(eye, jnp.tile(jnp.eye(3), (64, 1, 1)), atol=1e-5)


def test_perturb_poses_bounded():
    from deepim_tpu.geometry import rot_error_deg, trans_error

    poses = sample_poses_in_frustum(jax.random.PRNGKey(1), 128, K_CAM, (H, W))
    noisy = perturb_poses(jax.random.PRNGKey(2), poses, 10.0, 30.0,
                          (0.01, 0.01, 0.05), (0.02, 0.02, 0.10))
    rerr = rot_error_deg(noisy, poses)
    terr = trans_error(noisy, poses)
    assert float(rerr.max()) <= 3 * 30.0 + 1e-3  # 3 clipped axes compose
    assert float(rerr.mean()) > 2.0  # actually perturbs
    assert float(terr.max()) <= np.linalg.norm([0.02, 0.02, 0.10]) + 1e-5


def test_synthetic_batch_contents(assets):
    batch = synthetic_batch(jax.random.PRNGKey(0), assets, 4, K_CAM, (H, W),
                            renderer="xla")
    assert batch["obs_rgb"].shape == (4, H, W, 3)
    assert batch["obs_depth"].shape == (4, H, W)
    assert batch["class_idx"].shape == (4,)
    # every sample has some object pixels and a noise background
    fg = np.asarray(batch["obs_mask"]).reshape(4, -1).mean(-1)
    assert (fg > 0.001).all() and (fg < 0.9).all()


# --- train step --------------------------------------------------------------


@pytest.mark.slow
def test_compute_losses_finite(assets):
    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 4, K_CAM, (H, W),
                            renderer="xla")
    loss, metrics = compute_losses(state.params, model, assets, batch, cfg)
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert "pm_loss_0" in metrics and "flow_loss_0" in metrics


@pytest.mark.slow
def test_separate_pose_loss(assets):
    """train.pose_loss=separate: direct L1 on the untangled delta (the
    reference's alternative loss wiring) is finite and carries gradient."""
    cfg = tiny_cfg(pose_loss="separate", w_flow=0.0, w_mask=0.0)
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 4, K_CAM, (H, W),
                            renderer="xla")

    def loss_fn(params):
        return compute_losses(params, model, assets, batch, cfg)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    assert np.isfinite(float(loss))
    assert "rot_loss_0" in metrics and "trans_loss_0" in metrics
    assert "pm_loss_0" not in metrics
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_sym_aware_pm_toggle():
    """train.sym_aware_pm=False switches the PM loss to the exact-pose
    target: a symmetry-flipped target is forgiven by the sym-aware loss
    but penalized by the exact one (the color-locking fine-tune knob)."""
    from deepim_tpu.geometry.se3 import se3_mul
    from deepim_tpu.geometry.symmetry import rot_z_syms

    assets_s = build_assets(
        [box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05)],
        sym_transforms=[rot_z_syms(2), None], num_points=64,
    )
    cfg_sym = tiny_cfg()
    cfg_exact = tiny_cfg(sym_aware_pm=False)
    assert cfg_sym.train.sym_aware_pm and not cfg_exact.train.sym_aware_pm
    model = make_model(cfg_sym, assets_s.num_classes)
    state = init_state(cfg_sym, model, jax.random.PRNGKey(0))
    batch = dict(synthetic_batch(jax.random.PRNGKey(1), assets_s, 4, K_CAM,
                                 (H, W), renderer="xla"))
    batch["class_idx"] = jnp.zeros_like(batch["class_idx"])  # symmetric box
    sym = jnp.asarray(rot_z_syms(2))[1]
    batch["pose_tgt"] = se3_mul(batch["pose_tgt"], jnp.tile(sym[None], (4, 1, 1)))

    _, m_sym = compute_losses(state.params, model, assets_s, batch, cfg_sym)
    _, m_exact = compute_losses(state.params, model, assets_s, batch,
                                cfg_exact)
    assert float(m_sym["pm_loss_0"]) < float(m_exact["pm_loss_0"])


def test_input_mask_8ch(assets):
    # Reference 8-channel cfg: RGB pair + rendered/observed masks.
    cfg = tiny_cfg()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, network=dataclasses.replace(cfg.network, input_mask=True)
    )
    model = make_model(cfg, assets.num_classes)
    assert model.input_mask
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 4, K_CAM, (H, W),
                            renderer="xla")
    loss, metrics = compute_losses(state.params, model, assets, batch, cfg)
    assert np.isfinite(float(loss))

    # Refine loop: with and without an observed mask input.
    from deepim_tpu.refine import refine_poses

    poses = refine_poses(
        state.params, model, assets, batch["obs_rgb"], batch["pose_src"],
        batch["k"], batch["class_idx"], num_iters=2, out_size=(H, W),
        renderer="xla",
    )
    assert poses.shape == batch["pose_src"].shape
    poses_m = refine_poses(
        state.params, model, assets, batch["obs_rgb"], batch["pose_src"],
        batch["k"], batch["class_idx"], num_iters=2, out_size=(H, W),
        renderer="xla", obs_mask=batch["obs_mask"],
    )
    assert np.isfinite(np.asarray(poses_m)).all()


def test_input_depth_10ch(assets):
    """Reference INPUT_DEPTH cfg: RGB pair + masks absent + rendered/
    observed depth channels (here 8 ch total), train + refine paths."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, network=dataclasses.replace(cfg.network, input_depth=True)
    )
    model = make_model(cfg, assets.num_classes)
    assert model.input_depth and not model.input_mask
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 4, K_CAM, (H, W),
                            renderer="xla")
    loss, _ = compute_losses(state.params, model, assets, batch, cfg)
    assert np.isfinite(float(loss))

    from deepim_tpu.refine import refine_poses

    # fc_rot/fc_trans are zero-init (identity delta at init), so nudge all
    # params so the pose output actually depends on the input channels.
    params = jax.tree.map(lambda p: p + 0.01, state.params)
    # with an observed depth frame, and with the rendered-depth fallback
    poses_d = refine_poses(
        params, model, assets, batch["obs_rgb"], batch["pose_src"],
        batch["k"], batch["class_idx"], num_iters=2, out_size=(H, W),
        renderer="xla", obs_depth=batch["obs_depth"],
    )
    assert np.isfinite(np.asarray(poses_d)).all()
    poses_f = refine_poses(
        params, model, assets, batch["obs_rgb"], batch["pose_src"],
        batch["k"], batch["class_idx"], num_iters=2, out_size=(H, W),
        renderer="xla",
    )
    assert np.isfinite(np.asarray(poses_f)).all()
    # the observed-depth channel carries signal: outputs differ between
    # the real observed depth and the rendered-depth fallback
    assert np.abs(np.asarray(poses_d) - np.asarray(poses_f)).max() > 1e-7


def test_normalize_depth():
    from deepim_tpu.models.flownet import normalize_depth

    d = jnp.array([[[0.0, 0.5], [1.0, 2.0]]])  # (1, 2, 2)
    z = jnp.array([1.0])
    out = np.asarray(normalize_depth(d, z))
    assert out.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(out[0, :, :, 0],
                               [[0.0, -0.5], [0.0, 1.0]], atol=1e-6)


@pytest.mark.slow
def test_train_step_and_iterative(assets):
    cfg = tiny_cfg(train_iter=2)
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(model, assets, cfg)
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 8, K_CAM, (H, W),
                            renderer="xla")
    # the step donates its input state — fingerprint params before calling
    before = [np.asarray(x).copy() for x in jax.tree.leaves(state.params)]
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    assert "pm_loss_1" in metrics  # second training iteration ran
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    after = [np.asarray(x) for x in jax.tree.leaves(state2.params)]
    assert sum(float(np.abs(a - b).sum()) for a, b in zip(before, after)) > 0


@pytest.mark.slow
@pytest.mark.dist
def test_sharded_step_matches_single(assets):
    """8-way DP on the CPU mesh == single-device step on the same batch."""
    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    batch = synthetic_batch(jax.random.PRNGKey(3), assets, 8, K_CAM, (H, W),
                            renderer="xla")

    step_1 = make_train_step(model, assets, cfg)
    mesh = make_mesh(n_data=8)
    step_8 = make_train_step(model, assets, cfg, mesh=mesh)

    s1, m1 = step_1(state, batch)
    state_r = init_state(cfg, model, jax.random.PRNGKey(0))
    s8, m8 = step_8(state_r, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    leaves1 = jax.tree.leaves(s1.params)
    leaves8 = jax.tree.leaves(s8.params)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
@pytest.mark.dist
def test_synthetic_train_step_sharded(assets):
    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    step = make_synthetic_train_step(model, assets, cfg, K_CAM, mesh=mesh)
    state, metrics = step(state, jax.random.PRNGKey(7))
    assert int(state.step) == 1 and np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(assets, tmp_path):
    from deepim_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(model, assets, cfg)
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 8, K_CAM, (H, W),
                            renderer="xla")
    state, _ = step(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), state)
    template = init_state(cfg, model, jax.random.PRNGKey(0))
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrained_partial_init(assets, tmp_path):
    """Reference pretrained-FlowNet workflow: load a source checkpoint's
    params into a DIFFERENT model — matching shapes load, a wider conv1
    (RGB -> RGB-D) loads the overlapping input-channel slice, mismatched
    heads and reinit-listed params keep their fresh init."""
    import dataclasses

    from deepim_tpu.train.checkpoint import (
        merge_pretrained, restore_params_raw, save_checkpoint,
    )

    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    # make the source params distinguishable from any fresh init
    src_state = state._replace(
        params=jax.tree.map(lambda p: p + 1.0, state.params))
    save_checkpoint(str(tmp_path / "src"), src_state)

    raw = restore_params_raw(str(tmp_path / "src"))
    for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(src_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # RGB -> RGB-D transfer: conv1 kernel is (7, 7, 8, 64) vs source's
    # (7, 7, 6, 64) — the first 6 input channels load, the rest stay fresh.
    cfg_d = dataclasses.replace(
        cfg, network=dataclasses.replace(cfg.network, input_depth=True))
    model_d = make_model(cfg_d, assets.num_classes)
    tmpl = init_state(cfg_d, model_d, jax.random.PRNGKey(1)).params
    merged, stats = merge_pretrained(tmpl, raw, log=lambda *_: None)
    assert stats["sliced"] == 1 and stats["shape_skipped"] == 0
    k_m = np.asarray(merged["params"]["conv1"]["Conv_0"]["kernel"])
    k_s = np.asarray(raw["params"]["conv1"]["Conv_0"]["kernel"])
    k_t = np.asarray(tmpl["params"]["conv1"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(k_m[:, :, :6], k_s)
    np.testing.assert_array_equal(k_m[:, :, 6:], k_t[:, :, 6:])
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["fc1"]["kernel"]),
        np.asarray(raw["params"]["fc1"]["kernel"]))

    # Different class count: per-class heads are shape-skipped, convs load.
    model_1 = dataclasses.replace(model, num_classes=assets.num_classes + 1)
    tmpl_1 = model_1.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, H, W, 6)))
    merged_1, stats_1 = merge_pretrained(tmpl_1, raw, log=lambda *_: None)
    assert stats_1["shape_skipped"] >= 2  # fc_rot + fc_trans at least
    np.testing.assert_array_equal(
        np.asarray(merged_1["params"]["fc_rot"]["kernel"]),
        np.asarray(tmpl_1["params"]["fc_rot"]["kernel"]))

    # A 2-D Dense kernel with a longer leading dim must NOT take the
    # input-channel slice rule (flatten ordering differs across spatial
    # grids — a slice would load spatially scrambled weights): a source
    # trained at a smaller input resolution shape-skips fc1 instead.
    fc1 = np.asarray(raw["params"]["fc1"]["kernel"])
    shrunk = {"params": {"fc1": {"kernel": fc1[: fc1.shape[0] // 2]}}}
    tmpl_fc = {"params": {"fc1": {"kernel":
                                  np.asarray(tmpl["params"]["fc1"]["kernel"])}}}
    merged_fc, stats_fc = merge_pretrained(tmpl_fc, shrunk,
                                           log=lambda *_: None)
    assert stats_fc["sliced"] == 0 and stats_fc["shape_skipped"] == 1
    np.testing.assert_array_equal(
        np.asarray(merged_fc["params"]["fc1"]["kernel"]),
        np.asarray(tmpl_fc["params"]["fc1"]["kernel"]))

    # reinit list forces fresh init even on a shape match.
    tmpl_2 = init_state(cfg, model, jax.random.PRNGKey(3)).params
    merged_2, stats_2 = merge_pretrained(
        tmpl_2, raw, reinit=("fc_rot", "fc_trans"), log=lambda *_: None)
    assert stats_2["reinit"] >= 2
    np.testing.assert_array_equal(
        np.asarray(merged_2["params"]["fc_trans"]["kernel"]),
        np.asarray(tmpl_2["params"]["fc_trans"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged_2["params"]["conv2"]["Conv_0"]["kernel"]),
        np.asarray(raw["params"]["conv2"]["Conv_0"]["kernel"]))


@pytest.mark.slow
def test_micro_overfit(assets):
    """Loss decreases markedly on a fixed tiny batch (end-to-end gradient
    sanity — the reference's only 'test' was full training runs).  The
    unused flow/mask heads are disabled (w_*=0 anyway) and the batch kept
    small: this is a gradient-direction test, not a capacity test."""
    import dataclasses

    cfg = tiny_cfg(w_flow=0.0, w_mask=0.0, lr=3e-4, optimizer="adam",
                   weight_decay=0.0, batch_size=4)
    cfg = dataclasses.replace(
        cfg, network=dataclasses.replace(cfg.network, with_flow=False,
                                         with_mask=False))
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(model, assets, cfg)
    batch = synthetic_batch(jax.random.PRNGKey(5), assets, 4, K_CAM, (H, W),
                            renderer="xla")
    losses, rot_errs = [], []
    for _ in range(80):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        rot_errs.append(float(metrics["rot_err_deg_0"]))
    assert min(losses) < losses[0] * 0.5, losses[::10]
    assert min(rot_errs) < rot_errs[0] * 0.7, rot_errs[::10]


@pytest.mark.slow
@pytest.mark.dist
def test_gspmd_tp_step_matches_single(assets):
    """GSPMD DP+TP ((4, 2) mesh, pose-head FCs sharded over 'model') gives
    the same loss and updated params as the single-device step."""
    from deepim_tpu.parallel import shard_batch, shard_params_for_tp
    from deepim_tpu.train import make_optimizer

    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    batch = synthetic_batch(jax.random.PRNGKey(11), assets, 8, K_CAM, (H, W),
                            renderer="xla")

    state = init_state(cfg, model, jax.random.PRNGKey(0))
    s1, m1 = make_train_step(model, assets, cfg)(state, batch)
    ref_leaves = [np.asarray(x) for x in jax.tree.leaves(s1.params)]

    mesh = make_mesh(n_data=4, n_model=2)
    state2 = init_state(cfg, model, jax.random.PRNGKey(0))
    params_tp = shard_params_for_tp(state2.params, mesh)
    tx = make_optimizer(cfg)
    state2 = type(state2)(state2.step, params_tp, tx.init(params_tp))
    s2, m2 = make_train_step(model, assets, cfg)(state2,
                                                 shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(ref_leaves, jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_class_agnostic_unseen_objects(assets):
    """ModelNet protocol: a class-agnostic net trained on one object set
    refines objects with class indices it never saw (single shared head)."""
    from deepim_tpu.raster.mesh import cylinder_mesh, torus_mesh
    from deepim_tpu.refine import refine_poses

    cfg = tiny_cfg()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, network=dataclasses.replace(cfg.network, class_agnostic=True)
    )
    model = make_model(cfg, 2)
    assert model.num_classes == 1
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    # one train step on the train objects
    batch = synthetic_batch(jax.random.PRNGKey(1), assets, 8, K_CAM, (H, W),
                            renderer="xla")
    state, metrics = make_train_step(model, assets, cfg)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # refine UNSEEN objects (new asset set, class indices 0/1)
    unseen = build_assets([cylinder_mesh(), torus_mesh()], num_points=64)
    obs = jax.random.uniform(jax.random.PRNGKey(2), (2, H, W, 3))
    init_p = jnp.stack([
        jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [0.7]])], 1)
    ] * 2)
    out = refine_poses(
        state.params, model, unseen, obs, init_p,
        jnp.tile(K_CAM[None], (2, 1, 1)), jnp.array([0, 1]),
        num_iters=1, out_size=(H, W), renderer="xla",
    )
    assert out.shape == (2, 3, 4) and np.isfinite(np.asarray(out)).all()


def test_checkpoint_force_overwrites(assets, tmp_path):
    """Saving the same step twice keeps the LATEST weights (orbax silently
    skips existing steps without force=True — regression for a real bug
    where a fresh run appeared to train but kept old weights)."""
    from deepim_tpu.train.checkpoint import (
        clear_checkpoints, restore_checkpoint, save_checkpoint,
    )

    cfg = tiny_cfg()
    model = make_model(cfg, assets.num_classes)
    s1 = init_state(cfg, model, jax.random.PRNGKey(0))
    s2 = init_state(cfg, model, jax.random.PRNGKey(42))
    d = str(tmp_path / "ck")
    save_checkpoint(d, s1)
    save_checkpoint(d, s2)  # same step 0, different weights
    got = restore_checkpoint(d, init_state(cfg, model, jax.random.PRNGKey(7)))
    a = np.asarray(jax.tree.leaves(got.params)[0])
    np.testing.assert_array_equal(
        a, np.asarray(jax.tree.leaves(s2.params)[0])
    )
    clear_checkpoints(d)
    import os as _os

    assert not _os.path.isdir(d)
