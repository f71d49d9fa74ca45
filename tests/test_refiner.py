"""Refinement-loop tests: assets, class gather, and loop mechanics.

The key contract (reference ``tester.py §pred_eval``): with an oracle delta
the loop converges to GT in one step; with an untrained (identity-init) net
poses pass through unchanged; the whole loop jits as one program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepim_tpu.geometry import add_error, calc_delta
from deepim_tpu.geometry.symmetry import rot_z_syms
from deepim_tpu.models import DeepIMFlowNet
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
from deepim_tpu.refine import build_assets, gather_class, refine_poses
from deepim_tpu.refine.refiner import refine_step

H, W = 64, 128  # tiny crop for CPU tests
K_CAM = np.array([[300.0, 0, 320], [0, 300, 240], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def assets():
    return build_assets(
        [box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05)],
        sym_transforms=[rot_z_syms(2), None],
        num_points=128,
    )


def _pose(rx, tz=0.7, tx=0.0):
    c, s = np.cos(rx), np.sin(rx)
    r = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    return jnp.asarray(np.concatenate([r, [[tx], [0.0], [tz]]], 1))


def test_build_assets_shapes(assets):
    assert assets.num_classes == 2
    assert assets.vertices.shape[0] == 2
    assert assets.faces.shape == (2, assets.faces.shape[1], 3)
    assert assets.points.shape == (2, 128, 3)
    assert assets.sym_poses.shape == (2, 2, 3, 4)
    assert assets.corners.shape == (2, 8, 3)
    assert float(assets.diameters[0]) > 0.1  # box diagonal


def test_gather_class(assets):
    idx = jnp.array([1, 0, 1])
    b = gather_class(assets, idx)
    assert b.vertices.shape[0] == 3
    np.testing.assert_allclose(b.vertices[0], assets.vertices[1])
    np.testing.assert_allclose(b.diameters, assets.diameters[idx])


def test_identity_net_passthrough(assets):
    """Zero-init heads -> the K-iteration loop returns the init pose."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    x = jnp.zeros((1, H, W, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    obs = jnp.zeros((2, 96, 160, 3))
    init = jnp.stack([_pose(0.3), _pose(-0.2, tx=0.05)])
    k = jnp.tile(jnp.asarray(K_CAM)[None], (2, 1, 1))
    out = refine_poses(
        variables, model, assets, obs, init, k, jnp.array([0, 1]),
        num_iters=3, out_size=(H, W), renderer="xla",
    )
    np.testing.assert_allclose(out, init, atol=1e-5)


def test_oracle_delta_converges(assets):
    """Replace the net with the analytic delta -> one step reaches GT.

    Validates the zoom-K delta convention: targets built with the crop
    intrinsics compose back to the target pose exactly.
    """
    from deepim_tpu.geometry.delta_pose import apply_delta
    from deepim_tpu.ops.zoom import compute_zoom_box, zoom_intrinsics

    init = jnp.stack([_pose(0.4), _pose(0.1, tx=0.03)])
    tgt = jnp.stack([_pose(0.15, tz=0.65), _pose(0.0, tx=-0.02)])
    k = jnp.tile(jnp.asarray(K_CAM)[None], (2, 1, 1))
    b_assets = gather_class(assets, jnp.array([0, 1]))

    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, (H, W))
    )(init, k, b_assets.corners)
    kz = zoom_intrinsics(k, box)
    delta = calc_delta(init, tgt, kz)
    refined = apply_delta(init, delta, kz)
    err = add_error(b_assets.points, refined, tgt)
    assert float(err.max()) < 1e-5


@pytest.mark.slow
def test_refine_step_runs_with_render(assets):
    """Full refine_step (render + zoom + net) executes and returns aux."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32)
    x = jnp.zeros((1, H, W, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    obs = jax.random.uniform(jax.random.PRNGKey(2), (2, 96, 160, 3))
    pose = jnp.stack([_pose(0.3), _pose(-0.1)])
    k = jnp.tile(jnp.asarray(K_CAM)[None], (2, 1, 1))
    cls = jnp.array([0, 1])
    outs = refine_step(
        variables, model, gather_class(assets, cls), obs, pose, k, cls,
        (H, W), renderer="xla", keep_aux=True,
    )
    assert outs.pose.shape == (2, 3, 4)
    assert "mask_logit" in outs.aux and "flow" in outs.aux
    assert np.isfinite(np.asarray(outs.pose)).all()


def test_refine_matches_pallas_interpret(assets):
    """XLA and Pallas-interpret render paths give the same refined pose."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    obs = jax.random.uniform(jax.random.PRNGKey(3), (1, 96, 160, 3))
    init = _pose(0.25)[None]
    k = jnp.asarray(K_CAM)[None]
    cls = jnp.array([0])
    p_xla = refine_poses(variables, model, assets, obs, init, k, cls,
                         num_iters=1, out_size=(H, W), renderer="xla")
    p_pal = refine_poses(variables, model, assets, obs, init, k, cls,
                         num_iters=1, out_size=(H, W),
                         renderer="pallas_interpret")
    np.testing.assert_allclose(p_xla, p_pal, atol=1e-4)


def test_multi_hypothesis_selects_best(assets):
    """The agreement score ranks the GT pose above a far-off pose, and the
    multi-hypothesis refiner returns hypothesis-0 results for an
    identity net (all hypotheses equal-scored except pose differences)."""
    from deepim_tpu.refine.hypotheses import (
        refine_multi_hypothesis, score_poses,
    )
    from deepim_tpu.refine import gather_class
    from deepim_tpu.refine.refiner import render_crops

    cls = jnp.array([0, 1])
    ab = gather_class(assets, cls)
    gt = jnp.stack([_pose(0.3), _pose(-0.2, tx=0.05)])
    # K whose principal point lies inside the small (96, 160) test frame
    k_small = jnp.array([[150.0, 0, 80], [0, 150.0, 48], [0, 0, 1]])
    k = jnp.tile(k_small[None], (2, 1, 1))
    # observed = render at GT
    obs, _ = render_crops(ab, gt, k, (96, 160), "xla")

    far = gt.at[:, :, 3].add(jnp.array([0.06, 0.0, 0.2]))
    s_gt = score_poses(ab, obs, gt, k, (H, W), "xla")
    s_far = score_poses(ab, obs, far, k, (H, W), "xla")
    assert (np.asarray(s_gt) > np.asarray(s_far)).all()

    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    best, scores = refine_multi_hypothesis(
        variables, model, assets, obs, gt, k, cls, jax.random.PRNGKey(3),
        num_hypotheses=3, num_iters=1, out_size=(H, W), renderer="xla",
    )
    assert best.shape == (2, 3, 4) and scores.shape == (2, 3)
    # identity net: hypothesis 0 (exact GT init) must win
    np.testing.assert_allclose(np.asarray(best), np.asarray(gt), atol=1e-4)

    # input_depth model: the observed-depth extras tile over hypotheses
    model_d = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                            with_flow=False, with_mask=False,
                            input_depth=True)
    variables_d = model_d.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 8)))
    best_d, _ = refine_multi_hypothesis(
        variables_d, model_d, assets, obs, gt, k, cls, jax.random.PRNGKey(3),
        num_hypotheses=3, num_iters=1, out_size=(H, W), renderer="xla",
        obs_depth=jnp.ones(obs.shape[:3]),
    )
    np.testing.assert_allclose(np.asarray(best_d), np.asarray(gt), atol=1e-4)


def test_empty_render_scores_neg_inf(assets):
    """A hypothesis rendering zero foreground pixels must lose to every
    visible hypothesis (score 0.0 would otherwise be the argmax winner)."""
    from deepim_tpu.refine import gather_class
    from deepim_tpu.refine.hypotheses import score_poses
    from deepim_tpu.refine.refiner import render_crops

    cls = jnp.array([0, 0])
    ab = gather_class(assets, cls)
    k_small = jnp.array([[150.0, 0, 80], [0, 150.0, 48], [0, 0, 1]])
    k = jnp.tile(k_small[None], (2, 1, 1))
    gt = jnp.stack([_pose(0.3), _pose(0.3)])
    obs, _ = render_crops(ab, gt, k, (96, 160), "xla")
    # second pose behind the camera: every face z < z_near is culled
    behind = gt.at[1, 2, 3].set(-0.5)
    s = np.asarray(score_poses(ab, obs, behind, k, (H, W), "xla"))
    assert np.isfinite(s[0])
    assert s[1] == -np.inf
    assert s[0] > s[1]


def test_multi_hypothesis_select_margin(assets):
    """Selection hysteresis: hypothesis 0 is kept unless a challenger
    clears the margin (noise-regression fix, see hypotheses.py), but a
    diverged hypothesis 0 (-inf score) is always replaced."""
    from deepim_tpu.refine.hypotheses import refine_multi_hypothesis

    cls = jnp.array([0, 1])
    k_small = jnp.array([[150.0, 0, 80], [0, 150.0, 48], [0, 0, 1]])
    k = jnp.tile(k_small[None], (2, 1, 1))
    gt = jnp.stack([_pose(0.3), _pose(-0.2, tx=0.05)])
    from deepim_tpu.refine import gather_class
    from deepim_tpu.refine.refiner import render_crops

    ab = gather_class(assets, cls)
    obs, _ = render_crops(ab, gt, k, (96, 160), "xla")
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))

    # infinite margin == always hypothesis 0 == plain single-hypothesis
    best_inf, _ = refine_multi_hypothesis(
        variables, model, assets, obs, gt, k, cls, jax.random.PRNGKey(3),
        num_hypotheses=4, num_iters=1, out_size=(H, W), renderer="xla",
        select_margin=float("inf"),
    )
    np.testing.assert_allclose(np.asarray(best_inf), np.asarray(gt),
                               atol=1e-4)

    # hypothesis 0 diverged (behind camera) -> -inf score -> any finite
    # challenger replaces it regardless of the margin
    behind = gt.at[:, 2, 3].set(-0.5)
    best_resc, scores = refine_multi_hypothesis(
        variables, model, assets, obs, behind, k, cls,
        jax.random.PRNGKey(3), num_hypotheses=4, num_iters=1,
        out_size=(H, W), renderer="xla", select_margin=0.05,
    )
    assert np.asarray(scores)[:, 0].min() == -np.inf
    # identity net leaves poses unchanged: the selected pose must NOT be
    # the behind-camera hypothesis 0 wherever some challenger is finite
    finite_any = np.isfinite(np.asarray(scores)[:, 1:]).any(axis=1)
    changed = (np.abs(np.asarray(best_resc) - np.asarray(behind))
               .max(axis=(1, 2)) > 1e-6)
    assert (changed == finite_any).all()


def test_coarse_iters_requires_head_grid(assets):
    """coarse_iters with a flatten head lacking head_grid fails with a
    clear ValueError, not a deep flax shape error."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    pose = jnp.stack([_pose(0.3), _pose(0.2)])
    k = jnp.tile(jnp.asarray(K_CAM)[None], (2, 1, 1))
    obs = jnp.zeros((2, 96, 160, 3))
    with pytest.raises(ValueError, match="head_grid"):
        refine_poses(variables, model, assets, obs, pose, k,
                     jnp.array([0, 1]), num_iters=2, out_size=(H, W),
                     renderer="xla", coarse_iters=1)


def test_refine_poses_sharded_matches_single(assets):
    """Sharding the batch axis over the 8-device mesh (the cli.test
    data-parallel eval path) gives the same refined poses as one device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    b = 8
    key = jax.random.PRNGKey(11)
    obs = jax.random.uniform(key, (b, 96, 160, 3))
    init = jnp.stack([_pose(0.1 * i, tz=0.6 + 0.02 * i) for i in range(b)])
    k = jnp.tile(jnp.asarray(K_CAM)[None], (b, 1, 1))
    cls = jnp.asarray(np.arange(b) % 2)

    ref = refine_poses(variables, model, assets, obs, init, k, cls,
                       num_iters=2, out_size=(H, W), renderer="xla")

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def shard(x):
        spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = refine_poses(variables, model, assets, shard(obs), shard(init),
                       shard(k), shard(cls), num_iters=2, out_size=(H, W),
                       renderer="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_coarse_to_fine_schedule(assets):
    """Coarse-first schedule: shared flatten head across resolutions.

    With head_grid pinned to the fine bottleneck grid, one parameter set
    serves both resolutions (identity-init net → poses pass through at
    every stage), and return_all stacks coarse + fine trajectories.
    """
    from deepim_tpu.models import bottleneck_grid

    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=False, with_mask=False,
                          head_grid=bottleneck_grid(H, W))
    x = jnp.zeros((1, H, W, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    # The same params must apply cleanly at the coarse resolution.
    out_c = model.apply(variables, jnp.zeros((1, H // 2, W // 2, 6)))
    assert out_c["trans"].shape == (1, 2, 3)

    obs = jnp.zeros((2, 96, 160, 3))
    init = jnp.stack([_pose(0.3), _pose(-0.2, tx=0.05)])
    k = jnp.tile(jnp.asarray(K_CAM)[None], (2, 1, 1))
    traj = refine_poses(
        variables, model, assets, obs, init, k, jnp.array([0, 1]),
        num_iters=4, out_size=(H, W), renderer="xla", return_all=True,
        coarse_iters=2,
    )
    assert traj.shape == (5, 2, 3, 4)
    np.testing.assert_allclose(traj[-1], init, atol=1e-5)


def test_head_grid_noop_at_native_resolution(assets):
    """head_grid == native grid -> bitwise-identical params AND outputs."""
    from deepim_tpu.models import bottleneck_grid

    kwargs = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
                  with_mask=False)
    m_plain = DeepIMFlowNet(**kwargs)
    m_grid = DeepIMFlowNet(**kwargs, head_grid=bottleneck_grid(H, W))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 6))
    v = m_plain.init(jax.random.PRNGKey(0), x)
    out_a = m_plain.apply(v, x)
    out_b = m_grid.apply(v, x)
    np.testing.assert_array_equal(out_a["rot_raw"], out_b["rot_raw"])
    np.testing.assert_array_equal(out_a["trans"], out_b["trans"])


class TestCoarseLOD:
    """RenderAssets.lod: the coarse level-of-detail for coarse-to-fine."""

    def test_lod_built_only_when_it_halves(self):
        dense = icosphere_mesh(0.05, subdivisions=3)  # 1280 faces
        a = build_assets([dense], num_points=16, lod_faces=256)
        assert a.lod is not None
        assert a.lod.tri_pos.shape[2] <= 256
        assert a.lod.lod is None  # one level only
        # 1280 < 2*1024: near-budget meshes skip the LOD (train/eval
        # appearance mismatch isn't worth a ~20% coarse saving)
        assert build_assets([dense], num_points=16,
                            lod_faces=1024).lod is None
        assert build_assets([dense], num_points=16).lod is None

    def test_gather_class_leaves_lod_with_class_axis(self):
        a = build_assets(
            [icosphere_mesh(0.05, subdivisions=3), box_mesh((0.1, 0.1, 0.1))],
            num_points=16, lod_faces=256)
        ab = gather_class(a, jnp.array([1, 1, 0]))
        assert ab.tri_pos.shape[0] == 3
        assert ab.lod.tri_pos.shape[0] == a.num_classes  # untouched
        ab_lod = gather_class(a.lod, jnp.array([1, 1, 0]))
        assert ab_lod.tri_pos.shape[0] == 3

    def test_lod_shares_texture_atlas(self):
        from deepim_tpu.raster.mesh import texturize

        meshes = [texturize(icosphere_mesh(0.05, subdivisions=3), seed=1),
                  texturize(box_mesh((0.1, 0.1, 0.1)), seed=2)]
        a = build_assets(meshes, num_points=16, lod_faces=256,
                         use_textures=True)
        assert a.lod is not None and a.lod.textured
        assert a.lod.textures is a.textures  # same device array, no copy

    def test_refine_runs_with_lod(self):
        a = build_assets(
            [icosphere_mesh(0.05, subdivisions=2), box_mesh((0.1, 0.1, 0.1))],
            num_points=16, lod_faces=96)
        from deepim_tpu.models import bottleneck_grid

        model = DeepIMFlowNet(num_classes=2, head_grid=bottleneck_grid(H, W))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, H, W, 6)))
        b = 2
        pose = jnp.stack([_pose(0.3), _pose(-0.2, tz=0.6)])
        k = jnp.tile(jnp.asarray(K_CAM)[None], (b, 1, 1))
        obs = jnp.zeros((b, H, W, 3))
        cls = jnp.array([0, 1])
        out = refine_poses(variables, model, a, obs, pose, k, cls,
                           num_iters=2, out_size=(H, W), renderer="xla",
                           coarse_iters=1)
        assert out.shape == (b, 3, 4)
        assert bool(jnp.isfinite(out).all())
