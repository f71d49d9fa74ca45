"""int8 quantized-inference tests (network.quant).

The quantized model must (a) own the exact same parameter tree as the
plain model so checkpoints are interchangeable, (b) reproduce a numpy
integer oracle bit-for-bit in its quantized ops, and (c) track the f32
model's pose outputs closely on random weights.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from deepim_tpu.models.flownet import (
    Conv, DeepIMFlowNet, QDense, _int8_conv, _quantize_int8,
)


def _tree_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(k): v.shape for k, v in flat}


def test_quant_param_tree_matches_plain():
    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=True,
              with_mask=True, fc_dim=32)
    x = jnp.zeros((1, 64, 64, 6))
    p_plain = DeepIMFlowNet(**kw).init(jax.random.PRNGKey(0), x)
    p_quant = DeepIMFlowNet(**kw, quant="int8").init(jax.random.PRNGKey(0), x)
    # the ENTIRE variable tree must match — the calibration sow sites are
    # init-guarded so quant checkpoints restore a plain-trained state
    assert "quant_stats" not in p_quant
    assert _tree_paths(p_plain) == _tree_paths(p_quant)
    # identical init values too (same param names, shapes, initializers)
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_quant)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_stats_only_under_mutable():
    """amax sows appear ONLY when quant_stats is explicitly mutable."""
    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
              with_mask=False, fc_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 6))
    model = DeepIMFlowNet(**kw, quant="int8")
    params = model.init(jax.random.PRNGKey(1), x)
    # plain apply: no mutable collections requested -> no stats, no error
    model.apply(params, x, pose_only=True)
    _, state = model.apply(params, x, pose_only=True,
                           mutable=["quant_stats"])
    stats = state["quant_stats"]
    # every quantized layer records one scalar max-abs
    for layer in ("conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
                  "conv5", "conv5_1", "conv6", "conv6_1", "fc1", "fc2"):
        assert layer in stats, layer
        assert np.asarray(stats[layer]["amax"]).shape == ()


def test_int8_static_calibration_roundtrip():
    """calibrate_act_scales -> clone: static output tracks dynamic int8,
    and the static path never sows (the max-abs pass is gone)."""
    from deepim_tpu.models.quant import calibrate_act_scales

    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
              with_mask=False, fc_dim=32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 6)) * 0.3
    x2 = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 6)) * 0.5
    model = DeepIMFlowNet(**kw)
    params = model.init(jax.random.PRNGKey(1), x1)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(jax.random.PRNGKey(5), v.shape) * 0.05
                      if "fc_rot" in jax.tree_util.keystr(p)
                      or "fc_trans" in jax.tree_util.keystr(p) else v),
        params,
    )
    scales = calibrate_act_scales(model, params, [x1, x2])
    names = [n for n, _ in scales]
    assert "conv1" in names and "fc1" in names
    assert all(s > 0 for _, s in scales)

    static = model.clone(quant="int8", act_scales=scales)
    # the static path has no sow: mutable apply returns an empty state
    out_s, state = static.apply(params, x1, pose_only=True,
                                mutable=["quant_stats"])
    assert not state.get("quant_stats", {})
    out_d = model.clone(quant="int8").apply(params, x1, pose_only=True)
    for key in ("rot_raw", "trans"):
        ref, got = np.asarray(out_d[key]), np.asarray(out_s[key])
        scale = max(np.abs(ref).max(), 1e-3)
        # static scales are per-layer (not per-sample) so outputs differ
        # slightly; both sit within quantization error of f32
        assert np.abs(got - ref).max() / scale < 0.1, key


def test_calibrate_model_from_eval_batches():
    """Entry-point wiring: eval batch dicts -> calibrated static model."""
    from deepim_tpu.geometry.symmetry import rot_z_syms
    from deepim_tpu.models import bottleneck_grid
    from deepim_tpu.models.quant import calibrate_model
    from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
    from deepim_tpu.refine import build_assets

    assets = build_assets(
        [box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05)],
        sym_transforms=[rot_z_syms(2), None], num_points=64,
    )
    h, w = 64, 128
    k_cam = jnp.asarray([[300.0, 0, 64], [0, 300, 32], [0, 0, 1]])
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32, with_flow=False,
                          with_mask=False, fc_dim=32,
                          head_grid=bottleneck_grid(h, w), quant="int8")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 6)))
    pose = jnp.tile(jnp.asarray([[1.0, 0, 0, 0.02], [0, 1, 0, 0.0],
                                 [0, 0, 1, 0.6]])[None], (2, 1, 1))
    batch = {
        "obs_rgb": jax.random.uniform(jax.random.PRNGKey(1), (2, h, w, 3)),
        "pose_src": pose,
        "class_idx": jnp.asarray([0, 1]),
    }
    calibrated = calibrate_model(model, params, assets, [batch], k_cam,
                                 (h, w), renderer="xla")
    assert calibrated.quant == "int8"
    assert len(calibrated.act_scales) >= 12  # every quantized layer
    # the calibrated clone runs (static path, no mutable collections)
    out = calibrated.apply(params, jnp.zeros((2, h, w, 6)), pose_only=True)
    assert out["trans"].shape == (2, 2, 3)


def test_config_rejects_bad_quant():
    import pytest

    from deepim_tpu.config import config_from_dict

    with pytest.raises(ValueError, match="quant"):
        config_from_dict({"network": {"quant": "in8"}})
    for ok in ("none", "int8", "int8_static"):
        config_from_dict({"network": {"quant": ok}})


def test_int8_conv_matches_numpy_oracle():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 10, 12, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    y = np.asarray(_int8_conv(x, k, (1, 1), "SAME"))

    # numpy oracle: quantize identically, integer conv in f64 (exact for
    # int8 products), dequantize.
    def q(a, axes):
        amax = np.maximum(np.abs(a).max(axis=axes, keepdims=True), 1e-12)
        s = amax / 127.0
        return np.clip(np.round(a / s), -127, 127), s

    xq, sx = q(np.asarray(x), (1, 2, 3))
    kq, sk = q(np.asarray(k), (0, 1, 2))
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 10, 12, 7))
    for i in range(10):
        for j in range(12):
            patch = xp[:, i:i + 3, j:j + 3, :]
            ref[:, i, j, :] = np.einsum("bhwc,hwco->bo", patch, kq)
    ref = ref * sx * sk.reshape(1, 1, 1, -1)
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_quantize_int8_scale_and_range():
    x = jnp.asarray([[0.0, -2.0, 1.0, 0.5]])
    q, s = _quantize_int8(x, axes=(1,))
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(s), 2.0 / 127.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(q), [[0, -127, 64, 32]])


def test_qdense_matches_dense_closely():
    from flax import linen as nn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    dense = nn.Dense(16, param_dtype=jnp.float32)
    params = dense.init(jax.random.PRNGKey(1), x)
    y_ref = dense.apply(params, x)
    y_q = QDense(16).apply(params, x)
    err = np.abs(np.asarray(y_q - y_ref))
    scale = np.abs(np.asarray(y_ref)).max()
    assert err.max() / scale < 0.02


def test_quant_conv_matches_f32_closely():
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 16, 16, 6))
    plain = Conv(8, 3, 2, jnp.float32)
    params = plain.init(jax.random.PRNGKey(2), x)
    y_ref = plain.apply(params, x)
    y_q = Conv(8, 3, 2, jnp.float32, quant="int8").apply(params, x)
    err = np.abs(np.asarray(y_q - y_ref)).max()
    scale = np.abs(np.asarray(y_ref)).max()
    assert err / scale < 0.03


def test_quant_model_pose_outputs_close():
    """Full pose path (encoder + FCs) through int8 stays close to f32."""
    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
              with_mask=False, fc_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 6)) * 0.3
    model = DeepIMFlowNet(**kw)
    params = model.init(jax.random.PRNGKey(1), x)
    # the final heads are zero-init; randomize them so outputs carry the
    # quantization error of everything upstream
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jax.random.normal(jax.random.PRNGKey(5), v.shape) * 0.05
                      if "fc_rot" in jax.tree_util.keystr(p)
                      or "fc_trans" in jax.tree_util.keystr(p) else v),
        params,
    )
    out_ref = model.apply(params, x, pose_only=True)
    out_q = DeepIMFlowNet(**kw, quant="int8").apply(params, x,
                                                    pose_only=True)
    for key in ("rot_raw", "trans"):
        ref, got = np.asarray(out_ref[key]), np.asarray(out_q[key])
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(got - ref).max() / scale < 0.08, key


def test_calibration_stats_all_modes():
    """Each sow site records all four estimators with the right shapes,
    and percentile stats are bounded by the max stats."""
    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
              with_mask=False, fc_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 6))
    model = DeepIMFlowNet(**kw, quant="int8")
    params = model.init(jax.random.PRNGKey(1), x)
    _, state = model.apply(params, x, pose_only=True,
                           mutable=["quant_stats"])
    st = state["quant_stats"]["conv2"]
    c_in = np.asarray(st["amax_c"]).shape[0]
    assert np.asarray(st["amax"]).shape == ()
    assert np.asarray(st["p999"]).shape == ()
    assert np.asarray(st["p999_c"]).shape == (c_in,)
    assert float(st["p999"]) <= float(st["amax"]) + 1e-6
    assert np.all(np.asarray(st["p999_c"]) <= np.asarray(st["amax_c"]) + 1e-6)
    assert float(st["amax"]) == np.max(np.asarray(st["amax_c"]))


@pytest.mark.slow
def test_calibrate_modes_output_types_and_accuracy():
    """p999 yields smaller-or-equal scalar scales than max; _c modes give
    per-channel tuples; every calibrated clone tracks the dynamic model."""
    from deepim_tpu.models.quant import CALIB_MODES, calibrate_act_scales

    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=False,
              with_mask=False, fc_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 6)) * 0.3
    model = DeepIMFlowNet(**kw)
    params = model.init(jax.random.PRNGKey(1), x)
    out_ref = model.apply(params, x, pose_only=True)
    by_mode = {}
    for mode in CALIB_MODES:
        scales = calibrate_act_scales(model, params, [x], mode=mode)
        by_mode[mode] = dict(scales)
        static = model.clone(quant="int8", act_scales=scales)
        out_s = static.apply(params, x, pose_only=True)
        for key in ("rot_raw", "trans"):
            ref = np.asarray(out_ref[key])
            got = np.asarray(out_s[key])
            scale = max(np.abs(ref).max(), 1e-3)
            assert np.abs(got - ref).max() / scale < 0.15, (mode, key)
    for name, s in by_mode["max"].items():
        assert isinstance(s, float)
        assert isinstance(by_mode["p999"][name], float)
        assert by_mode["p999"][name] <= s + 1e-9
        sc = by_mode["max_c"][name]
        assert isinstance(sc, tuple) and all(isinstance(v, float) for v in sc)
        # scalar max == max over channels
        assert abs(max(sc) - s) < 1e-6 * max(s, 1.0), name


def test_int8_conv_per_channel_fold_oracle():
    """Per-channel activation scales folded into the kernel reproduce the
    explicit quantize-then-conv oracle exactly."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    s_c = (0.01, 0.05, 0.2)
    got = np.asarray(_int8_conv(x, k, (1, 1), "SAME", act_scale=s_c))

    s = np.asarray(s_c, np.float32)
    xq = np.clip(np.round(np.asarray(x) / s), -127, 127)
    kf = np.asarray(k) * s.reshape(1, 1, 3, 1)
    amax_k = np.max(np.abs(kf), axis=(0, 1, 2), keepdims=True)
    sk = np.maximum(amax_k, 1e-12) / 127.0
    kq = np.clip(np.round(kf / sk), -127, 127)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(kq), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref) * sk.reshape(1, 1, 1, -1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
