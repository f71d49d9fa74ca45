"""Tests: DeepIMFlowNet shapes/init behavior + loss oracles.

Mirrors the verification the reference *lacks* (SURVEY.md §4): the reference
validated its symbol graph only via end-to-end training; here the network
contract (shapes, identity-at-init, class selection) and each loss are unit
tested against numpy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepim_tpu.geometry import DeltaPose, apply_delta, calc_delta
from deepim_tpu.geometry.symmetry import rot_z_syms, sym_set
from deepim_tpu.losses import (
    flow_epe_loss,
    mask_ce_loss,
    point_matching_loss,
)
from deepim_tpu.models import (
    DeepIMFlowNet,
    decode_rot,
    network_input,
    select_class,
)

H, W = 96, 128  # small multiples of 64 for fast CPU tests


@pytest.fixture(scope="module")
def model_and_vars():
    model = DeepIMFlowNet(num_classes=3, dtype=jnp.float32)
    x = jnp.zeros((2, H, W, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_output_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.ones((2, H, W, 6)) * 0.3
    out = model.apply(variables, x)
    assert out["rot_raw"].shape == (2, 3, 4)
    assert out["trans"].shape == (2, 3, 3)
    cdiv = lambda a, b: -(-a // b)  # SAME-padded stride-2 convs ceil-divide
    for lvl, f in out["flow"].items():
        assert f.shape == (2, cdiv(H, 2**lvl), cdiv(W, 2**lvl), 2), lvl
    assert out["mask_logit"].shape == (2, cdiv(H, 4), cdiv(W, 4), 1)


def test_identity_at_init(model_and_vars):
    """Zero-init heads -> delta == identity -> pose unchanged."""
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 6))
    out = model.apply(variables, x)
    quat = decode_rot(select_class(out["rot_raw"], jnp.array([0, 2])),
                      "quat")
    trans = select_class(out["trans"], jnp.array([0, 2]))
    np.testing.assert_allclose(quat, np.tile([1, 0, 0, 0], (2, 1)), atol=1e-6)
    np.testing.assert_allclose(trans, np.zeros((2, 3)), atol=1e-6)

    pose = jnp.tile(
        jnp.concatenate([jnp.eye(3), jnp.array([[0.02], [-0.01], [0.7]])], 1),
        (2, 1, 1),
    )
    k = jnp.tile(jnp.array([[500.0, 0, 64], [0, 500, 48], [0, 0, 1]]), (2, 1, 1))
    new_pose = apply_delta(pose, DeltaPose(quat, trans), k)
    np.testing.assert_allclose(new_pose, pose, atol=1e-5)


def test_select_class():
    per_class = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    got = select_class(per_class, jnp.array([2, 1]))
    np.testing.assert_allclose(got[0], per_class[0, 2])
    np.testing.assert_allclose(got[1], per_class[1, 1])


def test_network_input_range():
    obs = jnp.full((1, 8, 8, 3), 1.0)
    ren = jnp.zeros((1, 8, 8, 3))
    x = network_input(obs, ren)
    assert x.shape == (1, 8, 8, 6)
    assert float(x.max()) == 0.5 and float(x.min()) == -0.5


# --- losses ---------------------------------------------------------------


def _rand_pose(rng, z=0.8):
    from deepim_tpu.geometry import quat2mat, random_quat

    q = random_quat(jax.random.PRNGKey(rng))
    r = quat2mat(q)
    t = jnp.array([0.01 * rng, -0.02, z])
    return jnp.concatenate([r, t[:, None]], axis=1)


def test_pm_loss_zero_at_target():
    points = jax.random.uniform(jax.random.PRNGKey(0), (2, 50, 3)) * 0.1
    k = jnp.tile(jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]),
                 (2, 1, 1))
    src = jnp.stack([_rand_pose(1), _rand_pose(2)])
    tgt = jnp.stack([_rand_pose(3), _rand_pose(4)])
    delta = calc_delta(src, tgt, k)
    loss = point_matching_loss(points, delta, src, tgt, k)
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)
    # identity delta -> loss equals mean L1 between src- and tgt-posed points
    ident = DeltaPose(jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
                      jnp.zeros((2, 3)))
    loss_id = point_matching_loss(points, ident, src, tgt, k)
    from deepim_tpu.geometry.se3 import transform_points

    p_s = transform_points(points, src[..., :3], src[..., 3])
    p_t = transform_points(points, tgt[..., :3], tgt[..., 3])
    expect = jnp.mean(jnp.abs(p_s - p_t), axis=(-1, -2))
    np.testing.assert_allclose(loss_id, expect, rtol=1e-5)


def test_pm_loss_symmetry_min():
    """A 180°-off pose has zero PM loss iff the symmetry set contains it."""
    from deepim_tpu.geometry.se3 import se3_mul

    points = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 3)) * 0.1
    k = jnp.array([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]])
    tgt = _rand_pose(7)[None]
    sym = jnp.asarray(sym_set(rot_z_syms(2), 2))[None]  # (1, 2, 3, 4)
    # src = tgt rotated by the symmetry -> delta=identity reaches tgt∘G only
    src = se3_mul(tgt, sym[:, 1])
    ident = DeltaPose(jnp.array([[1.0, 0, 0, 0]]), jnp.zeros((1, 3)))
    loss_sym = point_matching_loss(points, ident, src, tgt, k, sym_poses=sym)
    loss_nosym = point_matching_loss(points, ident, src, tgt, k)
    assert float(loss_sym[0]) < 1e-5
    assert float(loss_nosym[0]) > 1e-3


@pytest.mark.slow
def test_pm_loss_continuous_z_closed_form():
    """Continuous z-symmetry (YCB bowl semantics): a target rotated by an
    ARBITRARY angle about z (maximally off the 16-fold grid) costs ~zero
    under the closed-form continuous min, while the discrete set leaves a
    real residual — the measured loss-vs-metric gap the discretization
    had.  Asymmetric samples in the same batch are unaffected."""
    from deepim_tpu.geometry.se3 import se3_mul
    from deepim_tpu.geometry.symmetry import CONTINUOUS_Z_DISCRETE
    from deepim_tpu.losses.losses import _rz_pose

    # a flat "bowl" ring: points on a circle + height -> truly z-symmetric
    ang = jnp.linspace(0.0, 2 * np.pi, 64, endpoint=False)
    ring = jnp.stack([0.08 * jnp.cos(ang), 0.08 * jnp.sin(ang),
                      0.02 * jnp.cos(3 * ang) * 0], -1)
    points = jnp.tile(ring[None], (2, 1, 1))
    k = jnp.tile(jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]),
                 (2, 1, 1))
    tgt = jnp.stack([_rand_pose(7), _rand_pose(8)])
    # half a grid cell off the 16-fold set: the worst case for discrete
    theta = np.pi / CONTINUOUS_Z_DISCRETE
    rz = _rz_pose(jnp.full((2,), theta))
    src = se3_mul(tgt, rz)
    ident = DeltaPose(jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
                      jnp.zeros((2, 3)))
    sym = jnp.tile(jnp.asarray(sym_set(rot_z_syms(CONTINUOUS_Z_DISCRETE),
                                       CONTINUOUS_Z_DISCRETE))[None],
                   (2, 1, 1, 1))

    d_disc = point_matching_loss(points, ident, src, tgt, k, sym_poses=sym)
    d_cont = point_matching_loss(points, ident, src, tgt, k, sym_poses=sym,
                                 sym_continuous=jnp.array([True, True]))
    assert float(d_disc.min()) > 1e-3  # the 16-fold gap is real
    np.testing.assert_allclose(np.asarray(d_cont), 0.0, atol=1e-6)

    # flag off -> unchanged (asymmetric samples keep the discrete loss)
    d_off = point_matching_loss(points, ident, src, tgt, k, sym_poses=sym,
                                sym_continuous=jnp.array([False, False]))
    np.testing.assert_allclose(np.asarray(d_off), np.asarray(d_disc))

    # gradients flow through the closed-form angle
    def f(q):
        d = DeltaPose(q, jnp.zeros((2, 3)))
        return jnp.sum(point_matching_loss(
            points, d, src, tgt, k, sym_poses=sym,
            sym_continuous=jnp.array([True, True])))

    g = jax.grad(f)(jnp.tile(jnp.array([1.0, 0.02, 0, 0]), (2, 1)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_flow_epe_loss_oracle():
    b, h, w = 1, 16, 16
    gt = jnp.ones((b, h, w, 2)) * 2.0
    valid = jnp.ones((b, h, w), bool)
    # Perfect prediction at one level -> zero; off-by-one -> EPE sqrt(2)*w_l
    preds = {2: jnp.ones((b, 4, 4, 2)) * 2.0}
    np.testing.assert_allclose(flow_epe_loss(preds, gt, valid), 0.0, atol=1e-5)
    preds = {2: jnp.ones((b, 4, 4, 2)) * 3.0}
    loss = flow_epe_loss(preds, gt, valid)
    np.testing.assert_allclose(loss, 0.01 * np.sqrt(2.0), rtol=1e-4)


def test_flow_epe_ignores_invalid():
    b, h, w = 1, 8, 8
    gt = jnp.zeros((b, h, w, 2))
    valid = jnp.zeros((b, h, w), bool)
    preds = {2: jnp.ones((b, 2, 2, 2)) * 5.0}
    np.testing.assert_allclose(flow_epe_loss(preds, gt, valid), 0.0, atol=1e-6)


def test_mask_ce_oracle():
    logit = jnp.full((1, 4, 4, 1), 10.0)  # confident FG
    gt_fg = jnp.ones((1, 16, 16))
    gt_bg = jnp.zeros((1, 16, 16))
    assert float(mask_ce_loss(logit, gt_fg)[0]) < 1e-3
    assert float(mask_ce_loss(logit, gt_bg)[0]) > 5.0


def test_pm_loss_gradients_flow():
    """AD gradient of PM loss wrt delta params is nonzero (CustomOp parity:
    the reference hand-writes this backward)."""
    points = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 3)) * 0.1
    k = jnp.array([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]])
    src, tgt = _rand_pose(1)[None], _rand_pose(9)[None]

    def f(qt):
        q, t = qt[..., :4], qt[..., 4:]
        return jnp.sum(point_matching_loss(points, DeltaPose(q, t), src, tgt, k))

    g = jax.grad(f)(jnp.array([[1.0, 0, 0, 0, 0, 0, 0]]))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_stem_s2d_exact_equivalence():
    """StemConv (space-to-depth conv1) is numerically the plain 7x7/s2 conv.

    Same param tree, same init (identical rng fold path), same outputs at
    f32 — the fast stem is a pure compile-level rewrite.
    """
    m_fast = DeepIMFlowNet(num_classes=2, dtype=jnp.float32, stem_s2d=True)
    m_ref = DeepIMFlowNet(num_classes=2, dtype=jnp.float32, stem_s2d=False)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, H, W, 6)) - 0.5
    v_fast = m_fast.init(jax.random.PRNGKey(0), x)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x)
    # identical param trees (paths, shapes, and init values)
    jax.tree.map(np.testing.assert_array_equal, v_fast, v_ref)

    o_fast = m_fast.apply(v_fast, x)
    o_ref = m_ref.apply(v_ref, x)
    np.testing.assert_allclose(o_fast["trans"], o_ref["trans"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(o_fast["rot_raw"], o_ref["rot_raw"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        o_fast["mask_logit"], o_ref["mask_logit"], rtol=1e-4, atol=1e-4
    )
    for lvl in o_ref["flow"]:
        np.testing.assert_allclose(
            o_fast["flow"][lvl], o_ref["flow"][lvl], rtol=1e-4, atol=1e-4
        )


def test_stem_s2d_odd_dims_fallback():
    """Odd spatial dims take the plain-conv fallback and still match."""
    from deepim_tpu.models.flownet import Conv, StemConv

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 45, 33, 6))
    fast = StemConv(64, 7, 2, jnp.float32, name="conv1")
    ref = Conv(64, 7, 2, jnp.float32, name="conv1")
    vf = fast.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    jax.tree.map(np.testing.assert_array_equal, vf, vr)
    np.testing.assert_allclose(fast.apply(vf, x), ref.apply(vr, x),
                               rtol=1e-5, atol=1e-5)


def test_pose_only_skips_decoder_same_pose_outputs():
    """pose_only=True (the refine-loop fast path) must produce bit-equal
    pose head outputs while omitting the flow/mask heads."""
    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          with_flow=True, with_mask=True, fc_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, H, W, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(variables, x)
    fast = model.apply(variables, x, pose_only=True)
    assert "flow" in full and "mask_logit" in full
    assert "flow" not in fast and "mask_logit" not in fast
    np.testing.assert_array_equal(np.asarray(fast["rot_raw"]),
                                  np.asarray(full["rot_raw"]))
    np.testing.assert_array_equal(np.asarray(fast["trans"]),
                                  np.asarray(full["trans"]))


def test_euler_rot_type_end_to_end():
    """network.rot_type=euler (reference ROT_TYPE): 3-dim rot head,
    zero-init decodes to the identity quaternion, and a known triplet
    decodes through the geometry euler2quat."""
    from deepim_tpu.geometry import euler2quat

    model = DeepIMFlowNet(num_classes=2, dtype=jnp.float32,
                          rot_type="euler")
    x = jnp.zeros((2, H, W, 6))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["rot_raw"].shape == (2, 2, 3)
    quat = decode_rot(select_class(out["rot_raw"], jnp.array([0, 1])),
                      "euler")
    np.testing.assert_allclose(quat, np.tile([1, 0, 0, 0], (2, 1)),
                               atol=1e-6)
    raw = jnp.array([[0.3, -0.2, 0.5]])
    np.testing.assert_allclose(
        decode_rot(raw, "euler"),
        euler2quat(raw[:, 0], raw[:, 1], raw[:, 2]),
        atol=1e-6,
    )


def test_fast_conv_transpose_matches_flax():
    """FastConvTranspose (phase-decomposed deconv, DESIGN §20) must equal
    nn.ConvTranspose((4,4)/s2/SAME) numerically on the same params —
    including the odd decoder heights (15x20) and tiny bottleneck."""
    import flax.linen as nn

    from deepim_tpu.models.flownet import FastConvTranspose

    for (h, w, c, o) in [(8, 10, 16, 8), (15, 20, 12, 6), (6, 6, 3, 2),
                         (1, 1, 4, 4)]:
        x = jax.random.normal(jax.random.PRNGKey(h * w), (2, h, w, c),
                              jnp.float32)
        fast = FastConvTranspose(o, dtype=jnp.float32)
        ref = nn.ConvTranspose(o, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=jnp.float32, param_dtype=jnp.float32)
        vf = fast.init(jax.random.PRNGKey(0), x)
        # identical param tree (kernel/bias names and shapes)
        vr = ref.init(jax.random.PRNGKey(0), x)
        assert jax.tree.map(lambda a: a.shape, vf) == \
            jax.tree.map(lambda a: a.shape, vr)
        y_fast = fast.apply(vf, x)
        y_ref = ref.apply(vf, x)
        assert y_fast.shape == (2, 2 * h, 2 * w, o) == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_fast_deconv_model_parity():
    """The whole decoder with fast_deconv on/off restores the same
    checkpoint tree and produces matching flow/mask outputs."""
    kw = dict(num_classes=2, dtype=jnp.float32, with_flow=True,
              with_mask=True, fc_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 96, 6))
    slow = DeepIMFlowNet(**kw, fast_deconv=False)
    fast = DeepIMFlowNet(**kw, fast_deconv=True)
    v = slow.init(jax.random.PRNGKey(0), x)
    v2 = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, v) == \
        jax.tree.map(lambda a: a.shape, v2)
    out_s = slow.apply(v, x)
    out_f = fast.apply(v, x)
    for lvl in out_s["flow"]:
        np.testing.assert_allclose(np.asarray(out_f["flow"][lvl]),
                                   np.asarray(out_s["flow"][lvl]),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f["mask_logit"]),
                               np.asarray(out_s["mask_logit"]),
                               rtol=2e-4, atol=2e-4)
