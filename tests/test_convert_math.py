"""Mathematical proof of the MXNet->flax weight-converter semantics.

The reference's checkpoints come from MXNet, whose ``Deconvolution`` is
the *gradient of convolution wrt its input* and whose conv padding is
symmetric (``pad=k//2`` both sides).  No reference weights exist in this
sandbox, but the conversion math is provable without them: this module
implements MXNet's exact conv/deconv semantics as lax oracles (the
deconv via ``jax.vjp`` of a strided conv — the definition) and asserts
that the converted kernels reproduce them through the flax layers
``DeepIMFlowNet`` is built from (SURVEY.md §4 parity-harness item).

Key proven facts:

- ``deconv_iohw_to_hwio(w, flip=True)`` + flax ``ConvTranspose``
  (4x4/s2, SAME) == MXNet Deconvolution(4x4/s2, pad=1) EXACTLY.
- stride-1 odd-kernel convs: flax SAME == MXNet pad=k//2 exactly.
- stride-2 odd-kernel convs (FlowNetS conv1 7x7, conv2/conv3 5x5): flax
  SAME mis-aligns by one pixel; ``mxnet_pad=True`` (symmetric padding)
  restores exact equality.  Converted reference weights must be run with
  ``DeepIMFlowNet(mxnet_pad=True)``.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from deepim_tpu.models.flownet import Conv, StemConv
from deepim_tpu.train.convert_mxnet import (
    conv_oihw_to_hwio,
    deconv_iohw_to_hwio,
)

rng = np.random.RandomState(0)


def mxnet_conv(x_nchw, w_oihw, stride, pad):
    """MXNet Convolution semantics (symmetric pad, NCHW/OIHW)."""
    return lax.conv_general_dilated(
        x_nchw, w_oihw, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def mxnet_deconv(x_nchw, w_iohw, stride, pad):
    """MXNet Deconvolution semantics — BY DEFINITION the gradient of
    ``mxnet_conv`` wrt its input, with the deconv's IOHW weight read as
    that conv's OIHW weight."""
    n, c_in, h, w = x_nchw.shape
    kh, kw = w_iohw.shape[2:]
    h2 = (h - 1) * stride - 2 * pad + kh
    w2 = (w - 1) * stride - 2 * pad + kw
    c_out = w_iohw.shape[1]

    def fwd(y):
        return mxnet_conv(y, jnp.asarray(w_iohw), stride, pad)

    _, vjp = jax.vjp(fwd, jnp.zeros((n, c_out, h2, w2), x_nchw.dtype))
    return vjp(jnp.asarray(x_nchw))[0]


def _nhwc(x_nchw):
    return jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))


def _nchw(x_nhwc):
    return jnp.transpose(x_nhwc, (0, 3, 1, 2))


def test_deconv_flip_is_exactly_mxnet_semantics():
    """The converter's spatial flip is PROVEN: flax ConvTranspose(4x4/s2,
    SAME) with deconv_iohw_to_hwio(w, flip=True) equals the VJP-defined
    MXNet deconv (pad=1) bit-for-bit; flip=False does not."""
    x = rng.randn(2, 3, 8, 10).astype(np.float32)
    w = rng.randn(3, 5, 4, 4).astype(np.float32)  # IOHW
    oracle = np.asarray(mxnet_deconv(x, w, 2, 1))

    mod = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME")
    var = {"params": {"kernel": jnp.asarray(deconv_iohw_to_hwio(w)),
                      "bias": jnp.zeros(5)}}
    out = np.asarray(_nchw(mod.apply(var, _nhwc(x))))
    np.testing.assert_array_equal(out, oracle)

    var_noflip = {"params": {
        "kernel": jnp.asarray(deconv_iohw_to_hwio(w, flip=False)),
        "bias": jnp.zeros(5)}}
    bad = np.asarray(_nchw(mod.apply(var_noflip, _nhwc(x))))
    assert np.abs(bad - oracle).max() > 1.0  # flip is load-bearing


def test_conv_stride1_same_equals_mxnet():
    x = rng.randn(2, 4, 9, 11).astype(np.float32)
    w = rng.randn(6, 4, 3, 3).astype(np.float32)  # OIHW
    oracle = np.asarray(mxnet_conv(jnp.asarray(x), jnp.asarray(w), 1, 1))
    mod = nn.Conv(6, (3, 3), padding="SAME")
    var = {"params": {"kernel": jnp.asarray(conv_oihw_to_hwio(w)),
                      "bias": jnp.zeros(6)}}
    out = np.asarray(_nchw(mod.apply(var, _nhwc(x))))
    np.testing.assert_array_equal(out, oracle)


def _flax_conv_out(w_oihw, x, stride, sym_pad, stem=False):
    k = w_oihw.shape[2]
    cls = StemConv if stem else Conv
    mod = cls(w_oihw.shape[0], k, stride, jnp.float32, sym_pad)
    var = mod.init(jax.random.PRNGKey(0), _nhwc(x))
    var = {"params": {"Conv_0": {
        "kernel": jnp.asarray(conv_oihw_to_hwio(w_oihw)),
        "bias": jnp.zeros(w_oihw.shape[0])}}}
    return np.asarray(_nchw(mod.apply(var, _nhwc(x))))


def test_conv_stride2_needs_mxnet_pad():
    """FlowNetS conv1 (7x7/s2) and conv2 (5x5/s2): SAME shifts taps by one
    pixel; mxnet_pad (symmetric) is exact.  leaky_relu is monotone and
    elementwise, so post-activation equality proves the conv itself."""
    x = rng.randn(2, 3, 16, 20).astype(np.float32)
    for k in (7, 5):
        w = rng.randn(8, 3, k, k).astype(np.float32)
        oracle = np.asarray(
            nn.leaky_relu(mxnet_conv(jnp.asarray(x), jnp.asarray(w), 2,
                                     k // 2), 0.1))
        sym = _flax_conv_out(w, x, 2, sym_pad=True)
        np.testing.assert_array_equal(sym, oracle)
        same = _flax_conv_out(w, x, 2, sym_pad=False)
        assert np.abs(same - oracle).max() > 1e-3  # SAME is NOT the ref


def test_stem_s2d_honors_mxnet_pad():
    """The space-to-depth conv1 fast path under mxnet_pad matches the
    MXNet oracle too (even input dims engage the rewrite)."""
    x = rng.randn(2, 6, 16, 20).astype(np.float32)
    w = rng.randn(8, 6, 7, 7).astype(np.float32)
    oracle = np.asarray(
        nn.leaky_relu(mxnet_conv(jnp.asarray(x), jnp.asarray(w), 2, 3), 0.1))
    out = _flax_conv_out(w, x, 2, sym_pad=True, stem=True)
    np.testing.assert_allclose(out, oracle, atol=2e-5)


def test_dense_transpose():
    from deepim_tpu.train.convert_mxnet import convert_mxnet_dict

    x = rng.randn(3, 7).astype(np.float32)
    w = rng.randn(4, 7).astype(np.float32)  # MXNet FC: (out, in)
    b = rng.randn(4).astype(np.float32)
    oracle = x @ w.T + b
    mod = nn.Dense(4)
    flax_params = jax.tree.map(
        np.asarray, mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    )
    new, missing = convert_mxnet_dict(
        {"arg:fc1_weight": w, "arg:fc1_bias": b}, {"fc1": flax_params})
    assert not missing
    out = np.asarray(mod.apply({"params": new["fc1"]}, jnp.asarray(x)))
    np.testing.assert_allclose(out, oracle, rtol=1e-6)


def test_two_layer_fixture_net_golden():
    """conv2(5x5/s2) -> leaky -> deconv(4x4/s2) -> leaky pipeline: the
    MXNet-semantics oracle vs flax layers with converted weights — the
    SURVEY §4 'fixture net with golden outputs' parity harness."""
    x = rng.randn(1, 3, 12, 16).astype(np.float32)
    w_conv = rng.randn(8, 3, 5, 5).astype(np.float32)  # OIHW
    b_conv = rng.randn(8).astype(np.float32)
    w_dec = rng.randn(8, 4, 4, 4).astype(np.float32)  # IOHW
    b_dec = rng.randn(4).astype(np.float32)

    h = mxnet_conv(jnp.asarray(x), jnp.asarray(w_conv), 2, 2)
    h = nn.leaky_relu(h + jnp.asarray(b_conv)[None, :, None, None], 0.1)
    g = mxnet_deconv(np.asarray(h), w_dec, 2, 1)
    oracle = np.asarray(
        nn.leaky_relu(g + jnp.asarray(b_dec)[None, :, None, None], 0.1))

    conv = Conv(8, 5, 2, jnp.float32, sym_pad=True)
    cvar = {"params": {"Conv_0": {
        "kernel": jnp.asarray(conv_oihw_to_hwio(w_conv)),
        "bias": jnp.asarray(b_conv)}}}
    dec = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME")
    dvar = {"params": {"kernel": jnp.asarray(deconv_iohw_to_hwio(w_dec)),
                       "bias": jnp.asarray(b_dec)}}
    out = nn.leaky_relu(dec.apply(dvar, conv.apply(cvar, _nhwc(x))), 0.1)
    np.testing.assert_allclose(np.asarray(_nchw(out)), oracle, atol=1e-5)


@pytest.mark.slow
def test_full_model_mxnet_roundtrip_with_pad_mode():
    """Export a tiny mxnet_pad model's weights to MXNet layout, convert
    back, and check identical outputs — the converter + pad mode
    round-trip at the whole-network level."""
    from deepim_tpu.models import DeepIMFlowNet
    from deepim_tpu.train.convert_mxnet import (
        convert_mxnet_dict, export_flax_to_mxnet_npz, load_mxnet_npz,
    )

    model = DeepIMFlowNet(num_classes=2, fc_dim=16, with_flow=True,
                          with_mask=False, dtype=jnp.float32, mxnet_pad=True)
    x = jnp.asarray(rng.randn(2, 64, 64, 6).astype(np.float32))
    var = model.init(jax.random.PRNGKey(1), x)
    ref = model.apply(var, x)

    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "w.npz")
    export_flax_to_mxnet_npz(var["params"], path)
    mx = load_mxnet_npz(path)
    np_params = jax.tree.map(np.asarray, var["params"])
    new, missing = convert_mxnet_dict(mx, np_params, strict=True)
    out = model.apply({"params": new}, x)
    np.testing.assert_allclose(np.asarray(out["rot_raw"]),
                               np.asarray(ref["rot_raw"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["flow"][2]),
                               np.asarray(ref["flow"][2]), atol=1e-6)
