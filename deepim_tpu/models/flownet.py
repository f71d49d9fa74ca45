"""FlowNetS-backbone DeepIM network: flow + mask aux heads and a delta-pose head.

TPU-native rebuild of the reference's symbol graph
(``deepim/symbols/deepim_flownet*.py §get_symbol``): a FlowNetS encoder over
the channel-concatenated (observed, rendered) crop pair, a deconv decoder
with multi-scale flow predictions, a foreground-mask head, and a delta-pose
head (two FC layers off the encoder bottleneck → per-class rotation +
translation).

TPU-first design decisions (vs the MXNet reference):

- **NHWC layout** (XLA's native conv layout on TPU) instead of NCHW.
- **bfloat16 compute, float32 params** (``dtype`` field); the MXU runs convs
  in bf16 at full throughput; losses/pose decode stay f32.
- Static input resolution (default 480x640, the reference's network input
  after dynamic zoom) — no MutableModule rebinding (SURVEY.md §7 hard-part
  5): the zoom op already normalizes every crop to this shape.
- The pose head's FC stack is one big MXU matmul (flatten of the 1/64-scale
  bottleneck), matching the reference behaviorally; a cheaper
  global-average-pool variant is available via ``pose_head="gap"``.
- Rotation output is a raw 4-vector decoded as a normalized quaternion
  (``rot_type="quat"``) or 3 euler angles (``rot_type="euler"``), per-class
  like the reference (heads emit ``num_classes`` copies; the caller selects
  by class index).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepim_tpu.geometry.rotations import quat_normalize, euler2quat

# Decoder levels carrying flow predictions, finest last. Level k predicts at
# 1/2^k of the input resolution (FlowNetS predicts at levels 6..2).
FLOW_LEVELS = (6, 5, 4, 3, 2)


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _quantize_int8(x, axes):
    """Symmetric int8 quantization → (int8 values, f32 scale).

    ``axes`` are reduced for the max-abs scale (kept as size-1 dims so the
    scale broadcasts back).  Zero-point is 0, so zero padding stays exact.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _quantize_int8_static(x, scale):
    """Symmetric int8 quantization with a FIXED (calibrated) scale.

    Unlike :func:`_quantize_int8` there is no max-abs reduction over the
    activation — the round/clip is pure elementwise work that XLA fuses
    into the producing op's epilogue, and the tensor that reaches HBM
    between layers is int8 (half of bf16 traffic).  Out-of-calibration
    values saturate at ±127 (symmetric clip).  ``scale`` is a calibrated
    python float, or a tuple of per-channel floats broadcast over the
    trailing (channel) axis.
    """
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _calib_sows(module, x) -> None:
    """Record calibration statistics for one quantized layer.

    Four parallel stats per layer (all DCE'd unless the ``quant_stats``
    collection is mutable, i.e. outside calibration they cost nothing):
    scalar and per-channel max-abs, and scalar and per-channel 99.9th
    percentile of |x|.  ``calibrate_act_scales(mode=...)`` picks one;
    percentile clipping trades saturation of the 0.1% activation tail
    for 8-bit resolution on the 99.9% body (round-3 VERDICT #5).
    """
    ax = tuple(range(x.ndim - 1))
    absx = jnp.abs(x.astype(jnp.float32))
    module.sow("quant_stats", "amax", jnp.max(absx),
               reduce_fn=jnp.maximum,
               init_fn=lambda: jnp.zeros((), jnp.float32))
    module.sow("quant_stats", "amax_c", jnp.max(absx, axis=ax),
               reduce_fn=jnp.maximum,
               init_fn=lambda: jnp.zeros((x.shape[-1],), jnp.float32))
    module.sow("quant_stats", "p999", jnp.percentile(absx, 99.9),
               reduce_fn=jnp.maximum,
               init_fn=lambda: jnp.zeros((), jnp.float32))
    module.sow("quant_stats", "p999_c", jnp.percentile(absx, 99.9, axis=ax),
               reduce_fn=jnp.maximum,
               init_fn=lambda: jnp.zeros((x.shape[-1],), jnp.float32))


def _int8_conv(x, kernel, strides, padding, act_scale=None):
    """NHWC conv with both operands int8-quantized on the fly.

    Activations use dynamic per-sample scales (axes 1-3) — or, when
    ``act_scale`` (a calibrated python float) is given, one static scale
    with no reduction pass (see :func:`_quantize_int8_static`).  Weights
    use per-output-channel scales (axes 0-2); the int32 accumulator is
    exact as long as the contraction depth K satisfies K·127² < 2³¹
    (asserted below at trace time; the repo's worst case is the pose
    head's fc1 at K = 8·10·1024 = 81,920 → ≈1.32e9, a ~1.6× margin —
    see QDense), so the only error is the two roundings.  The MXU runs
    int8×int8→int32 at twice the bf16 rate on v5e — this is the
    inference-throughput lever.
    """
    k_depth = kernel.shape[0] * kernel.shape[1] * kernel.shape[2]
    assert k_depth * 127 * 127 < 2 ** 31, (
        f"int8 conv contraction depth {k_depth} could overflow int32")
    if isinstance(act_scale, tuple):
        # Per-channel calibrated scales: quantize x channel-wise and fold
        # the scales into the (float) kernel's input-channel axis before
        # weight quantization — conv(x/s_c, W*s_c) == conv(x, W), so the
        # int8 matmul itself is unchanged and sx collapses to 1.
        s = jnp.asarray(act_scale, jnp.float32)
        xq, sx = _quantize_int8_static(x, act_scale), 1.0
        kernel = kernel * s.reshape(1, 1, -1, 1)
    elif act_scale is not None:
        xq, sx = _quantize_int8_static(x, act_scale), act_scale
    else:
        xq, sx = _quantize_int8(x, axes=(1, 2, 3))
    kq, sk = _quantize_int8(kernel, axes=(0, 1, 2))
    y = jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * sx * sk.reshape(1, 1, 1, -1)


class Conv(nn.Module):
    """Conv + LeakyReLU(0.1), SAME padding (FlowNetS style).

    ``sym_pad`` switches to explicit symmetric padding ``k//2`` on both
    sides — MXNet's convention.  For stride 1 (odd k) it is identical to
    SAME; for the stride-2 encoder convs XLA's SAME splits the padding
    (lo, hi) = (k//2 - 1, k//2), which mis-aligns taps by one pixel vs the
    reference (proven by the lax-VJP oracle in tests/test_convert_math.py).
    Converted MXNet weights need ``mxnet_pad=True`` on the model.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.bfloat16
    sym_pad: bool = False
    quant: str = "none"  # "int8": on-the-fly quantized conv (same params)
    # calibrated static activation scale (float, or per-channel tuple)
    act_scale: float | tuple | None = None

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        pad = ((p, p), (p, p)) if self.sym_pad else "SAME"
        if self.quant == "int8":
            kernel, bias = _ConvParams(
                (self.kernel, self.kernel, x.shape[-1], self.features),
                name="Conv_0",
            )()
            if self.act_scale is None and not self.is_initializing():
                # dynamic mode doubles as calibration; guarded so init()
                # (which makes every collection mutable) keeps the variable
                # tree identical to the plain model's — checkpoints restore
                # interchangeably (tests/test_quant.py).
                _calib_sows(self, x)
            y = _int8_conv(x, kernel, (self.stride, self.stride), pad,
                           act_scale=self.act_scale)
            return leaky((y + bias).astype(self.dtype))
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return leaky(x)


class _ConvParams(nn.Module):
    """Bare conv kernel+bias params, matching ``nn.Conv``'s names/shapes/init.

    Lets :class:`StemConv` own parameters at the exact checkpoint path a
    wrapped ``nn.Conv`` would use (``<parent>/Conv_0/{kernel,bias}``) while
    driving the convolution itself through ``lax`` with a rearranged kernel.
    """

    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.kshape,
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],),
                       jnp.float32)
        return k, b


class StemConv(nn.Module):
    """conv1 (7x7/s2) with an exact space-to-depth MXU fast path.

    A 7x7/s2 conv over a 6-channel input runs the MXU at ~30% (the
    contracted dim is 7*6=42 per tap row; XLA also inserts a full-tensor
    layout copy to feed it batch-minor).  Space-to-depth by 2 rewrites it
    as a mathematically *identical* 4x4/s1 conv over 4x the channels
    (kernel taps regrouped by output-row parity; the 8th tap row/col is
    zero) — the standard MLPerf ResNet TPU stem trick.  Parameters are
    identical to the plain path (same path, shape, and init), so either
    path loads any checkpoint.
    """

    features: int
    kernel: int = 7
    stride: int = 2
    dtype: Any = jnp.bfloat16
    sym_pad: bool = False  # MXNet symmetric padding (see Conv)
    quant: str = "none"  # "int8": quantized conv (same params, see Conv)
    # calibrated static activation scale (float, or per-channel tuple of
    # length c — the PRE-s2d channel count; the s2d branch tiles it x4)
    act_scale: float | tuple | None = None

    @nn.compact
    def __call__(self, x):
        kk, ss = self.kernel, self.stride
        c = x.shape[-1]
        kernel, bias = _ConvParams((kk, kk, c, self.features),
                                   name="Conv_0")()
        if (self.quant == "int8" and self.act_scale is None
                and not self.is_initializing()):
            # stats measured on pre-s2d x (s2d only rearranges/zero-pads,
            # so scalar stats match and per-channel stats stay c-long);
            # init-guarded to keep the init variable tree checkpoint-clean.
            _calib_sows(self, x)
        b_, h, w = x.shape[0], x.shape[1], x.shape[2]
        dt = self.dtype
        if ss == 2 and h % 2 == 0 and w % 2 == 0:
            if self.sym_pad:
                # MXNet symmetric padding k//2; odd k makes the padded
                # extent even already.
                lo = hi = kk // 2
            else:
                # SAME padding for even dims & stride 2: (lo, hi) =
                # (k//2 - 1, k//2); pad hi one extra so the padded extent
                # is even.
                lo = kk // 2 - 1
                hi = kk // 2 + (kk % 2)
            kb = (kk + 1) // 2  # kernel extent in block space
            xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
            h2, w2 = (h + lo + hi) // 2, (w + lo + hi) // 2
            xs = xp.reshape(b_, h2, 2, w2, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h2, w2, 4 * c)
            kp = jnp.pad(kernel, ((0, 2 * kb - kk), (0, 2 * kb - kk),
                                  (0, 0), (0, 0)))
            kp = kp.reshape(kb, 2, kb, 2, c, self.features)
            kp = kp.transpose(0, 2, 1, 3, 4, 5)
            kp = kp.reshape(kb, kb, 4 * c, self.features)
            if self.quant == "int8":
                # xs channel j holds original channel j % c (the s2d
                # reshape is (dy, dx, c)-major), so per-channel scales
                # tile x4 by python-tuple repetition.
                s2d_scale = (tuple(self.act_scale) * 4
                             if isinstance(self.act_scale, tuple)
                             else self.act_scale)
                y = _int8_conv(xs, kp, (1, 1), "VALID",
                               act_scale=s2d_scale).astype(dt)
            else:
                y = jax.lax.conv_general_dilated(
                    xs.astype(dt), kp.astype(dt), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        else:  # odd input dims: plain path (identical math to nn.Conv)
            p = kk // 2
            pad = [(p, p), (p, p)] if self.sym_pad else "SAME"
            if self.quant == "int8":
                y = _int8_conv(x, kernel, (ss, ss), pad,
                               act_scale=self.act_scale).astype(dt)
            else:
                y = jax.lax.conv_general_dilated(
                    x.astype(dt), kernel.astype(dt), (ss, ss), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        return leaky(y + bias.astype(dt))


class QDense(nn.Module):
    """int8-quantized Dense with ``nn.Dense``'s exact param names/shapes.

    Per-sample activation scales, per-output-column weight scales; the
    checkpoint tree is interchangeable with a plain ``nn.Dense`` of the
    same name.
    """

    features: int
    # calibrated static activation scale (float, or per-feature tuple)
    act_scale: float | tuple | None = None

    @nn.compact
    def __call__(self, x):
        # int32 accumulator exactness bound (the repo's worst case is fc1's
        # 8·10·1024 = 81,920-deep contraction: ·127² ≈ 1.32e9, ~1.6x margin)
        assert x.shape[-1] * 127 * 127 < 2 ** 31, (
            f"int8 dense contraction depth {x.shape[-1]} could overflow "
            "int32")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if isinstance(self.act_scale, tuple):
            # per-feature scales fold into the kernel rows (see _int8_conv)
            s = jnp.asarray(self.act_scale, jnp.float32)
            xq, sx = _quantize_int8_static(x, self.act_scale), 1.0
            kernel = kernel * s[:, None]
        elif self.act_scale is not None:
            xq, sx = _quantize_int8_static(x, self.act_scale), self.act_scale
        else:
            if not self.is_initializing():  # keep init tree checkpoint-clean
                _calib_sows(self, x)
            xq, sx = _quantize_int8(x, axes=(1,))
        kq, sk = _quantize_int8(kernel, axes=(0,))
        y = jax.lax.dot_general(xq, kq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * sx * sk + bias


class FastConvTranspose(nn.Module):
    """``nn.ConvTranspose((4, 4), strides=(2, 2), padding="SAME")`` —
    exact same math and parameter tree, MXU-shaped execution.

    XLA lowers a transposed conv to ``conv_general_dilated`` with
    ``lhs_dilation=2`` (the input zero-stuffed 2x in each spatial dim),
    which the TPU backend executes catastrophically badly at decoder
    sizes: profiling the flagship train step measured the five-level
    decoder FORWARD at 318 ms of a 422 ms step, <1% MFU (while the
    encoder ran at 38%) — the round-3 "backward deconvs" guess had the
    direction wrong.  The fix is the stride-2 phase decomposition (the
    reverse of StemConv's space-to-depth): with SAME padding (pad 2,2)
    output row 2i+p draws only kernel rows {p, p+2} at input rows
    {i+p-1, i+p}, so the whole deconv is ONE dense VALID 2x2 conv of the
    1-padded input with the phase-major sub-kernel stack
    ``W[py::2, px::2]`` -> (2, 2, C, 4*O), followed by slicing the four
    phase grids and a depth-to-space interleave.  Bit-equal parameters
    (reads the same ``kernel``/``bias``), numerically equal output
    (tests/test_model_losses.py parity test).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        o = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, c, o), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (o,), jnp.float32)
        dt = self.dtype
        # phase-major sub-kernel stack: phase (py, px) -> W[py::2, px::2]
        w_all = jnp.concatenate(
            [kernel[py::2, px::2] for py in (0, 1) for px in (0, 1)],
            axis=-1,
        )  # (2, 2, c, 4o)
        b_, h, w = x.shape[0], x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(dt)
        ph = jax.lax.conv_general_dilated(
            xp, w_all.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (b, h+1, w+1, 4o)
        grids = jnp.stack(
            [ph[:, :h, :w, :o], ph[:, :h, 1:, o:2 * o],
             ph[:, 1:, :w, 2 * o:3 * o], ph[:, 1:, 1:, 3 * o:]],
            axis=3,
        )  # (b, h, w, 4[py*2+px], o)
        y = grids.reshape(b_, h, w, 2, 2, o)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, o)
        return y + bias.astype(dt)


class Deconv(nn.Module):
    """Transposed conv 4x4/s2 + LeakyReLU (FlowNetS upsampling block)."""

    features: int
    dtype: Any = jnp.bfloat16
    fast: bool = True  # phase-decomposed deconv (see FastConvTranspose)

    @nn.compact
    def __call__(self, x):
        if self.fast:
            x = FastConvTranspose(self.features, self.dtype,
                                  name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return leaky(x)


def _predict_flow(x, dtype, name):
    """3x3 conv to 2 channels, no activation (FlowNetS predict_flow_k)."""
    return nn.Conv(
        2, (3, 3), padding="SAME", dtype=dtype, param_dtype=jnp.float32, name=name
    )(x)


def _crop_to(x, ref):
    """Crop spatial dims of x down to ref's (deconv SAME can overshoot by 1)."""
    return x[:, : ref.shape[1], : ref.shape[2], :]


class DeepIMFlowNet(nn.Module):
    """The full DeepIM network (reference ``get_symbol`` equivalent).

    Input:  ``x`` (B, H, W, C) — channel-concat of observed and rendered
            crops (6 ch for RGB pairs; +2 if depths appended per config).
    Output: dict with
        ``rot_raw``   (B, num_classes, rot_dim) raw rotation head output,
        ``trans``     (B, num_classes, 3) untangled (vx, vy, vz),
        ``flow``      {level: (B, H/2^k, W/2^k, 2)} when with_flow,
        ``mask_logit``(B, H/4, W/4, 1) when with_mask.
    """

    num_classes: int = 1
    rot_type: str = "quat"  # "quat" | "euler"
    with_flow: bool = True
    with_mask: bool = True
    # 8-channel input mode (reference cfg option: observed+rendered RGB
    # plus the two segmentation masks).  The conv stack is channel-
    # agnostic; this flag tells the train/refine drivers to append the
    # rendered mask (depth > 0) and the observed-mask estimate.
    input_mask: bool = False
    # +2 depth channels (reference INPUT_DEPTH): rendered + observed depth
    # crops, normalized by the current estimate's object z.  As with
    # input_mask, the conv stack is channel-agnostic; the drivers append.
    input_depth: bool = False
    pose_head: str = "flatten"  # "flatten" (reference) | "gap" (cheap)
    fc_dim: int = 1024
    # Fixed per-component scale on the translation head so raw outputs are
    # O(1): (vx, vy) targets are tens of crop pixels, vz is a log-ratio
    # ~0.1 — without this the optimizer must grow the head weights by 10-
    # 100x before any signal reaches the features (pure reparameterization;
    # the reference's heads face the same conditioning problem and lean on
    # long schedules instead).
    trans_scale: tuple = (20.0, 20.0, 0.5)
    dtype: Any = jnp.bfloat16
    # Exact space-to-depth rewrite of conv1 (see StemConv) — same params,
    # same math.  OFF by default: on v5e XLA materializes the s2d
    # rearrangement as ~7 ms of pad/reshape/transpose data formatting and
    # the 4x4x24 conv compiles no faster than the 7x7x6 one (measured via
    # xprof; net +5.5 ms/iteration).  Kept (with its equivalence test) for
    # a future variant where the zoom/render producers emit the s2d layout
    # directly.
    stem_s2d: bool = False
    # Phase-decomposed decoder deconvs (FastConvTranspose): exact same
    # math/params (checkpoints interchangeable both ways).  Measured
    # NEUTRAL on v5e at flagship shapes — full decoder forward 22.4 ms
    # phase-decomposed vs 20.5 ms ConvTranspose; the "slow decoder" the
    # rewrite targeted was actually the flow-GT visibility gather
    # (DESIGN §20), so the plain lowering stays the default.  Kept (with
    # its parity test) for backends where lhs-dilated convs do regress.
    fast_deconv: bool = False
    # Fixed bottleneck grid for the flatten pose head.  When set, a
    # bottleneck whose spatial dims differ (the network ran at a coarser
    # input resolution) is bilinearly resized to this grid before the
    # flatten, so ONE fc1 weight matrix serves every resolution — the
    # coarse-to-fine refinement schedule (early refine iterations at half
    # resolution) shares all parameters with the full-resolution model and
    # loads its checkpoints unchanged.  None = plain flatten (the exact
    # reference head).
    head_grid: tuple | None = None
    # MXNet symmetric conv padding (pad = k//2 both sides).  XLA's SAME
    # splits stride-2 padding asymmetrically, shifting taps one pixel vs
    # the reference's conv1/conv2/conv3 (proven: tests/test_convert_math).
    # Set True when loading converted reference weights; False (default)
    # keeps SAME for self-trained checkpoints' backward compatibility.
    mxnet_pad: bool = False
    # "int8": quantized inference — the encoder convs and the two pose-
    # head FCs run as symmetric int8 MXU ops (dynamic per-sample
    # activation scales, per-output-channel weight scales).  The
    # parameter tree is UNCHANGED (quantization happens on the fly), so
    # any bf16/f32-trained checkpoint loads directly.  Inference-only:
    # rounding has no gradient, so training drivers always build with
    # "none" (train/train.py §make_model).  The decoder/mask branch is
    # never quantized (it is train-time supervision; eval runs pose_only).
    quant: str = "none"
    # Calibrated STATIC activation scales: a hashable tuple of
    # (layer_name, scale) pairs from models/quant.py §calibrate_act_scales.
    # With quant="int8" and a layer's name present here, that layer's
    # activations quantize with the fixed scale — no max-abs reduction
    # pass, so the round/clip fuses into the producer's epilogue and the
    # inter-layer tensor is int8 in HBM (half of bf16 traffic).  Empty
    # (default) = dynamic per-sample scales (which also serve as the
    # calibration mode: running with mutable=["quant_stats"] records each
    # layer's max-abs).
    act_scales: tuple = ()

    @nn.compact
    def __call__(self, x, pose_only: bool = False):
        """``pose_only=True`` skips the flow/mask decoder entirely — the
        refine loop only consumes the pose head, and the FlowNetS decoder
        (5 deconv+predict stages) is train-time supervision, not inference
        work.  Parameters are unaffected (the decoder branch is simply not
        traced), so any checkpoint serves both modes."""
        dt = self.dtype
        x = x.astype(dt)
        sp = self.mxnet_pad
        q = self.quant
        sc = dict(self.act_scales)

        # --- FlowNetS encoder (channels per the public FlowNetS arch) ---
        stem = StemConv if self.stem_s2d else Conv
        c1 = stem(64, 7, 2, dt, sp, q, sc.get("conv1"), name="conv1")(x)
        c2 = Conv(128, 5, 2, dt, sp, q, sc.get("conv2"), name="conv2")(c1)
        c3 = Conv(256, 5, 2, dt, sp, q, sc.get("conv3"), name="conv3")(c2)
        c3 = Conv(256, 3, 1, dt, sp, q, sc.get("conv3_1"), name="conv3_1")(c3)
        c4 = Conv(512, 3, 2, dt, sp, q, sc.get("conv4"), name="conv4")(c3)
        c4 = Conv(512, 3, 1, dt, sp, q, sc.get("conv4_1"), name="conv4_1")(c4)
        c5 = Conv(512, 3, 2, dt, sp, q, sc.get("conv5"), name="conv5")(c4)
        c5 = Conv(512, 3, 1, dt, sp, q, sc.get("conv5_1"), name="conv5_1")(c5)
        c6 = Conv(1024, 3, 2, dt, sp, q, sc.get("conv6"), name="conv6")(c5)
        c6 = Conv(1024, 3, 1, dt, sp, q, sc.get("conv6_1"),
                  name="conv6_1")(c6)

        out: dict[str, Any] = {}

        # --- flow decoder (FlowNetS refinement stack) ---
        if (self.with_flow or self.with_mask) and not pose_only:
            flows = {}
            feat = c6
            skips = {5: c5, 4: c4, 3: c3, 2: c2}
            deconv_ch = {5: 512, 4: 256, 3: 128, 2: 64}
            flow = _predict_flow(feat, dt, "predict_flow6")
            flows[6] = flow
            for lvl in (5, 4, 3, 2):
                up_feat = Deconv(deconv_ch[lvl], dt, fast=self.fast_deconv,
                                 name=f"deconv{lvl}")(feat)
                if self.fast_deconv:
                    up_flow = FastConvTranspose(
                        2, dt, name=f"upsample_flow{lvl + 1}to{lvl}")(flow)
                else:
                    up_flow = nn.ConvTranspose(
                        2, (4, 4), strides=(2, 2), padding="SAME", dtype=dt,
                        param_dtype=jnp.float32,
                        name=f"upsample_flow{lvl + 1}to{lvl}",
                    )(flow)
                skip = skips[lvl]
                feat = jnp.concatenate(
                    [skip, _crop_to(up_feat, skip), _crop_to(up_flow, skip)], axis=-1
                )
                flow = _predict_flow(feat, dt, f"predict_flow{lvl}")
                flows[lvl] = flow
            if self.with_flow:
                out["flow"] = {k: v.astype(jnp.float32) for k, v in flows.items()}

            if self.with_mask:
                # Mask head off the finest decoder features (1/4 scale),
                # reference: deconv branch → sigmoid FG mask.
                m = Conv(64, 3, 1, dt, name="mask_conv")(feat)
                m = nn.Conv(
                    1, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32,
                    name="mask_pred",
                )(m)
                out["mask_logit"] = m.astype(jnp.float32)

        # --- pose head (reference: flatten conv6_1 → FC1024 → FC1024) ---
        if self.pose_head == "flatten":
            if (self.head_grid is not None
                    and c6.shape[1:3] != tuple(self.head_grid)):
                c6 = jax.image.resize(
                    c6, (c6.shape[0], *self.head_grid, c6.shape[3]),
                    method="bilinear",
                )
            h = c6.reshape(c6.shape[0], -1)
        elif self.pose_head == "gap":
            h = jnp.mean(c6, axis=(1, 2))
        else:
            raise ValueError(self.pose_head)
        if q == "int8":
            h = leaky(QDense(self.fc_dim, sc.get("fc1"),
                             name="fc1")(h)).astype(dt)
            h = leaky(QDense(self.fc_dim, sc.get("fc2"),
                             name="fc2")(h)).astype(dt)
        else:
            h = leaky(nn.Dense(self.fc_dim, dtype=dt, param_dtype=jnp.float32,
                               name="fc1")(h))
            h = leaky(nn.Dense(self.fc_dim, dtype=dt, param_dtype=jnp.float32,
                               name="fc2")(h))

        rot_dim = 4 if self.rot_type == "quat" else 3
        # Zero-init final heads: the initial delta is exactly identity
        # (quat bias (1,0,0,0)), so an untrained net leaves poses unchanged
        # (reference inits new heads ~N(0, 0.01); zero-init is the stable
        # jax-idiomatic equivalent with an explicit identity bias).
        if self.rot_type == "quat":
            rot_bias = nn.initializers.constant(
                jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), self.num_classes)
            )
        else:
            rot_bias = nn.initializers.zeros
        rot = nn.Dense(
            self.num_classes * rot_dim, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=rot_bias, name="fc_rot",
        )(h.astype(jnp.float32))
        trans = nn.Dense(
            self.num_classes * 3, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="fc_trans",
        )(h.astype(jnp.float32))

        out["rot_raw"] = rot.reshape(-1, self.num_classes, rot_dim)
        out["trans"] = trans.reshape(-1, self.num_classes, 3) * jnp.asarray(
            self.trans_scale, jnp.float32
        )
        return out


def bottleneck_grid(input_height: int, input_width: int) -> tuple[int, int]:
    """Spatial dims of conv6_1 for a given input (six SAME stride-2 convs)."""
    return (-(-input_height // 64), -(-input_width // 64))


def select_class(per_class: jax.Array, class_idx: jax.Array) -> jax.Array:
    """(B, num_classes, D), (B,) int -> (B, D) — the reference's class-aware
    head selection (heads emit all classes; the sample's class picks one).

    A class-agnostic model (num_classes=1, the ModelNet unseen-category
    mode) shares one head: any class index clamps to 0.
    """
    idx = jnp.minimum(class_idx, per_class.shape[1] - 1)
    idx = idx[:, None, None].astype(jnp.int32)
    return jnp.take_along_axis(per_class, idx, axis=1)[:, 0]


def decode_rot(rot_raw: jax.Array, rot_type: str) -> jax.Array:
    """Raw rotation head output (B, rot_dim) -> unit quaternion (B, 4)."""
    if rot_type == "quat":
        return quat_normalize(rot_raw)
    if rot_type == "euler":
        return euler2quat(rot_raw[..., 0], rot_raw[..., 1], rot_raw[..., 2])
    raise ValueError(rot_type)


def normalize_depth(depth: jax.Array, z: jax.Array) -> jax.Array:
    """(B, H, W) metric depth -> (B, H, W, 1) input_depth channel.

    Normalized by the current estimate's object distance z (d/z - 1), so
    the channel is O(0.1) and invariant to absolute depth scale;
    background (depth 0) stays 0 (reference INPUT_DEPTH semantics, TPU
    choice of normalization).
    """
    zref = jnp.maximum(z, 1e-6)[:, None, None]
    return jnp.where(depth > 0, depth / zref - 1.0, 0.0)[..., None]


def network_input(obs_rgb: jax.Array, ren_rgb: jax.Array,
                  extras: Sequence[jax.Array] = ()) -> jax.Array:
    """Assemble the (B, H, W, 6+) network input from the two crops.

    Images are expected in [0, 1]; the reference subtracts a pixel mean —
    here we center to [-0.5, 0.5] (mean handling is a free choice since we
    train from scratch).
    """
    parts = [obs_rgb - 0.5, ren_rgb - 0.5, *extras]
    return jnp.concatenate(parts, axis=-1)
