"""MXNet-checkpoint → flax-params converter (parity-harness plumbing).

The reference ships MXNet ``.params`` checkpoints (dict of ``arg:<name>`` /
``aux:<name>`` NDArrays, saved by ``MutableModule.fit``'s checkpoint
callback) with FlowNetS layer names.  This module maps those tensors onto
:class:`deepim_tpu.models.flownet.DeepIMFlowNet`'s parameter tree:

- conv weights: MXNet OIHW -> flax HWIO
- deconv (MXNet ``Deconvolution``) weights: MXNet IOHW -> flax ConvTranspose
  HWIO with the kernel spatially flipped (``flip_deconv=True``, default).
  MXNet's deconv is BY DEFINITION the gradient of conv wrt input;
  ``tests/test_convert_math.py`` proves the flipped conversion reproduces
  that semantics exactly (via a ``jax.vjp``-of-strided-conv oracle), so no
  real reference weights are needed to trust it.
- FC weights: MXNet (out, in) -> flax (in, out).

PADDING CAVEAT (also proven in test_convert_math): MXNet pads convs
symmetrically (``pad=k//2``); XLA's SAME splits stride-2 padding
(k//2-1, k//2), shifting conv1/conv2/conv3 taps one pixel.  Models
running converted reference weights must be built with
``DeepIMFlowNet(mxnet_pad=True)`` (cfg ``network.mxnet_pad``).

Input format: since MXNet isn't installed here, the loader takes a ``.npz``
(numpy archive of the same ``arg:name`` keys — the standard way reference
checkpoints are exported without an MXNet dependency).
"""

from __future__ import annotations

import numpy as np

# our flax module name -> reference MXNet layer base name
# (encoder/decoder names follow the public FlowNetS releases the reference
# initializes from; pose/mask head names follow deepim_flownet symbols).
NAME_MAP = {
    "conv1": "conv1",
    "conv2": "conv2",
    "conv3": "conv3",
    "conv3_1": "conv3_1",
    "conv4": "conv4",
    "conv4_1": "conv4_1",
    "conv5": "conv5",
    "conv5_1": "conv5_1",
    "conv6": "conv6",
    "conv6_1": "conv6_1",
    "predict_flow6": "predict_flow6",
    "predict_flow5": "predict_flow5",
    "predict_flow4": "predict_flow4",
    "predict_flow3": "predict_flow3",
    "predict_flow2": "predict_flow2",
    "deconv5": "deconv5",
    "deconv4": "deconv4",
    "deconv3": "deconv3",
    "deconv2": "deconv2",
    "upsample_flow6to5": "upsample_flow6to5",
    "upsample_flow5to4": "upsample_flow5to4",
    "upsample_flow4to3": "upsample_flow4to3",
    "upsample_flow3to2": "upsample_flow3to2",
    "fc1": "fc1",
    "fc2": "fc2",
    "fc_rot": "fc_rot",
    "fc_trans": "fc_trans",
}

_DECONV_LAYERS = {
    "deconv5", "deconv4", "deconv3", "deconv2",
    "upsample_flow6to5", "upsample_flow5to4", "upsample_flow4to3",
    "upsample_flow3to2",
}
_DENSE_LAYERS = {"fc1", "fc2", "fc_rot", "fc_trans"}


def conv_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def deconv_iohw_to_hwio(w: np.ndarray, flip: bool = True) -> np.ndarray:
    w = np.transpose(w, (2, 3, 0, 1))  # IOHW -> HWIO
    if flip:
        w = w[::-1, ::-1]
    return np.ascontiguousarray(w)


def convert_mxnet_dict(
    mx_params: dict[str, np.ndarray],
    flax_params: dict,
    flip_deconv: bool = True,
    strict: bool = False,
) -> tuple[dict, list[str]]:
    """Overlay MXNet tensors onto a flax params tree -> (new tree, missing).

    ``flax_params`` is ``variables['params']`` of an inited DeepIMFlowNet;
    layers without a matching MXNet tensor keep their init (the reference
    does the same when loading FlowNetS weights under new heads).
    """

    def get(name):
        for key in (f"arg:{name}", name):
            if key in mx_params:
                return np.asarray(mx_params[key])
        return None

    new = {}
    missing = []
    for mod_name, sub in flax_params.items():
        base = NAME_MAP.get(mod_name, mod_name)
        # flax module params live one level down (e.g. conv1/Conv_0) for
        # wrapped blocks, or directly for nn.Conv/Dense leaf modules.
        leaf = sub
        wrapper_key = None
        if "kernel" not in sub and len(sub) == 1:
            wrapper_key = next(iter(sub))
            leaf = sub[wrapper_key]
        w = get(f"{base}_weight")
        b = get(f"{base}_bias")
        if w is None:
            missing.append(mod_name)
            new[mod_name] = sub
            continue
        if mod_name in _DENSE_LAYERS:
            kernel = np.transpose(w, (1, 0))
        elif mod_name in _DECONV_LAYERS:
            kernel = deconv_iohw_to_hwio(w, flip=flip_deconv)
        else:
            kernel = conv_oihw_to_hwio(w)
        tgt = dict(leaf)
        if kernel.shape != np.shape(tgt["kernel"]):
            msg = (f"{mod_name}: mxnet {kernel.shape} vs "
                   f"flax {np.shape(tgt['kernel'])}")
            if strict:
                raise ValueError(msg)
            missing.append(mod_name + " (shape mismatch)")
            new[mod_name] = sub
            continue
        tgt["kernel"] = kernel.astype(np.float32)
        if b is not None and "bias" in tgt:
            tgt["bias"] = b.astype(np.float32)
        new[mod_name] = {wrapper_key: tgt} if wrapper_key else tgt
    return new, missing


def load_mxnet_npz(path: str) -> dict[str, np.ndarray]:
    """Load an exported reference checkpoint (.npz of arg:/aux: arrays)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def export_flax_to_mxnet_npz(flax_params: dict, path: str,
                             flip_deconv: bool = True) -> None:
    """Inverse conversion (flax -> arg:name npz) — round-trip test fixture
    and escape hatch for users moving weights back to the reference."""
    out = {}
    for mod_name, sub in flax_params.items():
        base = NAME_MAP.get(mod_name, mod_name)
        leaf = sub
        if "kernel" not in sub and len(sub) == 1:
            leaf = sub[next(iter(sub))]
        if "kernel" not in leaf:
            continue
        kernel = np.asarray(leaf["kernel"])
        if mod_name in _DENSE_LAYERS:
            w = np.transpose(kernel, (1, 0))
        elif mod_name in _DECONV_LAYERS:
            k2 = kernel[::-1, ::-1] if flip_deconv else kernel
            w = np.transpose(k2, (2, 3, 0, 1))
        else:
            w = np.transpose(kernel, (3, 2, 0, 1))
        out[f"arg:{base}_weight"] = np.ascontiguousarray(w)
        if "bias" in leaf:
            out[f"arg:{base}_bias"] = np.asarray(leaf["bias"])
    np.savez(path, **out)
