"""Ground-truth optical flow between rendered and observed views.

TPU-native rebuild of mx-DeepIM ``lib/pair_matching/flow.py §calc_flow``
(host numpy hot loop in the reference): back-project the *rendered* depth
map at the source pose, move those 3D points through the relative pose
(src → tgt), re-project, and report per-pixel displacement.  Optionally
checks visibility against the observed (target-pose) depth map so occluded
pixels are excluded from the flow loss.

Fully vectorized jax; runs inside the jitted training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.se3 import se3_mul, se3_inverse
from deepim_tpu.ops.resample import nearest_sample

_HI = jax.lax.Precision.HIGHEST


def calc_flow(
    depth_src: jax.Array,  # (H, W) rendered depth at src pose (0 = bg)
    pose_src: jax.Array,  # (3, 4)
    pose_tgt: jax.Array,  # (3, 4)
    k: jax.Array,  # (3, 3)
    depth_tgt: jax.Array | None = None,  # (H, W) for occlusion check
    occlusion_tol: float = 0.02,  # meters
    occlusion_stride: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """→ (flow (H, W, 2) src→tgt in pixels, valid (H, W) bool).

    ``valid`` is the rendered foreground, intersected with the visibility
    check when ``depth_tgt`` is given (point not behind the observed
    surface by more than ``occlusion_tol``).

    ``occlusion_stride > 1`` evaluates the visibility check at each s-px
    block's CENTER pixel and nearest-upsamples the result.  Flow values
    are exact wherever ``valid`` is True; pixels the blockwise mask turns
    off are zeroed like any other invalid pixel (consumers that want raw
    foreground flow should use stride 1).  Rationale: the check is a
    scattered gather from
    ``depth_tgt``, which XLA:TPU executes at ~70M indices/s — at full res
    it was 140 ms of a 427 ms flagship train step (2×B32×480×640), 83% of
    what round 4 misattributed to the decoder forward (DESIGN §20).  The
    flow loss consumes ``valid`` only after average-pooling to the decoder
    pyramid, whose finest level is 1/4 scale (``losses.flow_epe_loss``),
    so stride 4 matches the supervision granularity exactly: the mask can
    differ from per-pixel only inside 4-px blocks that straddle an
    occlusion boundary.  Measured: 9.4 ms at stride 4, bit-identical
    training semantics elsewhere; stride 1 restores the reference's
    per-pixel check (lib/pair_matching/flow.py computes it per pixel on
    the host).
    """
    h, w = depth_src.shape
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]

    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    fg = depth_src > 0
    z = jnp.where(fg, depth_src, 1.0)
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    pts_src = jnp.stack([x, y, z], axis=-1)  # (H, W, 3) camera @ src pose

    rel = se3_mul(pose_tgt, se3_inverse(pose_src))  # src-cam → tgt-cam
    pts_tgt = (
        jnp.einsum("ij,hwj->hwi", rel[:, :3], pts_src, precision=_HI) + rel[:, 3]
    )
    z_t = jnp.maximum(pts_tgt[..., 2], 1e-6)
    u_t = fx * pts_tgt[..., 0] / z_t + cx
    v_t = fy * pts_tgt[..., 1] / z_t + cy

    flow = jnp.stack([u_t - u, v_t - v], axis=-1)
    valid = fg

    if depth_tgt is not None:
        s = occlusion_stride
        if s > 1:
            # Sample each s-px block at its CENTER pixel (s//2 offset): a
            # top-left representative is systematically biased toward one
            # corner near occlusion boundaries; the center halves the
            # worst-case boundary error at identical cost.
            o = s // 2
            coords = jnp.stack([u_t[o::s, o::s], v_t[o::s, o::s]], axis=-1)
            obs = nearest_sample(depth_tgt[..., None], coords,
                                 fill_value=0.0)[..., 0]
            vis_s = (obs > 0) & (z_t[o::s, o::s] <= obs + occlusion_tol)
            visible = jnp.repeat(jnp.repeat(vis_s, s, axis=0),
                                 s, axis=1)
            # Center-offset grids can fall one block short of the border
            # when H or W is not a multiple of s; edge-extend to cover.
            pad_h = h - visible.shape[0]
            pad_w = w - visible.shape[1]
            if pad_h > 0 or pad_w > 0:
                visible = jnp.pad(visible,
                                  ((0, max(pad_h, 0)), (0, max(pad_w, 0))),
                                  mode="edge")
            visible = visible[:h, :w]
        else:
            obs = nearest_sample(
                depth_tgt[..., None], jnp.stack([u_t, v_t], axis=-1),
                fill_value=0.0,
            )[..., 0]
            visible = (obs > 0) & (z_t <= obs + occlusion_tol)
        valid = valid & visible

    flow = jnp.where(valid[..., None], flow, 0.0)
    return flow, valid
