"""Dynamic zoom-in: the fused on-device replacement for the reference's
host-side zoom CustomOps (``deepim/operator_py/zoom_image.py / zoom_flow.py /
zoom_mask.py / zoom_depth.py`` — cv2 crops+resizes running inside engine
execution on the host).

Behavioral contract (DeepIM paper §3.1 / reference semantics):

- The crop window is centered on the *current pose estimate's* projected
  object center, sized to the projected extent of the object's 3D bounding
  box, enlarged by a margin, with the network-input aspect ratio enforced
  (center preserved).
- The same window is applied to every tensor of the pair (observed RGB,
  observed depth/mask, flow, ...) so observed and rendered stay aligned.
- Flow values are rescaled by the zoom scale when cropped.
- The rendered image is **not resampled at all** here: the TPU-first design
  renders it directly into the crop by composing the crop with K
  (:func:`deepim_tpu.raster.camera.crop_intrinsics`) — one of the wins over
  the reference pipeline (render full frame → crop → resize).

All functions are jit/vmap-safe; shapes static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.se3 import transform_points, project_points
from deepim_tpu.ops.resample import resample_affine
from deepim_tpu.raster.camera import crop_intrinsics


class ZoomBox(NamedTuple):
    """Axis-aligned crop: source-image window + output scale factors."""

    x0: jax.Array  # left edge (px, source image)
    y0: jax.Array  # top edge
    sx: jax.Array  # out_px-per-src_px scale in x
    sy: jax.Array  # scale in y


def model_corners(extent_min: jax.Array, extent_max: jax.Array) -> jax.Array:
    """8 corners (8, 3) of the object AABB from per-axis min/max (3,)."""
    mins, maxs = extent_min, extent_max
    corners = jnp.stack(
        [
            jnp.stack([mins[0], mins[1], mins[2]]),
            jnp.stack([mins[0], mins[1], maxs[2]]),
            jnp.stack([mins[0], maxs[1], mins[2]]),
            jnp.stack([mins[0], maxs[1], maxs[2]]),
            jnp.stack([maxs[0], mins[1], mins[2]]),
            jnp.stack([maxs[0], mins[1], maxs[2]]),
            jnp.stack([maxs[0], maxs[1], mins[2]]),
            jnp.stack([maxs[0], maxs[1], maxs[2]]),
        ]
    )
    return corners


def compute_zoom_box(
    pose: jax.Array,  # (3, 4) current pose estimate
    k: jax.Array,  # (3, 3)
    corners: jax.Array,  # (8, 3) object-frame AABB corners
    out_size: tuple[int, int],  # (H_out, W_out) network input
    margin: float = 1.4,
    min_size_px: float = 40.0,
) -> ZoomBox:
    """Crop window from the projected 3D bbox at the current pose.

    The window is square-ish with the output aspect ratio, centered on the
    projected object center (reference: zoom center from the source pose's
    object center projection, not the bbox center, so the object center
    maps to the crop center and Δt vx/vy stay interpretable).
    """
    oh, ow = out_size
    cam = transform_points(corners, pose[..., :3], pose[..., 3])
    uv = project_points(cam, k)
    center_uv = project_points(
        transform_points(jnp.zeros((1, 3)), pose[..., :3], pose[..., 3]), k
    )[..., 0, :]
    umin = jnp.min(uv[..., 0], axis=-1)
    umax = jnp.max(uv[..., 0], axis=-1)
    vmin = jnp.min(uv[..., 1], axis=-1)
    vmax = jnp.max(uv[..., 1], axis=-1)
    # Half-extents about the *projected center* (reference semantics:
    # max distance from center so the object stays inside).
    hw = jnp.maximum(umax - center_uv[..., 0], center_uv[..., 0] - umin)
    hh = jnp.maximum(vmax - center_uv[..., 1], center_uv[..., 1] - vmin)
    hw = jnp.maximum(hw * margin, min_size_px * 0.5)
    hh = jnp.maximum(hh * margin, min_size_px * 0.5)
    # Enforce output aspect ratio (keep the larger relative extent).
    aspect = ow / oh
    hw = jnp.maximum(hw, hh * aspect)
    hh = hw / aspect
    x0 = center_uv[..., 0] - hw
    y0 = center_uv[..., 1] - hh
    sx = ow / (2.0 * hw)
    sy = oh / (2.0 * hh)
    return ZoomBox(x0=x0, y0=y0, sx=sx, sy=sy)


def zoom_intrinsics(k: jax.Array, box: ZoomBox) -> jax.Array:
    """K' that renders directly into the crop (skips rendered-image zoom)."""
    return crop_intrinsics(k, box.x0, box.y0, box.sx, box.sy)


def zoom_image(img: jax.Array, box: ZoomBox, out_size: tuple[int, int],
               method: str = "bilinear", fill_value: float = 0.0,
               precision=None) -> jax.Array:
    """Crop+resize one (H, W, C) image into (H_out, W_out, C).

    Separable-matmul resample (MXU path); see
    :func:`deepim_tpu.ops.resample.resample_affine`.  ``fill_value`` other
    than 0 is not supported on this path (the zoom always fills with 0,
    like the reference's border handling).  ``precision=None`` -> HIGHEST;
    pass ``jax.lax.Precision.DEFAULT`` for 8-bit-origin RGB (3x faster).
    """
    if method not in ("bilinear", "nearest"):
        raise ValueError(method)
    if fill_value != 0.0:
        raise NotImplementedError("zoom fill_value must be 0")
    precision = jax.lax.Precision.HIGHEST if precision is None else precision
    return resample_affine(img, out_size, box.x0, box.y0, box.sx, box.sy,
                           method=method, precision=precision)


def zoom_image_batch(imgs: jax.Array, box: ZoomBox,
                     out_size: tuple[int, int], method: str = "bilinear",
                     precision=None) -> jax.Array:
    """vmap of :func:`zoom_image` over a leading batch axis.

    ``imgs`` (B, H, W, C) with a per-sample ``box`` of (B,)-shaped fields
    -> (B, H_out, W_out, C).  The single shared unpack/repack of the
    per-sample ZoomBox fields (every zoom call site needs it).
    """
    return jax.vmap(
        lambda im, x0, y0, sx, sy: zoom_image(
            im, ZoomBox(x0, y0, sx, sy), out_size, method=method,
            precision=precision,
        )
    )(imgs, box.x0, box.y0, box.sx, box.sy)


def zoom_flow(flow: jax.Array, box: ZoomBox, out_size: tuple[int, int]) -> jax.Array:
    """Crop+resize a flow field (H, W, 2) and rescale the vectors.

    Reference ``zoom_flow``: flow is in source-image pixels; after zooming,
    one crop pixel = (1/sx, 1/sy) source pixels, so vectors scale by
    (sx, sy).
    """
    out = zoom_image(flow, box, out_size, method="bilinear")
    scale = jnp.stack([box.sx, box.sy]).reshape(
        (1,) * (out.ndim - 1) + (2,)
    )
    return out * scale


def unzoom_points(uv_crop: jax.Array, box: ZoomBox) -> jax.Array:
    """Map crop-pixel coords (..., 2) back to source-image coords."""
    x = uv_crop[..., 0] / box.sx + box.x0
    y = uv_crop[..., 1] / box.sy + box.y0
    return jnp.stack([x, y], axis=-1)
