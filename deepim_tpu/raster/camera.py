"""Pinhole camera intrinsics helpers (OpenCV convention, pixel-center 0.5).

The reference builds OpenGL projection matrices from K + near/far
(``lib/render_glumpy/render_py.py``); on TPU we rasterize directly in
OpenCV pixel coordinates, so only K bookkeeping is needed.  Crop/zoom K
adjustment mirrors the reference's zoom CustomOps (``deepim/operator_py/
zoom_image.py``-style K rescaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_intrinsics(fx, fy, cx, cy) -> jax.Array:
    """Build a 3x3 K from scalars."""
    z = jnp.zeros(())
    o = jnp.ones(())
    return jnp.stack(
        [
            jnp.stack([jnp.asarray(fx, jnp.float32), z, jnp.asarray(cx, jnp.float32)]),
            jnp.stack([z, jnp.asarray(fy, jnp.float32), jnp.asarray(cy, jnp.float32)]),
            jnp.stack([z, z, o]),
        ]
    )


def crop_intrinsics(k: jax.Array, x0, y0, scale_x, scale_y) -> jax.Array:
    """K for rendering directly into a crop: pixel (u,v) in the crop
    corresponds to ((u/scale_x)+x0, (v/scale_y)+y0) in the original image.

    Composing this with the rasterizer renders the object *pre-zoomed*,
    eliminating the reference's separate zoom of the rendered image.
    """
    x0 = jnp.asarray(x0, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)
    sx = jnp.asarray(scale_x, jnp.float32)
    sy = jnp.asarray(scale_y, jnp.float32)
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    row0 = jnp.stack([fx * sx, jnp.zeros_like(fx), (cx - x0) * sx], axis=-1)
    row1 = jnp.stack([jnp.zeros_like(fy), fy * sy, (cy - y0) * sy], axis=-1)
    row2 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), row0.shape)
    return jnp.stack([row0, row1, row2], axis=-2)
