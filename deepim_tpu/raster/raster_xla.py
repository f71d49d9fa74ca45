"""Brute-force XLA rasterizer — the golden oracle for the Pallas kernel.

Replaces the OpenGL pipeline of the reference
(``lib/render_glumpy/render_py.py §Render_Py.render``: GLSL vertex shader →
fixed-function depth-tested raster → fragment shader → FBO readback) with a
fully on-device, jit/vmap-safe rasterizer:

- vertex transform + projection (tiny matmuls),
- per-pixel point-in-triangle edge functions over face chunks via
  ``lax.scan`` (bounded memory),
- a z-buffer min-reduction, then a *single* deferred shading pass that
  recomputes barycentrics only for each pixel's winning face.

Output depth is metric camera-space z (float32) — deliberately *not* an
OpenGL z-buffer quantization (SURVEY.md §7 hard-part 1: match the depth-
to-metric conversion, not the quantization).

Geometry notes:
- OpenCV camera convention (+z forward, +y down in image); pixel centers
  at integer+0.5.
- No polygon clipping: faces with any vertex behind ``z_near`` are
  rejected whole (objects in this application are always fully in front
  of the camera).
- Both triangle windings are rasterized (no backface culling), matching
  OpenGL defaults used by the reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_BIG = jnp.float32(1e9)


class Lighting(NamedTuple):
    """Gouraud lighting params (reference: render_py_light* variants).

    color = albedo * (ambient + diffuse * max(0, n·l)), per vertex.
    ``direction`` points from surface toward the light, in camera frame.
    """

    ambient: jax.Array  # scalar
    diffuse: jax.Array  # scalar
    direction: jax.Array  # (3,)


FLAT_LIGHTING = Lighting(
    ambient=jnp.float32(1.0), diffuse=jnp.float32(0.0),
    direction=jnp.array([0.0, 0.0, -1.0]),
)


def shade_vertices(colors, normals, pose, lighting: Lighting):
    """Per-vertex Gouraud shading in camera frame. (V,3)x(V,3) -> (V,3)."""
    r = pose[..., :3]
    n_cam = jnp.einsum("...ij,...vj->...vi", r, normals, precision=_HI)
    l = lighting.direction / jnp.maximum(jnp.linalg.norm(lighting.direction), 1e-8)
    ndotl = jnp.maximum(jnp.einsum("...vi,i->...v", n_cam, l), 0.0)
    # Two-sided: rasterizing both windings means normals may face away.
    ndotl = jnp.maximum(ndotl, jnp.maximum(-jnp.einsum("...vi,i->...v", n_cam, l), 0.0))
    intensity = lighting.ambient + lighting.diffuse * ndotl
    return jnp.clip(colors * intensity[..., None], 0.0, 1.0)


def project_vertices(vertices, pose, k):
    """Object-frame verts (V,3) -> screen xy (V,2) + camera z (V,)."""
    r, t = pose[..., :3], pose[..., 3]
    v_cam = jnp.einsum("...ij,...vj->...vi", r, vertices, precision=_HI) + t[..., None, :]
    z = v_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = k[..., 0, 0] * v_cam[..., 0] / z_safe + k[..., 0, 2]
    v = k[..., 1, 1] * v_cam[..., 1] / z_safe + k[..., 1, 2]
    return jnp.stack([u, v], axis=-1), z


def _face_gather(arr, faces):
    """(V, ...) indexed by faces (F, 3) -> (F, 3, ...)."""
    return arr[faces]


@partial(jax.jit, static_argnames=("image_size", "chunk"))
def render_mesh(
    vertices: jax.Array,  # (V, 3) object frame
    faces: jax.Array,  # (F, 3) int32
    colors: jax.Array,  # (V, 3)
    normals: jax.Array,  # (V, 3)
    pose: jax.Array,  # (3, 4)
    k: jax.Array,  # (3, 3)
    image_size: tuple[int, int],  # (H, W) static
    lighting: Lighting = FLAT_LIGHTING,
    z_near: float = 0.01,
    chunk: int = 64,
    cull_dir=None,  # scalar ±1 back-face cull sign, None/0 = two-sided
) -> tuple[jax.Array, jax.Array]:
    """Render one mesh at one pose -> (rgb (H, W, 3), depth (H, W)).

    depth == 0 marks background.  ``vmap`` over (pose,) — or over
    (vertices, faces, colors, normals, pose) for per-sample objects —
    batches hypotheses.  ``cull_dir`` matches the Pallas path's back-face
    culling (``mesh.cull_direction`` sign; exact for closed meshes) so
    the oracle can be compared cull-for-cull.

    Caveat: culling exactness assumes no *front* face is whole-face
    rejected by the near-plane test above (``all tri_z > z_near``).  A
    pose whose mesh crosses z_near (e.g. a diverged hypothesis) can have
    a front face dropped by the near test while its occluded back face
    survives two-sided rendering, so culled vs two-sided output differs
    slightly there.  In practice such poses already render mostly empty
    and score -inf in hypothesis selection (fg_count==0), so this is
    accepted rather than special-cased.
    """
    h, w = image_size
    screen, z = project_vertices(vertices, pose, k)
    shaded = shade_vertices(colors, normals, pose, lighting)

    f = faces.shape[0]
    pad = (-f) % chunk
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), jnp.int32)]) if pad else faces
    valid_face = jnp.concatenate(
        [jnp.ones((f,), bool), jnp.zeros((pad,), bool)]
    ) if pad else jnp.ones((f,), bool)

    tri_xy = _face_gather(screen, faces_p)  # (F', 3, 2)
    tri_z = _face_gather(z, faces_p)  # (F', 3)
    # Near-plane reject (whole face) + padding reject.
    face_ok = valid_face & jnp.all(tri_z > z_near, axis=-1)
    if cull_dir is not None:
        # Same predicate as raster_pallas._plane_pack: screen-space signed
        # area (cyclic-permutation invariant) against the cull sign.
        d = ((tri_xy[:, 1, 1] - tri_xy[:, 2, 1])
             * (tri_xy[:, 0, 0] - tri_xy[:, 2, 0])
             + (tri_xy[:, 2, 0] - tri_xy[:, 1, 0])
             * (tri_xy[:, 0, 1] - tri_xy[:, 2, 1]))
        face_ok = face_ok & ((cull_dir == 0.0) | (d * cull_dir < 0.0))

    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5  # u
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5  # v

    n_chunks = tri_xy.shape[0] // chunk
    tri_xy_c = tri_xy.reshape(n_chunks, chunk, 3, 2)
    tri_z_c = tri_z.reshape(n_chunks, chunk, 3)
    ok_c = face_ok.reshape(n_chunks, chunk)

    def edge(ax, ay, bx, by, cx_, cy_):
        # 2D cross of (b - a) x (c - a); (chunk,1,1) vs (h,w) broadcasts.
        return (bx - ax) * (cy_ - ay) - (by - ay) * (cx_ - ax)

    def body(carry, inp):
        zbuf, ibuf = carry
        txy, tz, ok, base = inp
        x0, y0 = txy[:, 0, 0][:, None, None], txy[:, 0, 1][:, None, None]
        x1, y1 = txy[:, 1, 0][:, None, None], txy[:, 1, 1][:, None, None]
        x2, y2 = txy[:, 2, 0][:, None, None], txy[:, 2, 1][:, None, None]
        w0 = edge(x1, y1, x2, y2, px, py)
        w1 = edge(x2, y2, x0, y0, px, py)
        w2 = edge(x0, y0, x1, y1, px, py)
        area = edge(x0, y0, x1, y1, x2, y2)  # (chunk,1,1)
        inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | (
            (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
        )
        inside &= jnp.abs(area) > 1e-12
        inside &= ok[:, None, None]
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        b0, b1, b2 = w0 * inv_area, w1 * inv_area, w2 * inv_area
        # Perspective-correct depth: 1/z interpolates linearly in screen.
        inv_z = (
            b0 / tz[:, 0][:, None, None]
            + b1 / tz[:, 1][:, None, None]
            + b2 / tz[:, 2][:, None, None]
        )
        zc = jnp.where(inside & (inv_z > 1e-9), 1.0 / jnp.maximum(inv_z, 1e-9), _BIG)
        # Min over this chunk's faces.
        best = jnp.argmin(zc, axis=0)  # (h, w)
        zmin = jnp.take_along_axis(zc, best[None], axis=0)[0]
        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        ibuf = jnp.where(upd, base + best.astype(jnp.int32), ibuf)
        return (zbuf, ibuf), None

    zbuf0 = jnp.full((h, w), _BIG)
    ibuf0 = jnp.full((h, w), -1, jnp.int32)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (zbuf, ibuf), _ = jax.lax.scan(
        body, (zbuf0, ibuf0), (tri_xy_c, tri_z_c, ok_c, bases)
    )

    # Deferred shading: recompute barycentrics for each pixel's winner only.
    hit = ibuf >= 0
    fi = jnp.maximum(ibuf, 0)
    txy = tri_xy[fi]  # (h, w, 3, 2)
    tz = tri_z[fi]  # (h, w, 3)
    tcol = shaded[faces_p[fi]]  # (h, w, 3, 3)
    w0 = edge(txy[..., 1, 0], txy[..., 1, 1], txy[..., 2, 0], txy[..., 2, 1], px, py)
    w1 = edge(txy[..., 2, 0], txy[..., 2, 1], txy[..., 0, 0], txy[..., 0, 1], px, py)
    w2 = edge(txy[..., 0, 0], txy[..., 0, 1], txy[..., 1, 0], txy[..., 1, 1], px, py)
    area = edge(
        txy[..., 0, 0], txy[..., 0, 1], txy[..., 1, 0], txy[..., 1, 1],
        txy[..., 2, 0], txy[..., 2, 1],
    )
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    b = jnp.stack([w0, w1, w2], -1) * inv_area[..., None]  # (h, w, 3)
    bz = b / jnp.maximum(tz, 1e-9)  # perspective-correct weights
    inv_z = jnp.sum(bz, -1)
    wgt = bz / jnp.maximum(inv_z[..., None], 1e-9)
    rgb = jnp.einsum("hwi,hwic->hwc", wgt, tcol)
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    depth = jnp.where(hit, zbuf, 0.0)
    return rgb, depth
