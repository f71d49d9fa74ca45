"""Tiled Pallas TPU rasterizer — the production render path.

TPU-native replacement for the reference's OpenGL rasterization
(``lib/render_glumpy/render_py.py §Render_Py.render``: GPU fixed-function
depth-tested triangle raster).  Design (SURVEY.md §7 hard-part 1):

1. **XLA precompute**: vertex transform/projection + Gouraud shading (tiny
   matmuls), then per-face packed params ``(F, 24)``:
   ``[x0 y0 x1 y1 x2 y2 | z0 z1 z2 | rgb0 rgb1 rgb2 | pad]``.
2. **XLA binning**: faces' screen bboxes are tested against the image tile
   grid (a dense ``(F, TY, TX)`` incidence — cheap because F ≲ 4k and the
   tile grid is tiny), producing per-tile face-index lists via ``top_k``
   (capped at ``max_faces_per_tile``; excess faces in one tile are dropped,
   pick the cap ≥ F to make binning lossless).
3. **Pallas kernel**: grid ``(B, TY, TX)``; all of a batch element's face
   params sit in VMEM (≈ F·96 bytes); the kernel walks its tile's face
   list, evaluates the three edge functions over the (TH, TW) pixel tile on
   the VPU, and maintains z-buffer + RGB accumulators in VMEM scratch.
   Per-face work is one-vreg-wide when (TH, TW) = (8, 128).

Depth output is metric camera z (f32), 0 = background — identical semantics
to :func:`deepim_tpu.raster.raster_xla.render_mesh`, which is this kernel's
golden oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepim_tpu.raster.raster_xla import (
    FLAT_LIGHTING,
    Lighting,
    project_vertices,
    shade_vertices,
)

_BIG = 1e9  # plain Python float: jnp scalars would be captured consts in Pallas


def pack_face_params(vertices, faces, colors, normals, pose, k,
                     lighting: Lighting, z_near: float):
    """XLA precompute: project + shade, gather to (F, 24) packed params.

    Returns (params (F, 24) f32, face_ok (F,) bool).
    """
    screen, z = project_vertices(vertices, pose, k)
    shaded = shade_vertices(colors, normals, pose, lighting)
    txy = screen[faces]  # (F, 3, 2)
    tz = z[faces]  # (F, 3)
    tc = shaded[faces]  # (F, 3, 3)
    face_ok = jnp.all(tz > z_near, axis=-1)
    # Degenerate (padding) faces have zero area; cheap extra reject here.
    area = (txy[:, 1, 0] - txy[:, 0, 0]) * (txy[:, 2, 1] - txy[:, 0, 1]) - (
        txy[:, 1, 1] - txy[:, 0, 1]
    ) * (txy[:, 2, 0] - txy[:, 0, 0])
    face_ok &= jnp.abs(area) > 1e-12
    params = jnp.concatenate(
        [
            txy.reshape(-1, 6),
            tz,
            tc.reshape(-1, 9),
            jnp.zeros((faces.shape[0], 6), jnp.float32),
        ],
        axis=-1,
    )
    return params, face_ok


def bin_faces(params, face_ok, image_size, tile, max_faces_per_tile):
    """Per-tile face lists: (TY, TX, K) int32 indices + (TY, TX) counts."""
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)
    f = params.shape[0]

    xs = params[:, 0:6:2]
    ys = params[:, 1:6:2]
    umin, umax = xs.min(-1), xs.max(-1)
    vmin, vmax = ys.min(-1), ys.max(-1)

    tile_x0 = jnp.arange(tx, dtype=jnp.float32) * tw  # (TX,)
    tile_y0 = jnp.arange(ty, dtype=jnp.float32) * th  # (TY,)
    hit_x = (umin[:, None] <= tile_x0[None, :] + tw) & (
        umax[:, None] >= tile_x0[None, :]
    )  # (F, TX)
    hit_y = (vmin[:, None] <= tile_y0[None, :] + th) & (
        vmax[:, None] >= tile_y0[None, :]
    )  # (F, TY)
    incident = (
        hit_y[:, :, None] & hit_x[:, None, :] & face_ok[:, None, None]
    )  # (F, TY, TX)

    counts = jnp.sum(incident.astype(jnp.int32), axis=0)  # (TY, TX)
    counts = jnp.minimum(counts, max_faces_per_tile)
    # top_k picks incident faces in ascending face order (front-to-back
    # submission order is irrelevant — we z-test — but determinism is nice).
    score = jnp.where(jnp.transpose(incident, (1, 2, 0)),
                      f - jnp.arange(f, dtype=jnp.int32), -1)
    _, idx = jax.lax.top_k(score, max_faces_per_tile)  # (TY, TX, K)
    return idx.astype(jnp.int32), counts


def _raster_kernel(list_hbm, params_ref, rgb_ref, depth_ref,
                   zbuf, rbuf, gbuf, bbuf, list_smem, dma_sem, *, tile, n_tx):
    th, tw = tile
    bi = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    t_lin = ty * n_tx + tx  # linear tile id into the bin-list rows
    n_tiles_total = pl.num_programs(1) * pl.num_programs(2)
    # The face-index list row lives in HBM; DMA it into SMEM, where scalar
    # reads at dynamic indices are unconstrained (VMEM scalar reads require
    # 128-aligned lane indices, which the inner loop can't prove).  Each
    # row is shaped (R, 128) so the slice respects HBM (8, 128) tiling.
    row_dma = pltpu.make_async_copy(
        list_hbm.at[bi * n_tiles_total + t_lin], list_smem, dma_sem
    )
    row_dma.start()
    oy = (ty * th).astype(jnp.float32)
    ox = (tx * tw).astype(jnp.float32)
    # Mosaic iota must be integer-typed; cast to f32 after.
    py = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + (
        oy + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + (
        ox + 0.5
    )

    zbuf[:] = jnp.full((th, tw), _BIG)
    rbuf[:] = jnp.zeros((th, tw), jnp.float32)
    gbuf[:] = jnp.zeros((th, tw), jnp.float32)
    bbuf[:] = jnp.zeros((th, tw), jnp.float32)

    row_dma.wait()
    # Row layout (flattened (R, 128)): [count, face_idx_0, face_idx_1, ...]
    count = list_smem[0, 0]

    def body(j, _):
        fi = list_smem[(1 + j) // 128, (1 + j) % 128]
        x0 = params_ref[0, fi, 0]
        y0 = params_ref[0, fi, 1]
        x1 = params_ref[0, fi, 2]
        y1 = params_ref[0, fi, 3]
        x2 = params_ref[0, fi, 4]
        y2 = params_ref[0, fi, 5]
        z0 = params_ref[0, fi, 6]
        z1 = params_ref[0, fi, 7]
        z2 = params_ref[0, fi, 8]

        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        # Normalize winding by sign(area): avoids a bool-vector select
        # (which Mosaic cannot legalize) and handles both orientations.
        sgn = jnp.where(area > 0, 1.0, -1.0)
        w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * sgn
        w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * sgn
        w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * sgn
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        inv_area = 1.0 / (area * sgn)  # |area|; != 0 per pack_face_params
        b0 = w0 * inv_area
        b1 = w1 * inv_area
        b2 = w2 * inv_area
        # Perspective-correct interpolation via 1/z weights.
        q0 = b0 / z0
        q1 = b1 / z1
        q2 = b2 / z2
        inv_z = q0 + q1 + q2
        zc = 1.0 / jnp.maximum(inv_z, 1e-9)
        upd = inside & (inv_z > 1e-9) & (zc < zbuf[:])

        inv_sum = 1.0 / jnp.maximum(inv_z, 1e-9)
        g0 = q0 * inv_sum
        g1 = q1 * inv_sum
        g2 = q2 * inv_sum
        r = (g0 * params_ref[0, fi, 9] + g1 * params_ref[0, fi, 12]
             + g2 * params_ref[0, fi, 15])
        g = (g0 * params_ref[0, fi, 10] + g1 * params_ref[0, fi, 13]
             + g2 * params_ref[0, fi, 16])
        b = (g0 * params_ref[0, fi, 11] + g1 * params_ref[0, fi, 14]
             + g2 * params_ref[0, fi, 17])

        zbuf[:] = jnp.where(upd, zc, zbuf[:])
        rbuf[:] = jnp.where(upd, r, rbuf[:])
        gbuf[:] = jnp.where(upd, g, gbuf[:])
        bbuf[:] = jnp.where(upd, b, bbuf[:])
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    hit = zbuf[:] < _BIG
    depth_ref[0] = jnp.where(hit, zbuf[:], 0.0)
    rgb_ref[0, 0] = rbuf[:]
    rgb_ref[0, 1] = gbuf[:]
    rgb_ref[0, 2] = bbuf[:]


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_faces_per_tile", "z_near",
                     "interpret"),
)
def render_batch(
    vertices: jax.Array,  # (V, 3) shared or (B, V, 3) per-sample
    faces: jax.Array,  # (F, 3) int32 shared, or (B, F, 3) per-sample
    colors: jax.Array,  # (V, 3) or (B, V, 3)
    normals: jax.Array,  # (V, 3) or (B, V, 3)
    poses: jax.Array,  # (B, 3, 4)
    ks: jax.Array,  # (B, 3, 3) (per-sample: zoom-K rendering)
    image_size: tuple[int, int],
    lighting: Lighting = FLAT_LIGHTING,
    z_near: float = 0.01,
    tile: tuple[int, int] = (8, 128),
    max_faces_per_tile: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Rasterize a batch of hypotheses → (rgb (B, H, W, 3), depth (B, H, W)).

    The batch dimension is the hypothesis/object axis (SURVEY.md §2.7: the
    TPU scaling axis replacing the reference's per-GPU context split).
    """
    b = poses.shape[0]
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)
    f = faces.shape[-2]
    max_k = min(max_faces_per_tile, f)

    batched_mesh = vertices.ndim == 3
    if batched_mesh and faces.ndim == 3:
        # Per-sample meshes AND face lists (multi-class batches).
        pack = jax.vmap(
            lambda v, ff, c, n, p, kk: pack_face_params(
                v, ff, c, n, p, kk, lighting, z_near
            )
        )
        params, face_ok = pack(vertices, faces, colors, normals, poses, ks)
    elif batched_mesh:
        pack = jax.vmap(
            lambda v, c, n, p, kk: pack_face_params(
                v, faces, c, n, p, kk, lighting, z_near
            )
        )
        params, face_ok = pack(vertices, colors, normals, poses, ks)
    else:
        pack = jax.vmap(
            lambda p, kk: pack_face_params(
                vertices, faces, colors, normals, p, kk, lighting, z_near
            )
        )
        params, face_ok = pack(poses, ks)

    lists, counts = jax.vmap(
        lambda pp, ok: bin_faces(pp, ok, image_size, tile, max_k)
    )(params, face_ok)  # (B, TY, TX, K), (B, TY, TX)
    # Fuse count + indices into one HBM-resident int32 table with one
    # (R, 128)-tiled row per (batch, tile): [count_t, idx_0, ..., idx_{K-1},
    # pad].  The kernel DMAs its row into SMEM (aligned full-tile slices).
    n_tiles = ty * tx
    row_len = max_k + 1
    r_sub = pl.cdiv(pl.cdiv(row_len, 128), 8) * 8
    row_pad = r_sub * 128 - row_len
    table = jnp.concatenate(
        [
            counts.reshape(b, n_tiles, 1),
            lists.reshape(b, n_tiles, max_k),
            jnp.zeros((b, n_tiles, row_pad), jnp.int32),
        ],
        axis=-1,
    ).reshape(b * n_tiles, r_sub, 128)

    kernel = functools.partial(_raster_kernel, tile=tile, n_tx=tx)
    rgb, depth = pl.pallas_call(
        kernel,
        grid=(b, ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # table stays in HBM
            pl.BlockSpec((1, f, 24), lambda bi, yi, xi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw), lambda bi, yi, xi: (bi, 0, yi, xi)),
            pl.BlockSpec((1, th, tw), lambda bi, yi, xi: (bi, yi, xi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.SMEM((r_sub, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(table, params)

    return jnp.transpose(rgb, (0, 2, 3, 1)), depth
