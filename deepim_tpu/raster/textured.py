"""Per-pixel texture sampling on top of the Pallas rasterizer.

The reference renders YCB-style textured meshes with a GLSL fragment
shader sampling the texture per pixel (``lib/render_glumpy/render_py.py``
texture path).  The v1 TPU path bakes textures to vertex colors at load
(:func:`deepim_tpu.raster.mesh.bake_texture_to_vertices`) — good enough
for dense scanned meshes, lossy for coarse ones.

This module adds true per-pixel sampling as a **deferred pass** that
reuses the raster kernels unchanged: the three color interpolation planes
carry ``(u, v, intensity)`` instead of RGB (perspective-correct, like any
color), and the texture lookup happens afterwards as an XLA bilinear
gather over the rendered UV image.  Gathers are the slow op on TPU, so
this path is for offline data generation / visual-fidelity rendering; the
refine loop keeps baked vertex colors (geometry, not texel detail, drives
pose refinement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepim_tpu.raster.raster_pallas import (
    _render_dispatch, pack_corner_major,
)
from deepim_tpu.raster.raster_xla import FLAT_LIGHTING, Lighting


def tri_uv_corner_major(mesh) -> "np.ndarray":  # noqa: F821 (doc type)
    """Corner-major UV layout for a textured Mesh: (6, F), row 2*corner+coord.

    Analogous to ``RenderAssets.tri_*`` (see refiner.py: corner-major SoA
    so packing is gather-free vector math).
    """
    if mesh.uv is None:
        raise ValueError("mesh has no UVs (not a textured PLY)")
    return mesh.uv[mesh.faces].reshape(-1, 6).T.copy()


def pack_tri_params_uv(tri_pos, tri_uv, tri_nrm, pose, k,
                       lighting: Lighting, z_near: float, cull_dir=None):
    """Like ``pack_tri_params`` but color planes carry (u, v, intensity).

    ``tri_pos/tri_nrm`` are (9, F) corner-major; ``tri_uv`` is (6, F).
    Channel 2 interpolates the Gouraud intensity so lighting composes with
    the deferred texture lookup exactly like the baked path
    (color = albedo * intensity).  The projection/lighting math is the
    SHARED :func:`pack_corner_major` — both packs stay bit-identical and
    z-merge-compatible by construction.
    """
    return pack_corner_major(
        tri_pos, tri_nrm, pose, k, lighting, z_near,
        lambda c, intensity: (tri_uv[2 * c], tri_uv[2 * c + 1], intensity),
        cull_dir,
    )


def sample_texture_bilinear(texture: jax.Array, u: jax.Array,
                            v: jax.Array) -> jax.Array:
    """Bilinear texture taps at (u, v) in [0, 1] -> (..., 3).

    Same convention as ``bake_texture_to_vertices``: x = u*(W-1),
    y = (1-v)*(H-1) (image row 0 = v = 1).
    """
    h, w = texture.shape[0], texture.shape[1]
    x = jnp.clip(u, 0.0, 1.0) * (w - 1)
    y = (1.0 - jnp.clip(v, 0.0, 1.0)) * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    flat = texture.reshape(h * w, -1)

    def tap(yy, xx):
        return jnp.take(flat, yy * w + xx, axis=0)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x1) * fx
    bot = tap(y1, x0) * (1 - fx) + tap(y1, x1) * fx
    return top * (1 - fy) + bot * fy


def _map_batch_chunks(fn, chunk: int, *args):
    """Apply ``fn`` over the shared leading (batch) axis in serial chunks.

    ``lax.map`` over chunk groups caps the deferred texture pass's live
    memory at one chunk's intermediates: XLA fuses the 4 bilinear taps +
    lerps into one kernel whose materialized (B, H, W, 3)-scale temps
    reached ~20 GB at B=128 480x640 with 21 classes — past a v5e chip's
    HBM (round-4 README's textured batch ceiling).  Chunking trades a
    little dispatch serialization for an 8x smaller footprint.
    Indivisible batches are zero-PADDED to the next chunk multiple and
    sliced back (u=v=0 taps on pad rows are harmless) — falling back to
    the unchunked call there would silently reintroduce the OOM for,
    say, a prime-sized leftover eval batch.  chunk <= 0 disables.
    """
    b = args[0].shape[0]
    if chunk <= 0 or b <= chunk:
        return fn(*args)
    pad = (-b) % chunk
    padded = [
        jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
        for a in args
    ]
    split = [a.reshape(((b + pad) // chunk, chunk) + a.shape[1:])
             for a in padded]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(split))
    return out.reshape((b + pad,) + out.shape[2:])[:b]


def sample_texture_atlas(textures: jax.Array, tex_idx: jax.Array,
                         u: jax.Array, v: jax.Array) -> jax.Array:
    """Per-sample bilinear taps into a class atlas (C, Th, Tw, 3).

    ``tex_idx`` (B,) selects each sample's texture by flat-index offset —
    no (B, Th, Tw, 3) gathered copy is materialized (RenderAssets keeps
    the atlas with its class axis; see refiner.gather_class).
    ``u``/``v`` are (B, ...) in [0, 1].
    """
    c, h, w = textures.shape[0], textures.shape[1], textures.shape[2]
    x = jnp.clip(u, 0.0, 1.0) * (w - 1)
    y = (1.0 - jnp.clip(v, 0.0, 1.0)) * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    flat = textures.reshape(c * h * w, -1)
    base = tex_idx.astype(jnp.int32).reshape(
        (-1,) + (1,) * (u.ndim - 1)
    ) * (h * w)

    def tap(yy, xx):
        return jnp.take(flat, base + yy * w + xx, axis=0)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x1) * fx
    bot = tap(y1, x0) * (1 - fx) + tap(y1, x1) * fx
    return top * (1 - fy) + bot * fy


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "z_near", "interpret", "binning",
                     "max_faces_per_tile", "spans", "deferred_chunk"),
)
def render_batch_textured(
    tri_pos: jax.Array,  # (B, 9, F) corner-major object-frame positions
    tri_uv: jax.Array,  # (B, 6, F) corner-major UVs
    tri_nrm: jax.Array,  # (B, 9, F)
    poses: jax.Array,  # (B, 3, 4)
    ks: jax.Array,  # (B, 3, 3)
    image_size: tuple[int, int],
    texture: jax.Array,  # (Th, Tw, 3) shared, (B, Th, Tw, 3) per-sample,
    #                      or (C, Th, Tw, 3) atlas with tex_idx (B,)
    lighting: Lighting = FLAT_LIGHTING,
    z_near: float = 0.01,
    interpret: bool = False,
    binning: str = "auto",
    tex_idx: jax.Array | None = None,  # (B,) class index into the atlas
    max_faces_per_tile: int = 512,
    spans: tuple[int, int] = (4, 2),
    cull_dir: jax.Array | None = None,  # (B,) ±1 cull sign, 0 = two-sided
    deferred_chunk: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Textured render -> (rgb (B, H, W, 3), depth (B, H, W)).

    Raster pass interpolates (u, v, intensity); deferred pass samples the
    texture bilinearly and applies intensity.  Background stays 0.
    ``max_faces_per_tile``/``spans``/``cull_dir`` tune the shared raster
    dispatch the same way as the untextured ``render_batch_tri``.
    ``deferred_chunk`` bounds the texture pass's live HBM by running it
    over batch chunks (see :func:`_map_batch_chunks`; 0 = unchunked).
    """
    if cull_dir is None:
        pack = jax.vmap(
            lambda tp, tu, tn, p, kk: pack_tri_params_uv(
                tp, tu, tn, p, kk, lighting, z_near
            )
        )
        params, bbox, face_ok = pack(tri_pos, tri_uv, tri_nrm, poses, ks)
    else:
        pack = jax.vmap(
            lambda tp, tu, tn, p, kk, cd: pack_tri_params_uv(
                tp, tu, tn, p, kk, lighting, z_near, cd
            )
        )
        params, bbox, face_ok = pack(tri_pos, tri_uv, tri_nrm, poses, ks,
                                     cull_dir)
    uvi, depth = _render_dispatch(params, bbox, face_ok, image_size,
                                  (32, 256), max_faces_per_tile, interpret,
                                  binning, spans)
    u, v, intensity = uvi[..., 0], uvi[..., 1], uvi[..., 2]
    if texture.ndim == 4 and tex_idx is not None:
        albedo = _map_batch_chunks(
            lambda uu, vv, ti: sample_texture_atlas(texture, ti, uu, vv),
            deferred_chunk, u, v, tex_idx)
    elif texture.ndim == 4:
        albedo = _map_batch_chunks(
            lambda tt, uu, vv: jax.vmap(sample_texture_bilinear)(tt, uu, vv),
            deferred_chunk, texture, u, v)
    else:
        albedo = _map_batch_chunks(
            lambda uu, vv: sample_texture_bilinear(texture, uu, vv),
            deferred_chunk, u, v)
    rgb = jnp.clip(albedo * intensity[..., None], 0.0, 1.0)
    rgb = jnp.where((depth > 0)[..., None], rgb, 0.0)
    return rgb, depth
