"""Tiled Pallas TPU rasterizer — the production render path.

TPU-native replacement for the reference's OpenGL rasterization
(``lib/render_glumpy/render_py.py §Render_Py.render``: GPU fixed-function
depth-tested triangle raster).  Design (SURVEY.md §7 hard-part 1):

1. **XLA precompute** (``pack_tri_params``): corner positions are stored
   corner-major (``RenderAssets.tri_*``) so packing is pure matmul — TPU
   gathers run element-at-a-time and must never appear on this path.  Each
   face is reduced to **plane equations**: three normalized edge functions
   λ_i(x, y) = A_i x + B_i y + C_i (barycentrics), an inverse-depth plane
   1/z = az x + bz y + cz, and three color numerator planes c·(1/z) —
   perspective-correct interpolation with ZERO divisions in the kernel.
2. **XLA binning** (``bin_faces``): face screen bboxes vs the tile grid, a
   dense (F, TY, TX) incidence reduced per tile to a capped face-index list
   via ``top_k``.
3. **Pallas kernel**: grid ``(B, TY, TX)``; per tile, walk the face list;
   per face: 4 plane evaluations (FMA) + compares; z-test in 1/z space
   (larger = closer, background = 0); accumulate inv_z + color numerators;
   one divide per tile at the end.

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

_HI = jax.lax.Precision.HIGHEST


def _plane_pack(xy, z, col, face_ok, cull_dir=None):
    """Per-corner component vectors -> (params (F, 24), bbox (F, 4), ok).

    ``xy`` = ((x0, y0), (x1, y1), (x2, y2)), ``z`` = (z0, z1, z2),
    ``col`` = ((r0, g0, b0), ...) — all (F,) vectors.  Structure-of-arrays
    throughout: every op is on an (F,)-shaped vector, which tiles densely
    onto (8, 128) vregs (an (F, 3, 3) layout wastes ~98% of each op).

    params layout: [A0 B0 C0 | A1 B1 C1 | A2 B2 C2 | az bz cz |
                    ar br cr | ag bg cg | ab bb cb | 0]
    λ_i = A_i x + B_i y + C_i are barycentrics (sum 1, ≥0 inside, either
    winding — the 1/D normalization absorbs orientation).

    ``cull_dir`` (scalar, optional): back-face culling.  Nonzero drops
    faces with ``d * cull_dir >= 0`` before binning — exact for closed
    consistently-wound meshes (``mesh.cull_direction``), and the single
    biggest raster win in the zoom-crop regime (~half the faces never
    reach the kernel's face loop).  0 or None renders two-sided (the
    reference GL path's behavior: no GL_CULL_FACE).
    """
    (x0, y0), (x1, y1), (x2, y2) = xy
    z0, z1, z2 = z
    d = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)  # 2*signed area
    face_ok = face_ok & (jnp.abs(d) > 1e-12)
    if cull_dir is not None:
        face_ok = face_ok & ((cull_dir == 0.0) | (d * cull_dir < 0.0))
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 0.0)

    a0 = (y1 - y2) * inv_d
    b0 = (x2 - x1) * inv_d
    c0 = -a0 * x2 - b0 * y2
    a1 = (y2 - y0) * inv_d
    b1 = (x0 - x2) * inv_d
    c1 = -a1 * x0 - b1 * y0
    a2 = (y0 - y1) * inv_d
    b2 = (x1 - x0) * inv_d
    c2 = -a2 * x1 - b2 * y1

    iz0 = 1.0 / jnp.maximum(z0, 1e-8)
    iz1 = 1.0 / jnp.maximum(z1, 1e-8)
    iz2 = 1.0 / jnp.maximum(z2, 1e-8)
    az = a0 * iz0 + a1 * iz1 + a2 * iz2
    bz = b0 * iz0 + b1 * iz1 + b2 * iz2
    cz = c0 * iz0 + c1 * iz1 + c2 * iz2

    # Color numerator planes: (c_i / z_i) interpolates linearly in screen.
    rows = [a0, b0, c0, a1, b1, c1, a2, b2, c2, az, bz, cz]
    for ch in range(3):
        v0 = col[0][ch] * iz0
        v1 = col[1][ch] * iz1
        v2 = col[2][ch] * iz2
        rows.append(a0 * v0 + a1 * v1 + a2 * v2)
        rows.append(b0 * v0 + b1 * v1 + b2 * v2)
        rows.append(c0 * v0 + c1 * v1 + c2 * v2)
    zero = jnp.zeros_like(x0)
    rows += [zero, zero, zero]

    okf = face_ok.astype(x0.dtype)
    # Stack coefficient-major (24, F) — dense lanes, no padding — pin it
    # as a real buffer, then transpose once.  Stacking straight to (F, 24)
    # (or .T without the barrier) makes XLA materialize every row as an
    # (F, 1)-shaped concat operand whose unit dim is lane-padded 1 -> 128:
    # 128x memory, OOMs at F~20k B=64.
    stacked = jax.lax.optimization_barrier(
        jnp.stack([r * okf for r in rows], axis=0)
    )
    params = stacked.T  # (F, 24)
    bbox = jax.lax.optimization_barrier(
        jnp.stack(
            [
                jnp.minimum(jnp.minimum(x0, x1), x2),
                jnp.maximum(jnp.maximum(x0, x1), x2),
                jnp.minimum(jnp.minimum(y0, y1), y2),
                jnp.maximum(jnp.maximum(y0, y1), y2),
            ],
            axis=0,
        )
    ).T  # (F, 4)
    return params, bbox, face_ok


def pack_face_params(vertices, faces, colors, normals, pose, k,
                     lighting: Lighting, z_near: float, cull_dir=None):
    """Vertex+faces pack (gather-based; kept for the shared-mesh API —
    prefer :func:`pack_tri_params` on TPU, gathers are slow there)."""
    screen, z = project_vertices(vertices, pose, k)
    shaded = shade_vertices(colors, normals, pose, lighting)
    txy = screen[faces]  # (F, 3, 2)
    tz = z[faces]  # (F, 3)
    tc = shaded[faces]  # (F, 3, 3)
    face_ok = jnp.all(tz > z_near, axis=-1)
    xy = tuple((txy[:, c, 0], txy[:, c, 1]) for c in range(3))
    zs = tuple(tz[:, c] for c in range(3))
    col = tuple(tuple(tc[:, c, ch] for ch in range(3)) for c in range(3))
    return _plane_pack(xy, zs, col, face_ok, cull_dir)


def pack_corner_major(tri_pos, tri_nrm, pose, k, lighting: Lighting,
                      z_near: float, channels_fn, cull_dir=None):
    """Shared corner-major projection + two-sided Gouraud lighting.

    Zero gathers, all-(F,) vector math; ``tri_pos/tri_nrm`` are (9, F) —
    row 3*corner+coord.  ``channels_fn(corner, intensity) -> (c0, c1, c2)``
    supplies the three interpolated channels per corner (shaded RGB for
    the baked path, (u, v, intensity) for the deferred-texture path), so
    both packs stay bit-identical in the pose/projection/lighting math
    and z-merge-compatible.
    """
    r, t = pose[..., :3], pose[..., 3]
    l = lighting.direction / jnp.maximum(
        jnp.linalg.norm(lighting.direction), 1e-8
    )
    xy, zs, col = [], [], []
    ok = None
    for c in range(3):
        px, py, pz = tri_pos[3 * c], tri_pos[3 * c + 1], tri_pos[3 * c + 2]
        cx = r[0, 0] * px + r[0, 1] * py + r[0, 2] * pz + t[0]
        cy = r[1, 0] * px + r[1, 1] * py + r[1, 2] * pz + t[1]
        cz = r[2, 0] * px + r[2, 1] * py + r[2, 2] * pz + t[2]
        z_safe = jnp.where(jnp.abs(cz) < 1e-8, 1e-8, cz)
        u = k[0, 0] * cx / z_safe + k[0, 2]
        v = k[1, 1] * cy / z_safe + k[1, 2]
        xy.append((u, v))
        zs.append(cz)
        ok = (cz > z_near) if ok is None else ok & (cz > z_near)

        nx, ny, nz = tri_nrm[3 * c], tri_nrm[3 * c + 1], tri_nrm[3 * c + 2]
        ncx = r[0, 0] * nx + r[0, 1] * ny + r[0, 2] * nz
        ncy = r[1, 0] * nx + r[1, 1] * ny + r[1, 2] * nz
        ncz = r[2, 0] * nx + r[2, 1] * ny + r[2, 2] * nz
        ndotl = ncx * l[0] + ncy * l[1] + ncz * l[2]
        # Two-sided shading == shade_vertices: max(n·l, -n·l, 0) = |n·l|.
        intensity = lighting.ambient + lighting.diffuse * jnp.abs(ndotl)
        col.append(channels_fn(c, intensity))
    return _plane_pack(tuple(xy), tuple(zs), tuple(col), ok, cull_dir)


def pack_tri_params(tri_pos, tri_col, tri_nrm, pose, k,
                    lighting: Lighting, z_near: float, cull_dir=None):
    """Corner-major SoA pack with baked per-corner shaded colors.

    ``tri_pos/tri_col/tri_nrm`` are (9, F) — row 3*corner+coord — built
    once per asset set (``RenderAssets.tri_*``).
    """
    return pack_corner_major(
        tri_pos, tri_nrm, pose, k, lighting, z_near,
        lambda c, intensity: tuple(
            jnp.clip(tri_col[3 * c + ch] * intensity, 0.0, 1.0)
            for ch in range(3)
        ),
        cull_dir,
    )


def bin_faces(bbox, face_ok, image_size, tile, max_faces_per_tile):
    """Per-tile face lists: (TY, TX, K) int32 indices + (TY, TX) counts."""
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)
    f = bbox.shape[0]

    umin, umax = bbox[:, 0], bbox[:, 1]
    vmin, vmax = bbox[:, 2], bbox[:, 3]

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


def bin_faces_sorted(bbox, face_ok, image_size, tile,
                     sy_span: int = 4, sx_span: int = 2,
                     global_cap: int = 128):
    """Lossless binning via ONE sort of (tile, face) pairs per sample.

    The top_k path (:func:`bin_faces`) runs a per-tile sort over all F
    faces (TY*TX sorts) and silently DROPS faces past
    ``max_faces_per_tile``.  Here every face either registers with the
    ≤ sy_span x sx_span tiles its bbox covers (one sort of F*S keys), or —
    if its bbox is larger — goes on a short global list every tile
    processes.  Per-tile face lists become contiguous ranges of the sorted
    array; no caps, no drops (beyond ``global_cap`` truly giant faces).

    Returns (vals (F*S,) int32 sorted face ids, starts (T+1,) int32 range
    table, glob (global_cap+1,) int32 [count, ids...]).
    """
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)
    t_total = ty * tx
    f = bbox.shape[0]
    s = sy_span * sx_span

    umin, umax = bbox[:, 0], bbox[:, 1]
    vmin, vmax = bbox[:, 2], bbox[:, 3]
    tx0 = jnp.clip(jnp.floor(umin / tw), 0, tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(umax / tw), 0, tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(vmin / th), 0, ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(vmax / th), 0, ty - 1).astype(jnp.int32)
    onscreen = face_ok & (umax >= 0) & (umin <= w) & (vmax >= 0) & (vmin <= h)
    small = onscreen & (tx1 - tx0 < sx_span) & (ty1 - ty0 < sy_span)

    dy = (jnp.arange(s, dtype=jnp.int32) // sx_span)[None, :]
    dx = (jnp.arange(s, dtype=jnp.int32) % sx_span)[None, :]
    tyc = ty0[:, None] + dy
    txc = tx0[:, None] + dx
    valid = small[:, None] & (tyc <= ty1[:, None]) & (txc <= tx1[:, None])
    tid = jnp.where(valid, tyc * tx + txc, t_total)  # sentinel = t_total
    keys = tid.reshape(-1)
    vals = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.int32)[:, None], (f, s)
    ).reshape(-1)
    keys_s, vals_s = jax.lax.sort_key_val(keys, vals)
    starts = jnp.searchsorted(
        keys_s, jnp.arange(t_total + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Global list: big-bbox faces, processed by every tile.
    gkey = jnp.where(onscreen & ~small, jnp.arange(f, dtype=jnp.int32), f)
    gsort = jnp.sort(gkey)[:global_cap]
    gcount = jnp.minimum(
        jnp.sum((onscreen & ~small).astype(jnp.int32)), global_cap
    )
    glob = jnp.concatenate([gcount[None], jnp.where(gsort < f, gsort, 0)])
    return vals_s, starts, glob


def bin_faces_packed(bbox, face_ok, image_size, tile,
                     sy_span: int, sx_span: int, global_cap: int):
    """Column-major packed-key binning for the column raster kernel.

    Improvements over :func:`bin_faces_sorted` (both feed lossless
    sort-binned kernels):

    - **Column-major tile ids** (``t = tx * TY + ty``): all sub-tiles of
      one 128-px image column occupy one contiguous range of the sorted
      array, so the kernel issues ONE large DMA per (sample, column)
      instead of one small DMA per tile.
    - **Single packed int32 key** ``(tile_id << shift) | slot`` replaces
      the key/value sort — one sorted operand instead of two, and the
      face id is recovered as ``(key & mask) // S`` (slot = face*S + k).

    Returns ``(face_ids (F*S,) int32 sorted by tile, starts (T+1,) int32,
    glob_col)`` where ``glob_col`` is the concatenated global-face column
    ``[gstarts (TX+1) | gid_sorted (G*TX) | 8 zero pad | uncapped global
    count (1)]`` — the kernel reads the first three segments, the
    launcher reads the trailing count to detect overflow (see below).
    """
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)
    t_total = ty * tx
    f = bbox.shape[0]
    s = sy_span * sx_span
    n = f * s
    shift = max(int(n - 1).bit_length(), 1)
    assert (t_total << shift) < 2**31, "packed key overflows int32"

    umin, umax = bbox[:, 0], bbox[:, 1]
    vmin, vmax = bbox[:, 2], bbox[:, 3]
    tx0 = jnp.clip(jnp.floor(umin / tw), 0, tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(umax / tw), 0, tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(vmin / th), 0, ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(vmax / th), 0, ty - 1).astype(jnp.int32)
    onscreen = face_ok & (umax >= 0) & (umin <= w) & (vmax >= 0) & (vmin <= h)
    small = onscreen & (tx1 - tx0 < sx_span) & (ty1 - ty0 < sy_span)

    dy = (jnp.arange(s, dtype=jnp.int32) // sx_span)[None, :]
    dx = (jnp.arange(s, dtype=jnp.int32) % sx_span)[None, :]
    tyc = ty0[:, None] + dy
    txc = tx0[:, None] + dx
    valid = small[:, None] & (tyc <= ty1[:, None]) & (txc <= tx1[:, None])
    tid = jnp.where(valid, txc * ty + tyc, t_total)  # COLUMN-major
    slot = jnp.arange(n, dtype=jnp.int32).reshape(f, s)
    packed = jnp.where(valid, (tid << shift) | slot,
                       (t_total << shift) | slot).reshape(-1)
    packed = jnp.sort(packed)
    bounds = (jnp.arange(t_total + 1, dtype=jnp.int32) << shift)
    starts = jnp.searchsorted(packed, bounds).astype(jnp.int32)
    face_ids = ((packed & ((1 << shift) - 1)) // s).astype(jnp.int32)

    # Global (big-bbox) faces, grouped PER COLUMN so the kernel only pays
    # for the columns a big face actually touches: a second tiny packed
    # sort over (global_cap, TX) emissions.
    gkey = jnp.where(onscreen & ~small, jnp.arange(f, dtype=jnp.int32), f)
    gkey = jnp.concatenate(  # pad: meshes may have fewer faces than the cap
        [gkey, jnp.full((global_cap,), f, jnp.int32)]
    )
    gsort = jnp.sort(gkey)[:global_cap]
    gvalid = gsort < f
    gids = jnp.where(gvalid, gsort, 0)
    gtx0 = jnp.where(gvalid, tx0[gids], tx)
    gtx1 = jnp.where(gvalid, tx1[gids], -1)
    n2 = global_cap * tx
    shift2 = max(int(n2 - 1).bit_length(), 1)
    cols = jnp.arange(tx, dtype=jnp.int32)[None, :]
    hit = (gtx0[:, None] <= cols) & (cols <= gtx1[:, None])
    slot2 = jnp.arange(n2, dtype=jnp.int32).reshape(global_cap, tx)
    key2 = jnp.where(hit, (cols << shift2) | slot2,
                     (tx << shift2) | slot2).reshape(-1)
    key2 = jnp.sort(key2)
    gstarts = jnp.searchsorted(
        key2, jnp.arange(tx + 1, dtype=jnp.int32) << shift2
    ).astype(jnp.int32)
    gid_sorted = gids[(key2 & ((1 << shift2) - 1)) // tx]
    # Layout: [gstarts (TX+1) | ids (G*TX) | 8 zero pad for block tails |
    # UNCAPPED global count].  The kernel never reads the final element;
    # the launcher uses it to detect global-list overflow (a mesh with
    # more than ``global_cap`` huge faces — e.g. low-poly CAD walls or
    # full-height cylinder quads) and fall back LOSSLESSLY to the sorted
    # kernel instead of silently dropping faces.
    gtotal = jnp.sum((onscreen & ~small).astype(jnp.int32))
    glob_col = jnp.concatenate(
        [gstarts, gid_sorted, jnp.zeros((8,), jnp.int32), gtotal[None]]
    )
    return face_ids, starts, glob_col


def _face_block(p8, px, py, z, r, g, b):
    """Depth-test 8 faces (rows of p8 (8, 24)) against one (8, 128) sub-tile.

    All dense vector math — no scalar reads: plane evals broadcast the
    (8,)-face coefficient axis against the (8, 128) pixel tile as
    (8, 8, 128) ops; the z-resolve unrolls the 8 faces as single-vreg
    selects.  Zero-parameter rows (padding / culled faces) are exact
    no-ops: their inv-z plane evaluates to 0 which never beats the
    z-buffer, so block alignment slop needs no masking.
    """
    def c3(i):
        return p8[:, i][:, None, None]

    px3 = px[None, :, :]
    py3 = py[None, :, :]
    l0 = c3(0) * px3 + c3(1) * py3 + c3(2)
    l1 = c3(3) * px3 + c3(4) * py3 + c3(5)
    l2 = c3(6) * px3 + c3(7) * py3 + c3(8)
    iz = c3(9) * px3 + c3(10) * py3 + c3(11)
    # min(λ0, λ1, λ2) >= 0 == all three >= 0: two mins + one compare
    # instead of three compares + two ands (~8% of the block's VPU ops).
    score = jnp.where(jnp.minimum(jnp.minimum(l0, l1), l2) >= 0, iz, 0.0)
    rn = c3(12) * px3 + c3(13) * py3 + c3(14)
    gn = c3(15) * px3 + c3(16) * py3 + c3(17)
    bn = c3(18) * px3 + c3(19) * py3 + c3(20)
    for f in range(8):
        sf = score[f]
        upd = sf > z
        z = jnp.where(upd, sf, z)
        r = jnp.where(upd, rn[f], r)
        g = jnp.where(upd, gn[f], g)
        b = jnp.where(upd, bn[f], b)
    return z, r, g, b


def _raster_kernel_cols(starts_smem, glob_smem, ids_hbm, params_ref,
                        rgb_ref, depth_ref,
                        ids_smem, p8s, zsc, rsc, gsc, bsc, dma_sem,
                        *, n_subs, cap):
    """Column raster kernel: grid (B, X columns of 128 px).

    Each step owns a full (n_subs*8, 128) image column.  The sorted face
    ids of its n_subs (8, 128) sub-tiles are CONTIGUOUS (column-major tile
    ids), so each round DMAs one 128-aligned id window into SMEM; each
    8-face block is assembled from the per-sample params block with 8
    dynamic-sublane vector loads and rasterized densely
    (:func:`_face_block`) — no per-coefficient scalar reads.
    """
    bi = pl.program_id(0)
    xi = pl.program_id(1)
    t0 = xi * n_subs
    col_s = starts_smem[bi, t0]
    col_e = starts_smem[bi, t0 + n_subs]

    px = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(
        jnp.float32) + (xi * 128).astype(jnp.float32) + 0.5
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(
        jnp.float32) + 0.5

    zsc[:] = jnp.zeros_like(zsc)
    rsc[:] = jnp.zeros_like(rsc)
    gsc[:] = jnp.zeros_like(gsc)
    bsc[:] = jnp.zeros_like(bsc)

    def assemble(read_id):
        """8 id reads + 8 dynamic-sublane param-row copies -> (8, 24)."""
        for u in range(8):
            p8s[u, :] = params_ref[0, read_id(u), :]
        return p8s[:, :]

    wb0 = (col_s // cap) * cap  # cap is a multiple of 128: aligned windows
    rounds = jnp.where(col_e > col_s, (col_e - wb0 + cap - 1) // cap, 0)

    def round_body(rd, _):
        wb = wb0 + rd * cap
        dma = pltpu.make_async_copy(
            ids_hbm.at[bi, pl.ds(wb // 128, cap // 128)], ids_smem, dma_sem
        )
        dma.start()
        dma.wait()

        def sub_body(si, _):
            sstart = starts_smem[bi, t0 + si]
            send = starts_smem[bi, t0 + si + 1]
            lo = jnp.maximum((sstart // 8) * 8, wb)
            hi = jnp.minimum(send, wb + cap)
            nb = jnp.maximum((hi - lo + 7) // 8, 0)

            @pl.when(nb > 0)
            def _():
                py = row_iota + (si * 8).astype(jnp.float32)
                off = pl.multiple_of(si * 8, 8)
                carry = (zsc[pl.ds(off, 8), :], rsc[pl.ds(off, 8), :],
                         gsc[pl.ds(off, 8), :], bsc[pl.ds(off, 8), :])

                def blk(jb, cr):
                    base = lo - wb + jb * 8
                    p8 = assemble(
                        lambda u: ids_smem[(base + u) // 128, (base + u) % 128]
                    )
                    return _face_block(p8, px, py, *cr)

                z, r, g, b = jax.lax.fori_loop(0, nb, blk, carry)
                zsc[pl.ds(off, 8), :] = z
                rsc[pl.ds(off, 8), :] = r
                gsc[pl.ds(off, 8), :] = g
                bsc[pl.ds(off, 8), :] = b

            return 0

        jax.lax.fori_loop(0, n_subs, sub_body, 0)
        return 0

    jax.lax.fori_loop(0, rounds, round_body, 0)

    # Global (big-bbox) faces, restricted to THIS column's list (tail
    # blocks read into the next column's ids — harmless re-evals).
    n_cols = pl.num_programs(1)
    gs = glob_smem[bi, xi]
    ge = glob_smem[bi, xi + 1]
    ngb = jnp.maximum((ge - gs + 7) // 8, 0)

    @pl.when(ngb > 0)
    def _():
        def sub_g(si, _):
            py = row_iota + (si * 8).astype(jnp.float32)
            off = pl.multiple_of(si * 8, 8)
            carry = (zsc[pl.ds(off, 8), :], rsc[pl.ds(off, 8), :],
                     gsc[pl.ds(off, 8), :], bsc[pl.ds(off, 8), :])

            def blk(jb, cr):
                base = n_cols + 1 + gs + jb * 8
                p8 = assemble(lambda u: glob_smem[bi, base + u])
                return _face_block(p8, px, py, *cr)

            z, r, g, b = jax.lax.fori_loop(0, ngb, blk, carry)
            zsc[pl.ds(off, 8), :] = z
            rsc[pl.ds(off, 8), :] = r
            gsc[pl.ds(off, 8), :] = g
            bsc[pl.ds(off, 8), :] = b
            return 0

        jax.lax.fori_loop(0, n_subs, sub_g, 0)

    hit = zsc[:] > 0
    inv = 1.0 / jnp.maximum(zsc[:], 1e-9)
    depth_ref[0] = jnp.where(hit, inv, 0.0)
    rgb_ref[0, 0] = rsc[:] * inv
    rgb_ref[0, 1] = gsc[:] * inv
    rgb_ref[0, 2] = bsc[:] * inv


#: Compaction budget as a fraction of the face table — DEFAULT OFF (0).
#: Round 4 added a valid-first partition that compacts the face list
#: before the S-fold span expansion so the main packed sort shrinks to
#: 62.5% (motivated by culling invalidating ~half the faces).  Round 5
#: re-measured it in the regime it was built for and it LOSES: once the
#: cylinder-winding fix made every dense bench mesh cullable the
#: compaction branch actually engaged, and at F=3996 B=128 crop-regime
#: it cost 120.6 ms vs 77.4 ms without (tools/profile_dense.py) — the
#: post-bin ``take_along_axis`` mapping ~F*S sorted ids back to the
#: original face space is ~4M element-at-a-time gathers, dwarfing the
#: ~5 ms the shorter sort saves.  The path is kept (tested, lossless,
#: opt-in via ``compact_frac``) in case a gather-free id mapping makes
#: it profitable later.
_COMPACT_FRAC = 0.0


def _render_from_params_cols(params, bbox, face_ok, image_size, interpret,
                             sy_span: int = 6, sx_span: int = 2,
                             global_cap: int = 120, cap: int = 2048,
                             compact_frac: float = _COMPACT_FRAC):
    """Column-kernel launch (sorted ids + VMEM params, one DMA/column)."""
    b, f = params.shape[0], params.shape[1]
    h, w = image_size
    n_subs = pl.cdiv(h, 8)
    n_cols = pl.cdiv(w, 128)
    hp, wp = n_subs * 8, n_cols * 128

    def launch(face_ids, starts, glob):
        # Pad ids so any cap-aligned window stays in bounds; pad id 0 →
        # real face-0 params, harmless (a face is a geometric no-op in any
        # tile its triangle doesn't cover, re-evals are idempotent under
        # the strict z-test, and culled/padding faces pack zero params).
        ns = face_ids.shape[1]
        nr = (pl.cdiv(ns, cap) + 1) * cap
        ids_p = jnp.zeros((b, nr), jnp.int32).at[:, :ns].set(face_ids)
        ids_p = ids_p.reshape(b, nr // 128, 128)

        kernel = functools.partial(_raster_kernel_cols, n_subs=n_subs,
                                   cap=cap)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_cols),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # sorted ids (HBM)
                pl.BlockSpec((1, f, 24), lambda bi, xi, *_: (bi, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 3, hp, 128),
                             lambda bi, xi, *_: (bi, 0, 0, xi)),
                pl.BlockSpec((1, hp, 128), lambda bi, xi, *_: (bi, 0, xi)),
            ],
            scratch_shapes=[
                pltpu.SMEM((cap // 128, 128), jnp.int32),
                pltpu.VMEM((8, 24), jnp.float32),
                pltpu.VMEM((hp, 128), jnp.float32),
                pltpu.VMEM((hp, 128), jnp.float32),
                pltpu.VMEM((hp, 128), jnp.float32),
                pltpu.VMEM((hp, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, 3, hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            ],
            interpret=interpret,
        )(starts, glob, ids_p, params)

    def bin_full(_):
        face_ids, starts, glob = jax.vmap(
            lambda bb, ok: bin_faces_packed(bb, ok, image_size, (8, 128),
                                            sy_span, sx_span, global_cap)
        )(bbox, face_ok)  # (B, F*S), (B, T+1), (B, TX+1 + G*TX + 8 + 1)
        # glob's final element = uncapped global count (overflow sentinel)
        return face_ids, starts, glob

    def run_cols(ops):
        _, _, _, face_ids, starts, glob = ops
        rgb, depth = launch(face_ids, starts, glob)
        return rgb[:, :, :h, :w], depth[:, :h, :w]

    def run_sorted_fallback(ops):
        # Lossless escape hatch for meshes with more than ``global_cap``
        # huge faces (low-poly CAD walls, full-height quads): the sorted
        # kernel with spans covering the whole tile grid bins EVERY face
        # exactly (its own global list stays empty), at ~1.7x the cols
        # kernel's time.  Silent face drops are never acceptable — they
        # put holes in renders the refiner then "corrects" toward.
        p2, bb, ok = ops[0], ops[1], ops[2]
        return _render_from_params_sorted(
            p2, bb, ok, image_size, (32, 256), interpret,
            sy_span=pl.cdiv(h, 32), sx_span=pl.cdiv(w, 256))

    def dispatch(binned):
        overflow = jnp.max(binned[2][:, -1]) > global_cap
        return jax.lax.cond(overflow, run_sorted_fallback, run_cols,
                            (params, bbox, face_ok, *binned))

    budget = int(-(-int(f * compact_frac) // 128)) * 128 if compact_frac \
        else 0
    if not 0 < budget < f:
        return dispatch(bin_full(None))

    def bin_compact(_):
        # Valid-first stable partition (one F-key sort/sample), then bin
        # only `budget` faces; bin output indexes the COMPACT space, so
        # gather back through `keep` — the raster kernel and its full-F
        # params table are untouched.
        order = jnp.argsort(jnp.logical_not(face_ok), axis=1, stable=True)
        keep = order[:, :budget]
        bb_k = jnp.take_along_axis(bbox, keep[..., None], axis=1)
        ok_k = jnp.take_along_axis(face_ok, keep, axis=1)
        ids_c, starts, glob = jax.vmap(
            lambda bb, ok: bin_faces_packed(bb, ok, image_size, (8, 128),
                                            sy_span, sx_span, global_cap)
        )(bb_k, ok_k)
        face_ids = jnp.take_along_axis(keep, ids_c, axis=1)
        g0 = n_cols + 1  # glob layout: [gstarts | gids (G*TX) | 8 pad]
        gseg = jnp.take_along_axis(keep, glob[:, g0:g0 + global_cap * n_cols],
                                   axis=1)
        glob = glob.at[:, g0:g0 + global_cap * n_cols].set(gseg)
        # Pad the compact id list to the full-path length so both cond
        # branches return identical shapes (pad ids are no-ops past the
        # starts ranges; see launch()).
        pad = f * sy_span * sx_span - face_ids.shape[1]
        face_ids = jnp.pad(face_ids, ((0, 0), (0, pad)))
        return face_ids, starts, glob

    fits = jnp.max(jnp.sum(face_ok, axis=1)) <= budget
    return dispatch(jax.lax.cond(fits, bin_compact, bin_full, None))


# Above this face budget the kernels' VMEM-resident (F, 24) param table
# (lane-padded to 128) exceeds scoped VMEM; render in face chunks and
# z-merge (exact: strict 1/z test, background = 0).
_FACE_CHUNK = 12288
# Crossover measured on v5e (tools/profile_raster.py): the column kernel's
# dense 8-face blocks win once tiles are crowded; the big-tile sorted
# kernel wins for small face budgets.  This default serves the SPARSE
# regime (full-frame renders, object covers a fraction of the image).
_COLS_MIN_FACES = 4096
# In the zoom-CROP regime (refine loop: the object fills the frame) tiles
# crowd much earlier, and the sorted kernel's per-face scalar coefficient
# reads dominate: measured on v5e at B=128 480x640 crop intrinsics
# (tools/profile_dense.py), cols-vs-sort is 57/56 ms at F=1008,
# 72/91 at F=1520, and 87/183 at F=3996 — the crossover sits at ~1k
# faces, not 4k.  render_crops dispatches on this bound.
_COLS_MIN_FACES_CROP = 1024


def _zmerge_nchw(a, b):
    """Merge two (rgb NCHW, depth) renders by the closer non-bg depth.

    Runs on the kernels' native (B, 3, H, W) output — merging after the
    NHWC transpose makes XLA materialize channel-minor temps lane-padded
    3 -> 128 (~40x memory).
    """
    (rgb_a, d_a), (rgb_b, d_b) = a, b
    take_b = (d_b > 0) & ((d_a == 0) | (d_b < d_a))
    return (jnp.where(take_b[:, None], rgb_b, rgb_a),
            jnp.where(take_b, d_b, d_a))


def _render_dispatch(params, bbox, face_ok, image_size, tile,
                     max_faces_per_tile, interpret, binning,
                     spans=(4, 2)):
    """Pick a kernel (auto by face budget) and chunk faces past the VMEM cap.

    All internal paths return (rgb (B, 3, H, W), depth (B, H, W)); the
    NHWC transpose happens once here.
    """
    f = params.shape[1]
    if f > _FACE_CHUNK:
        out = None
        for c0 in range(0, f, _FACE_CHUNK):
            c1 = min(c0 + _FACE_CHUNK, f)
            part = _render_chunk(
                params[:, c0:c1], bbox[:, c0:c1], face_ok[:, c0:c1],
                image_size, tile, max_faces_per_tile, interpret, binning,
                spans,
            )
            out = part if out is None else _zmerge_nchw(out, part)
    else:
        out = _render_chunk(params, bbox, face_ok, image_size, tile,
                            max_faces_per_tile, interpret, binning, spans)
    rgb, depth = out
    return jnp.transpose(rgb, (0, 2, 3, 1)), depth


def _render_chunk(params, bbox, face_ok, image_size, tile,
                  max_faces_per_tile, interpret, binning, spans=(4, 2)):
    """One ≤ _FACE_CHUNK kernel launch -> (rgb NCHW, depth)."""
    f = params.shape[1]
    if binning == "auto":
        binning = "cols" if f >= _COLS_MIN_FACES else "sort"
    if binning == "topk":
        import warnings

        warnings.warn(
            "binning='topk' caps each tile at max_faces_per_tile faces and "
            "SILENTLY DROPS the rest (visible holes on dense meshes); it is "
            "kept only as a legacy comparison path — use 'auto', 'sort', or "
            "'cols' (all lossless)",
            RuntimeWarning,
            stacklevel=4,
        )
    if binning == "cols":
        # The column kernel bins on (8, 128) sub-tiles with its own tuned
        # spans/caps — the caller's `spans` (sort-path (32, 256) tile
        # geometry) and `max_faces_per_tile` deliberately do NOT apply.
        return _render_from_params_cols(params, bbox, face_ok, image_size,
                                        interpret)
    if binning == "sort":
        return _render_from_params_sorted(params, bbox, face_ok, image_size,
                                          tile, interpret,
                                          sy_span=spans[0], sx_span=spans[1])
    return _render_from_params(params, bbox, face_ok, image_size, tile,
                               max_faces_per_tile, interpret)


def _raster_kernel_sorted(starts_smem, glob_smem, vals_hbm, params_ref,
                          rgb_ref, depth_ref,
                          zbuf, rbuf, gbuf, bbuf, ids_smem, dma_sem,
                          *, tile, n_tx, chunk_rows):
    """Sort-binned raster kernel: per-tile contiguous ranges + global list.

    ``starts_smem`` (B, T+1) and ``glob_smem`` (B, G+1) arrive via scalar
    prefetch (SMEM); ``vals_hbm`` (B, NR, 128) holds each sample's sorted
    face ids; windows are DMA'd chunkwise into SMEM.
    """
    th, tw = tile
    ch = chunk_rows * 128
    bi = pl.program_id(0)
    tyi = pl.program_id(1)
    txi = pl.program_id(2)
    t_lin = tyi * n_tx + txi

    oy = (tyi * th).astype(jnp.float32)
    ox = (txi * tw).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + (
        oy + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + (
        ox + 0.5
    )

    zbuf[:] = jnp.zeros((th, tw), jnp.float32)
    rbuf[:] = jnp.zeros((th, tw), jnp.float32)
    gbuf[:] = jnp.zeros((th, tw), jnp.float32)
    bbuf[:] = jnp.zeros((th, tw), jnp.float32)

    def face_body(fi):
        l0 = params_ref[0, fi, 0] * px + params_ref[0, fi, 1] * py + \
            params_ref[0, fi, 2]
        l1 = params_ref[0, fi, 3] * px + params_ref[0, fi, 4] * py + \
            params_ref[0, fi, 5]
        l2 = params_ref[0, fi, 6] * px + params_ref[0, fi, 7] * py + \
            params_ref[0, fi, 8]
        invz = params_ref[0, fi, 9] * px + params_ref[0, fi, 10] * py + \
            params_ref[0, fi, 11]
        upd = (jnp.minimum(jnp.minimum(l0, l1), l2) >= 0) & \
            (invz > zbuf[:])
        zbuf[:] = jnp.where(upd, invz, zbuf[:])
        r = params_ref[0, fi, 12] * px + params_ref[0, fi, 13] * py + \
            params_ref[0, fi, 14]
        g = params_ref[0, fi, 15] * px + params_ref[0, fi, 16] * py + \
            params_ref[0, fi, 17]
        b = params_ref[0, fi, 18] * px + params_ref[0, fi, 19] * py + \
            params_ref[0, fi, 20]
        rbuf[:] = jnp.where(upd, r, rbuf[:])
        gbuf[:] = jnp.where(upd, g, gbuf[:])
        bbuf[:] = jnp.where(upd, b, bbuf[:])

    # --- per-tile range, DMA'd in aligned chunks -------------------------
    start = starts_smem[bi, t_lin]
    end = starts_smem[bi, t_lin + 1]
    row0 = start // 128
    n_chunks = jax.lax.cond(
        end > start,
        lambda: (end - row0 * 128 + ch - 1) // ch,
        lambda: 0,
    )

    def chunk_body(c, _):
        base = row0 + c * chunk_rows  # row index into vals_hbm[bi]
        dma = pltpu.make_async_copy(
            vals_hbm.at[bi, pl.ds(base, chunk_rows)], ids_smem, dma_sem
        )
        dma.start()
        lo = jnp.maximum(start - (base * 128), 0)
        hi = jnp.minimum(end - (base * 128), ch)
        dma.wait()

        def id_body(j, _):
            face_body(ids_smem[j // 128, j % 128])
            return 0

        jax.lax.fori_loop(lo, hi, id_body, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # --- global (big-bbox) faces -----------------------------------------
    gcount = glob_smem[bi, 0]

    def glob_body(j, _):
        face_body(glob_smem[bi, 1 + j])
        return 0

    jax.lax.fori_loop(0, gcount, glob_body, 0)

    hit = zbuf[:] > 0
    inv = 1.0 / jnp.maximum(zbuf[:], 1e-9)
    depth_ref[0] = jnp.where(hit, inv, 0.0)
    rgb_ref[0, 0] = rbuf[:] * inv
    rgb_ref[0, 1] = gbuf[:] * inv
    rgb_ref[0, 2] = bbuf[:] * inv


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

    # z-buffer holds INVERSE depth: larger = closer, 0 = background.
    zbuf[:] = jnp.zeros((th, tw), jnp.float32)
    rbuf[:] = jnp.zeros((th, tw), jnp.float32)
    gbuf[:] = jnp.zeros((th, tw), jnp.float32)
    bbuf[:] = jnp.zeros((th, tw), jnp.float32)

    row_dma.wait()
    # Row layout (flattened (R, 128)): [count, face_idx_0, face_idx_1, ...]
    count = list_smem[0, 0]

    def body(j, _):
        fi = list_smem[(1 + j) // 128, (1 + j) % 128]
        # Barycentric planes: inside iff all three λ ≥ 0 (either winding).
        l0 = params_ref[0, fi, 0] * px + params_ref[0, fi, 1] * py + \
            params_ref[0, fi, 2]
        l1 = params_ref[0, fi, 3] * px + params_ref[0, fi, 4] * py + \
            params_ref[0, fi, 5]
        l2 = params_ref[0, fi, 6] * px + params_ref[0, fi, 7] * py + \
            params_ref[0, fi, 8]
        invz = params_ref[0, fi, 9] * px + params_ref[0, fi, 10] * py + \
            params_ref[0, fi, 11]
        upd = (jnp.minimum(jnp.minimum(l0, l1), l2) >= 0) & \
            (invz > zbuf[:])
        zbuf[:] = jnp.where(upd, invz, zbuf[:])
        # Color numerator planes (c·invz); divided once per tile below.
        r = params_ref[0, fi, 12] * px + params_ref[0, fi, 13] * py + \
            params_ref[0, fi, 14]
        g = params_ref[0, fi, 15] * px + params_ref[0, fi, 16] * py + \
            params_ref[0, fi, 17]
        b = params_ref[0, fi, 18] * px + params_ref[0, fi, 19] * py + \
            params_ref[0, fi, 20]
        rbuf[:] = jnp.where(upd, r, rbuf[:])
        gbuf[:] = jnp.where(upd, g, gbuf[:])
        bbuf[:] = jnp.where(upd, b, bbuf[:])
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    hit = zbuf[:] > 0
    inv = 1.0 / jnp.maximum(zbuf[:], 1e-9)  # one divide per tile
    depth_ref[0] = jnp.where(hit, inv, 0.0)
    rgb_ref[0, 0] = rbuf[:] * inv
    rgb_ref[0, 1] = gbuf[:] * inv
    rgb_ref[0, 2] = bbuf[:] * inv


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_faces_per_tile", "z_near",
                     "interpret", "binning"),
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
    tile: tuple[int, int] = (32, 256),
    max_faces_per_tile: int = 512,
    interpret: bool = False,
    binning: str = "auto",  # auto | sort | cols | topk (capped legacy)
) -> tuple[jax.Array, jax.Array]:
    """Rasterize a batch of hypotheses → (rgb (B, H, W, 3), depth (B, H, W)).

    The batch dimension is the hypothesis/object axis (SURVEY.md §2.7: the
    TPU scaling axis replacing the reference's per-GPU context split).
    """
    batched_mesh = vertices.ndim == 3
    if batched_mesh and faces.ndim == 3:
        # Per-sample meshes AND face lists (multi-class batches).
        pack = jax.vmap(
            lambda v, ff, c, n, p, kk: pack_face_params(
                v, ff, c, n, p, kk, lighting, z_near
            )
        )
        params, bbox, face_ok = pack(vertices, faces, colors, normals,
                                     poses, ks)
    elif batched_mesh:
        pack = jax.vmap(
            lambda v, c, n, p, kk: pack_face_params(
                v, faces, c, n, p, kk, lighting, z_near
            )
        )
        params, bbox, face_ok = pack(vertices, colors, normals, poses, ks)
    else:
        pack = jax.vmap(
            lambda p, kk: pack_face_params(
                vertices, faces, colors, normals, p, kk, lighting, z_near
            )
        )
        params, bbox, face_ok = pack(poses, ks)
    return _render_dispatch(params, bbox, face_ok, image_size, tile,
                            max_faces_per_tile, interpret, binning)


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "tile", "max_faces_per_tile", "z_near",
                     "interpret", "binning", "spans"),
)
def render_batch_tri(
    tri_pos: jax.Array,  # (B, 9, F) corner-major SoA object-frame positions
    tri_col: jax.Array,  # (B, 9, F)
    tri_nrm: jax.Array,  # (B, 9, F)
    poses: jax.Array,  # (B, 3, 4)
    ks: jax.Array,  # (B, 3, 3)
    image_size: tuple[int, int],
    lighting: Lighting = FLAT_LIGHTING,
    z_near: float = 0.01,
    tile: tuple[int, int] = (32, 256),
    max_faces_per_tile: int = 512,
    interpret: bool = False,
    binning: str = "auto",  # auto | sort | cols | topk (capped legacy)
    spans: tuple[int, int] = (4, 2),  # sort-binning (sy, sx) tile spans
    cull_dir: jax.Array | None = None,  # (B,) ±1 cull sign, 0 = two-sided
) -> tuple[jax.Array, jax.Array]:
    """Gather-free production render path (corner-major mesh data).

    Same outputs as :func:`render_batch`; use this when the mesh is already
    corner-major (``RenderAssets.tri_*``) — the vertex+faces path spends
    most of its time in per-face gathers on TPU.

    ``spans``: how many tiles a face may register with before falling to
    the every-tile global list.  (4, 2) suits sparse full-frame renders;
    (8, 3) is ~12% faster when the object fills the frame (the refine
    loop's zoom-crop regime) — big faces land in their exact tiles instead
    of being re-tested by all of them.

    ``cull_dir``: per-sample back-face cull sign from
    ``mesh.cull_direction`` (exact for closed meshes; halves the face
    workload).  None/0 renders two-sided like the reference GL path.
    """
    if cull_dir is None:
        pack = jax.vmap(
            lambda tp, tc, tn, p, kk: pack_tri_params(
                tp, tc, tn, p, kk, lighting, z_near
            )
        )
        params, bbox, face_ok = pack(tri_pos, tri_col, tri_nrm, poses, ks)
    else:
        pack = jax.vmap(
            lambda tp, tc, tn, p, kk, cd: pack_tri_params(
                tp, tc, tn, p, kk, lighting, z_near, cd
            )
        )
        params, bbox, face_ok = pack(tri_pos, tri_col, tri_nrm, poses, ks,
                                     cull_dir)
    return _render_dispatch(params, bbox, face_ok, image_size, tile,
                            max_faces_per_tile, interpret, binning,
                            spans=spans)


def _render_from_params_sorted(params, bbox, face_ok, image_size, tile,
                               interpret, chunk_rows: int = 4,
                               global_cap: int = 128,
                               sy_span: int = 4, sx_span: int = 2):
    """Lossless sort-binned launch (see :func:`bin_faces_sorted`)."""
    b, f = params.shape[0], params.shape[1]
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)

    vals, starts, glob = jax.vmap(
        lambda bb, ok: bin_faces_sorted(bb, ok, image_size, tile,
                                        sy_span=sy_span, sx_span=sx_span,
                                        global_cap=global_cap)
    )(bbox, face_ok)  # (B, F*S), (B, T+1), (B, G+1)
    # Row-pack sorted ids; pad so any chunk window stays in bounds.
    n = vals.shape[1]
    nr = pl.cdiv(n, 128) + chunk_rows
    vals3 = jnp.zeros((b, nr * 128), jnp.int32).at[:, :n].set(vals)
    vals3 = vals3.reshape(b, nr, 128)

    kernel = functools.partial(_raster_kernel_sorted, tile=tile, n_tx=tx,
                               chunk_rows=chunk_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, ty, tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # vals stay in HBM
            pl.BlockSpec((1, f, 24), lambda bi, yi, xi, *_: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, th, tw), lambda bi, yi, xi, *_: (bi, 0, yi, xi)),
            pl.BlockSpec((1, th, tw), lambda bi, yi, xi, *_: (bi, yi, xi)),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.VMEM((th, tw), jnp.float32),
            pltpu.SMEM((chunk_rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    rgb, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(starts, glob, vals3, params)
    return rgb, depth


def _render_from_params(params, bbox, face_ok, image_size, tile,
                        max_faces_per_tile, interpret):
    """Shared bin + kernel launch from packed (B, F, 24) face params."""
    b, f = params.shape[0], params.shape[1]
    h, w = image_size
    th, tw = tile
    ty = pl.cdiv(h, th)
    tx = pl.cdiv(w, tw)
    max_k = min(max_faces_per_tile, f)

    lists, counts = jax.vmap(
        lambda bb, ok: bin_faces(bb, ok, image_size, tile, max_k)
    )(bbox, face_ok)  # (B, TY, TX, K), (B, TY, TX)
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

    return rgb, depth
