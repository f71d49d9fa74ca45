"""The iterative render-and-compare refinement loop, fully on-device.

TPU-native rebuild of the reference's test loop
(``deepim/core/tester.py §pred_eval``): the reference runs, per iteration
and per hypothesis, OpenGL render (host↔GPU), host zoom (cv2 in CustomOps),
MXNet forward, and numpy pose composition.  Here the whole K-iteration loop
is ONE jitted ``lax.scan`` — render (Pallas/XLA rasterizer, straight into
the zoom crop via adjusted intrinsics), fused zoom of the observed image,
CNN forward, untangled SE(3) compose — batched over hypotheses (the TPU
scaling axis, SURVEY.md §2.7).

Delta-pose convention: the network's (vx, vy) are expressed in **zoom-crop
pixel units** (targets built with the crop intrinsics ``K_z``), so the
prediction is exactly scale-equivariant with what the net sees.  The
reference instead feeds a ``zoom_factor`` blob and un-zooms on the host;
the two parameterizations are related by the zoom scale and ours removes
the extra input.  ``vz = log(z_src / z_tgt)`` is scale-free either way.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.delta_pose import DeltaPose, apply_delta
from deepim_tpu.models.flownet import (
    decode_rot, network_input, normalize_depth, select_class,
)
from deepim_tpu.ops.zoom import (
    compute_zoom_box, zoom_image_batch, zoom_intrinsics,
)
from deepim_tpu.raster import raster_pallas, raster_xla


class RenderAssets(NamedTuple):
    """Per-class mesh data stacked to static budgets (device arrays).

    All leading dims are the class axis C; per-sample gathers by class index
    keep the refine loop single-program (no per-class branching).
    """

    vertices: jax.Array  # (C, V, 3)
    faces: jax.Array  # (C, F, 3) int32 (degenerate-padded)
    colors: jax.Array  # (C, V, 3)
    normals: jax.Array  # (C, V, 3)
    corners: jax.Array  # (C, 8, 3) AABB corners (zoom bbox source)
    points: jax.Array  # (C, N, 3) sampled surface points (PM loss/metrics)
    sym_poses: jax.Array  # (C, S, 3, 4) symmetry set (identity-padded)
    diameters: jax.Array  # (C,) model diameters (ADD thresholds)
    # Corner-major triangle copies in structure-of-arrays layout
    # (C, 9, F): row 3*corner+coord holds that component for all F faces.
    # Two TPU constraints drive this: (a) gathers run element-at-a-time, so
    # the raster path must never do arr[faces] per call — corners are
    # pre-gathered at build time; (b) per-face math must run on (F,)-shaped
    # vectors — an (F, 3, 3) layout pads the 3-lanes to 128 and wastes ~98%
    # of every vector op.
    tri_pos: jax.Array  # (C, 9, F) object-frame corner positions
    tri_col: jax.Array  # (C, 9, F) corner colors
    tri_nrm: jax.Array  # (C, 9, F) corner normals
    # Optional per-pixel texturing (YCB-style scanned meshes; the reference
    # samples textures in its GLSL fragment shader).  When present,
    # render_crops uses the deferred-texturing raster path; otherwise
    # tri_col carries baked/vertex colors.  UVs are rescaled at build time
    # into the padded texture atlas frame.
    tri_uv: jax.Array | None = None  # (C, 6, F) corner-major UVs
    textures: jax.Array | None = None  # (C, Th, Tw, 3) padded stack
    # Class index into `textures`.  gather_class maps it to the batch like
    # every other field but leaves `textures` with its class axis — the
    # deferred pass indexes the atlas per sample instead of materializing
    # (B, Th, Tw, 3) gathered copies in HBM.
    tex_idx: jax.Array | None = None  # (C,) -> per-sample (B,) after gather
    # Per-class CONTINUOUS z-symmetry flag (symmetry.CONTINUOUS_Z): the PM
    # loss takes the closed-form min over the continuous rotation instead
    # of (only) the discrete sym_poses set.
    sym_continuous: jax.Array | None = None  # (C,) bool
    # Per-class back-face cull sign (±1), 0 = render two-sided.  Set by
    # build_assets from ``mesh.cull_direction`` — nonzero only for closed
    # consistently-wound meshes, where culling is exact and roughly halves
    # the raster kernel's face workload (the refine loop's hottest op).
    cull_dir: jax.Array | None = None  # (C,) float32
    # Optional coarse level-of-detail: a nested RenderAssets built from
    # the same meshes decimated to ``lod_faces`` (build_assets).  The
    # refine loop's COARSE iterations render this level — they only
    # correct gross pose error at half resolution, so a ~1k-face
    # decimation is visually sufficient while cutting the dense-mesh
    # raster cost ~2x per coarse iteration (round-4 face-budget table:
    # the F=4096 real-asset budget ran 4.5x below the headline).
    # ``textures``/``tex_idx`` are SHARED with the parent (same canvas).
    lod: Any = None  # RenderAssets | None

    @property
    def num_classes(self) -> int:
        return self.vertices.shape[0]

    @property
    def textured(self) -> bool:
        return self.textures is not None


def build_assets(meshes, sym_transforms=None, num_points: int = 3000,
                 max_vertices: int | None = None, max_faces: int | None = None,
                 max_syms: int | None = None,
                 use_textures: bool | None = None,
                 lod_faces: int | None = None) -> RenderAssets:
    """Stack host Mesh objects into a RenderAssets (pads to shared budgets).

    ``use_textures``: None (default) auto-enables per-pixel texturing when
    any mesh carries a texture; False forces baked vertex colors (cheaper:
    no deferred texture gather per rendered pixel); True requires at least
    one textured mesh.  Untextured meshes in a textured set get a constant
    texture at their mean vertex color.

    ``lod_faces``: build a nested coarse level (``.lod``) with every mesh
    decimated to this face budget — the refine loop renders it during
    coarse-to-fine's coarse iterations (see ``RenderAssets.lod``).  Only
    built when it would actually shrink the face table.
    """
    import numpy as np

    from deepim_tpu.geometry.symmetry import (
        CONTINUOUS_Z, CONTINUOUS_Z_DISCRETE, sym_set,
    )
    from deepim_tpu.ops.zoom import model_corners
    from deepim_tpu.raster.mesh import cull_direction, pad_mesh, sample_points

    sym_transforms = sym_transforms or [None] * len(meshes)
    sym_cont = np.asarray(
        [isinstance(s, str) and s == CONTINUOUS_Z for s in sym_transforms]
    )
    mv = max_vertices or max(m.num_vertices for m in meshes)
    mf = max_faces or max(m.num_faces for m in meshes)
    ms = max_syms or max(
        (1 if s is None
         else CONTINUOUS_Z_DISCRETE if isinstance(s, str)
         else s.shape[0])
        for s in sym_transforms
    )
    lod = None
    # Built only when it at least HALVES the face table: near-budget
    # meshes (e.g. 1,280-face procedural protocols with the default 1,024
    # coarse budget) would otherwise pay a train/eval appearance mismatch
    # for a ~20% coarse-iteration saving; the dense-asset regime this
    # exists for (4k+ faces) always clears the bar.
    if lod_faces and max(m.num_faces for m in meshes) > 2 * lod_faces:
        from deepim_tpu.raster.mesh import decimate_mesh

        lod = build_assets(
            [decimate_mesh(m, lod_faces) for m in meshes],
            sym_transforms=sym_transforms,
            # The coarse level is only RENDERED (points/syms/diameters are
            # consumed from the fine level by losses/metrics) — a minimal
            # point set keeps the duplicate small.
            num_points=min(num_points, 16),
            use_textures=use_textures,
        )
    padded = [pad_mesh(m, mv + 1, mf) for m in meshes]  # +1 pad vertex
    pts = [sample_points(m, num_points) for m in meshes]
    corners = [
        np.asarray(model_corners(m.vertices.min(0), m.vertices.max(0)),
                   np.float32)
        for m in meshes
    ]
    tex = _texture_fields(meshes, padded, use_textures)
    if lod is not None and tex:
        # Same per-mesh texture images -> identical canvases; share the
        # device atlas instead of holding a duplicate in HBM.
        lod = lod._replace(textures=tex["textures"],
                           tex_idx=tex["tex_idx"])
    return RenderAssets(
        lod=lod,
        vertices=jnp.asarray(np.stack([p.vertices for p in padded])),
        faces=jnp.asarray(np.stack([p.faces for p in padded])),
        colors=jnp.asarray(np.stack([p.colors for p in padded])),
        normals=jnp.asarray(np.stack([p.normals for p in padded])),
        corners=jnp.asarray(np.stack(corners, dtype=np.float32)),
        points=jnp.asarray(np.stack(pts)),
        sym_poses=jnp.asarray(
            np.stack([sym_set(s, ms) for s in sym_transforms])
        ),
        diameters=jnp.asarray(
            np.asarray([m.diameter for m in meshes], np.float32)
        ),
        tri_pos=jnp.asarray(np.stack(
            [p.vertices[p.faces].reshape(-1, 9).T for p in padded]
        )),
        tri_col=jnp.asarray(np.stack(
            [p.colors[p.faces].reshape(-1, 9).T for p in padded]
        )),
        tri_nrm=jnp.asarray(np.stack(
            [p.normals[p.faces].reshape(-1, 9).T for p in padded]
        )),
        sym_continuous=jnp.asarray(sym_cont),
        cull_dir=jnp.asarray(
            np.asarray([cull_direction(m) for m in meshes], np.float32)
        ),
        **tex,
    )


def _texture_fields(meshes, padded, use_textures):
    """Build the optional (tri_uv, textures) stacks for textured meshes.

    Each texture lands at the top-left of a (maxTh, maxTw) canvas and the
    mesh UVs are rescaled so ``sample_texture_bilinear``'s pixel mapping
    (x = u*(W-1), y = (1-v)*(H-1)) hits the same texels as before padding.
    """
    import numpy as np

    have = any(m.texture is not None for m in meshes)
    if use_textures is None:
        use_textures = have
    if not use_textures:
        return {}
    if not have:
        raise ValueError("use_textures=True but no mesh has a texture")

    texs = []
    for m in meshes:
        if m.texture is not None and m.uv is not None:
            texs.append(np.asarray(m.texture[..., :3], np.float32))
        elif m.texture is not None:
            # texture but no UVs: sampling at the uv=0.5 placeholder would
            # paint the whole object one ARBITRARY center texel; a flat
            # texture-mean canvas is the sensible appearance instead.
            mean = np.asarray(m.texture[..., :3], np.float32).mean((0, 1))
            texs.append(np.broadcast_to(mean, (2, 2, 3)).copy())
        else:
            mean = m.colors.mean(0).astype(np.float32)
            texs.append(np.broadcast_to(mean, (2, 2, 3)).copy())
    th = max(t.shape[0] for t in texs)
    tw = max(t.shape[1] for t in texs)
    canvas, uvs = [], []
    for m, p, t in zip(meshes, padded, texs):
        c = np.zeros((th, tw, 3), np.float32)
        c[: t.shape[0], : t.shape[1]] = t
        canvas.append(c)
        if m.uv is not None and m.texture is not None:
            uv = np.concatenate(
                [m.uv, np.zeros((p.num_vertices - m.num_vertices, 2),
                                np.float32)]
            )
        else:
            uv = np.full((p.num_vertices, 2), 0.5, np.float32)
        su = (t.shape[1] - 1) / max(tw - 1, 1)
        sv = (t.shape[0] - 1) / max(th - 1, 1)
        uv = np.stack([uv[:, 0] * su, 1.0 - (1.0 - uv[:, 1]) * sv], 1)
        uvs.append(uv[p.faces].reshape(-1, 6).T.copy())
    return {
        "tri_uv": jnp.asarray(np.stack(uvs)),
        "textures": jnp.asarray(np.stack(canvas)),
        "tex_idx": jnp.arange(len(meshes), dtype=jnp.int32),
    }


def gather_class(assets: RenderAssets, class_idx: jax.Array) -> RenderAssets:
    """Per-sample asset views: class axis C -> batch axis B via gather.

    ``textures`` keeps its class axis (the deferred pass indexes the atlas
    per sample); ``lod`` is not a per-class array — the refine loop
    gathers the coarse level itself for its coarse iterations.
    """
    idx = class_idx.astype(jnp.int32)
    return assets._replace(**{
        f: None if a is None else jnp.take(a, idx, axis=0)
        for f, a in zip(assets._fields, assets)
        if f not in ("textures", "lod")
    })


def render_crops(
    assets_b: RenderAssets,  # batch-gathered (leading dim B)
    poses: jax.Array,  # (B, 3, 4)
    ks: jax.Array,  # (B, 3, 3) crop intrinsics
    out_size: tuple[int, int],
    renderer: str = "pallas",
    max_faces_per_tile: int = 512,
    lighting: raster_xla.Lighting = raster_xla.FLAT_LIGHTING,
) -> tuple[jax.Array, jax.Array]:
    """Rasterize each hypothesis directly at crop resolution -> rgb, depth.

    Textured asset sets (``assets_b.textured``) render through the
    deferred-texturing path (raster interpolates UV+intensity, then one
    bilinear texture gather per pixel — the reference's GLSL fragment-
    shader sampling).  The XLA oracle renderer always uses baked colors.
    """
    # Crop-regime kernel dispatch: the object fills the frame here, which
    # crowds tiles far earlier than the sparse full-frame regime `auto`
    # is tuned for — at the real-asset 4,096-face budget `auto` picked
    # the sorted kernel at 2x the cols kernel's time (see
    # raster_pallas._COLS_MIN_FACES_CROP for the measurements).
    crop_binning = ("cols" if assets_b.tri_pos.shape[2]
                    >= raster_pallas._COLS_MIN_FACES_CROP else "sort")
    if assets_b.textured and renderer in ("pallas", "pallas_interpret"):
        from deepim_tpu.raster.textured import render_batch_textured

        # Same crop-regime tuning as the untextured branch below: faces
        # fill the frame, so exact binning spans and the caller's
        # per-tile face budget apply here too.
        return render_batch_textured(
            assets_b.tri_pos, assets_b.tri_uv, assets_b.tri_nrm,
            poses, ks, out_size, assets_b.textures, lighting=lighting,
            interpret=renderer == "pallas_interpret",
            tex_idx=assets_b.tex_idx,
            max_faces_per_tile=max_faces_per_tile, spans=(8, 3),
            cull_dir=assets_b.cull_dir, binning=crop_binning,
        )
    if renderer in ("pallas", "pallas_interpret"):
        # spans (8, 3): the crop intrinsics make the object fill the
        # frame, so faces are large — let them bin to their exact tiles
        # instead of the every-tile global list (measured ~12% faster
        # than the sparse-regime (4, 2) default).
        return raster_pallas.render_batch_tri(
            assets_b.tri_pos, assets_b.tri_col, assets_b.tri_nrm,
            poses, ks, out_size, lighting=lighting,
            max_faces_per_tile=max_faces_per_tile,
            interpret=renderer == "pallas_interpret",
            spans=(8, 3),
            cull_dir=assets_b.cull_dir, binning=crop_binning,
        )
    if renderer == "xla":
        if assets_b.cull_dir is None:
            return jax.vmap(
                lambda v, f, c, n, p, kk: raster_xla.render_mesh(
                    v, f, c, n, p, kk, out_size, lighting=lighting
                )
            )(assets_b.vertices, assets_b.faces, assets_b.colors,
              assets_b.normals, poses, ks)
        return jax.vmap(
            lambda v, f, c, n, p, kk, cd: raster_xla.render_mesh(
                v, f, c, n, p, kk, out_size, lighting=lighting,
                cull_dir=cd,
            )
        )(assets_b.vertices, assets_b.faces, assets_b.colors,
          assets_b.normals, poses, ks, assets_b.cull_dir)
    raise ValueError(renderer)


def render_scene(
    assets: RenderAssets,
    class_idx: jax.Array,  # (B, M) object class per scene slot
    poses: jax.Array,  # (B, M, 3, 4)
    valid: jax.Array,  # (B, M) bool — inactive slots render nothing
    ks: jax.Array,  # (B, 3, 3)
    out_size: tuple[int, int],
    lighting=raster_xla.FLAT_LIGHTING,
    max_faces_per_tile: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Multi-object scene render with cross-object depth test -> rgb, depth.

    TPU-native equivalent of the reference's multi-program renderer
    (``lib/render_glumpy/render_py_multi.py``): each scene slot's mesh is
    packed at its own pose, the per-object face-parameter lists are
    concatenated, and one raster pass z-tests everything — occlusion
    between objects falls out of the shared z-buffer.

    Textured asset sets render per-pixel textures like ``render_crops``
    (the observed scene and the rendered compare-crop must agree in
    appearance): each slot's UVs are remapped into its class's band of
    the vertically stacked ``(C*Th, Tw)`` texture, so one shared deferred
    bilinear pass serves every object — the per-pixel z-winner lands in
    the right band by construction.
    """
    from deepim_tpu.raster.raster_pallas import (
        _render_dispatch, pack_tri_params,
    )

    b, m = class_idx.shape
    flat_cls = class_idx.reshape(-1)
    tri_pos = jnp.take(assets.tri_pos, flat_cls, axis=0)  # (B*M, 9, F)
    tri_nrm = jnp.take(assets.tri_nrm, flat_cls, axis=0)
    poses_f = poses.reshape(-1, 3, 4)
    ks_f = jnp.repeat(ks, m, axis=0)
    if assets.textured:
        from deepim_tpu.raster.textured import (
            pack_tri_params_uv, sample_texture_bilinear,
        )

        tex = assets.textures  # (C, Th, Tw, 3)
        th = tex.shape[1]
        h_all = tex.shape[0] * th
        tidx = (jnp.take(assets.tex_idx, flat_cls, axis=0)
                if assets.tex_idx is not None else flat_cls)
        tri_uv = jnp.take(assets.tri_uv, flat_cls, axis=0)  # (B*M, 6, F)
        # v' puts the sample row y = (1-v)*(Th-1) into band tidx of the
        # stacked texture (sampler convention: y = (1-v')*(H_all-1)).
        # Within-band taps stay in-band: at an integer band-edge y the +1
        # bilinear tap has zero weight, so adjacent textures never bleed.
        y_band = (tidx.astype(jnp.float32)[:, None, None] * th
                  + (1.0 - tri_uv[:, 1::2, :]) * (th - 1))
        tri_uv = tri_uv.at[:, 1::2, :].set(
            1.0 - y_band / max(h_all - 1, 1))
    cull_f = (jnp.take(assets.cull_dir, flat_cls, axis=0)
              if assets.cull_dir is not None
              else jnp.zeros_like(flat_cls, jnp.float32))
    if assets.textured:
        pack = jax.vmap(
            lambda tp, tu, tn, p, kk, cd: pack_tri_params_uv(
                tp, tu, tn, p, kk, lighting, 0.01, cd
            )
        )
        params, bbox, face_ok = pack(tri_pos, tri_uv, tri_nrm, poses_f,
                                     ks_f, cull_f)
    else:
        tri_col = jnp.take(assets.tri_col, flat_cls, axis=0)
        pack = jax.vmap(
            lambda tp, tc, tn, p, kk, cd: pack_tri_params(
                tp, tc, tn, p, kk, lighting, 0.01, cd
            )
        )
        params, bbox, face_ok = pack(tri_pos, tri_col, tri_nrm, poses_f,
                                     ks_f, cull_f)
    # (B*M, F, 24), (B*M, F, 4), (B*M, F)
    face_ok = face_ok & valid.reshape(-1)[:, None]
    f = params.shape[1]
    params = params.reshape(b, m * f, 24)
    bbox = bbox.reshape(b, m * f, 4)
    face_ok = face_ok.reshape(b, m * f)
    out, depth = _render_dispatch(params, bbox, face_ok, out_size,
                                  (32, 256), max_faces_per_tile, interpret,
                                  "auto")
    if assets.textured:
        from deepim_tpu.raster.textured import _map_batch_chunks

        stacked_tex = assets.textures.reshape(h_all, tex.shape[2], 3)
        # Chunked like render_batch_textured's deferred pass: the fused
        # bilinear taps' (B, H, W, 3)-scale temps are the multi-object
        # path's HBM peak too.
        albedo = _map_batch_chunks(
            lambda uu, vv: sample_texture_bilinear(stacked_tex, uu, vv),
            16, out[..., 0], out[..., 1])
        # background: interpolated intensity is 0 there, so rgb stays 0
        out = jnp.clip(albedo * out[..., 2:3], 0.0, 1.0)
    return out, depth


class RefineStepOutputs(NamedTuple):
    pose: jax.Array  # (B, 3, 4) updated pose
    k_zoom: jax.Array  # (B, 3, 3) crop intrinsics used this step
    aux: dict[str, Any]  # net outputs (flow/mask) when requested


class NetworkInputs(NamedTuple):
    x: jax.Array  # (B, H, W, 6+) assembled CNN input
    box: Any  # ZoomBox with (B,)-shaped fields
    k_zoom: jax.Array  # (B, 3, 3) crop intrinsics
    ren_rgb: jax.Array  # (B, H, W, 3) rendered crop
    ren_depth: jax.Array  # (B, H, W) rendered depth crop


def build_network_inputs(
    model,
    assets_b: RenderAssets,
    obs_rgb: jax.Array,  # (B, H, W, 3) full-frame observed image [0,1]
    pose: jax.Array,  # (B, 3, 4) current estimates
    k: jax.Array,  # (B, 3, 3) full-frame intrinsics
    out_size: tuple[int, int],
    renderer: str = "pallas",
    zoom_margin: float = 1.4,
    obs_mask: jax.Array | None = None,  # (B, H, W) for input_mask models
    obs_depth: jax.Array | None = None,  # (B, H, W) for input_depth models
) -> NetworkInputs:
    """Render→zoom→concat assembly of the CNN input, shared train/eval.

    ``train.compute_losses`` and :func:`refine_step` must feed the
    network IDENTICALLY — the input distribution the net trains on is
    the one it refines with — so both call this one helper.  A missing
    observed mask/depth falls back to the rendered silhouette/depth (the
    best available estimate; the reference feeds PoseCNN segmentations
    and recorded depth where we may have neither at test time).
    """
    with jax.named_scope("zoom_box"):
        box = jax.vmap(
            lambda p, kk, c: compute_zoom_box(p, kk, c, out_size, zoom_margin)
        )(pose, k, assets_b.corners)
        k_zoom = zoom_intrinsics(k, box)

    with jax.named_scope("render"):
        ren_rgb, ren_depth = render_crops(assets_b, pose, k_zoom, out_size,
                                          renderer)
    with jax.named_scope("zoom_obs"):
        obs_crop = zoom_image_batch(
            obs_rgb, box, out_size,
            precision=jax.lax.Precision.DEFAULT,  # 8-bit-origin RGB
        )

    extras = ()
    if getattr(model, "input_mask", False):
        # Reference 8-channel mode (observed + rendered masks appended).
        ren_mask = (ren_depth > 0).astype(jnp.float32)[..., None]
        if obs_mask is not None:
            obs_mask_in = zoom_image_batch(
                obs_mask[..., None].astype(jnp.float32), box, out_size,
                method="nearest",
            )
        else:
            obs_mask_in = ren_mask
        extras = (ren_mask, obs_mask_in)
    if getattr(model, "input_depth", False):
        # Reference INPUT_DEPTH mode (depth crops normalized by object z).
        z_src = pose[:, 2, 3]
        if obs_depth is not None:
            obs_depth_in = zoom_image_batch(
                obs_depth[..., None], box, out_size, method="nearest",
            )[..., 0]
        else:
            obs_depth_in = ren_depth
        extras = (*extras, normalize_depth(ren_depth, z_src),
                  normalize_depth(obs_depth_in, z_src))
    return NetworkInputs(network_input(obs_crop, ren_rgb, extras),
                         box, k_zoom, ren_rgb, ren_depth)


def refine_step(
    variables,
    model,
    assets_b: RenderAssets,
    obs_rgb: jax.Array,  # (B, H, W, 3) full-frame observed image [0,1]
    pose: jax.Array,  # (B, 3, 4) current estimates
    k: jax.Array,  # (B, 3, 3) full-frame intrinsics
    class_idx: jax.Array,  # (B,)
    out_size: tuple[int, int],
    renderer: str = "pallas",
    zoom_margin: float = 1.4,
    keep_aux: bool = False,
    obs_mask: jax.Array | None = None,  # (B, H, W) for input_mask models
    obs_depth: jax.Array | None = None,  # (B, H, W) for input_depth models
) -> RefineStepOutputs:
    """One render→zoom→CNN→compose update (all stages on-device)."""
    ni = build_network_inputs(model, assets_b, obs_rgb, pose, k, out_size,
                              renderer, zoom_margin, obs_mask=obs_mask,
                              obs_depth=obs_depth)
    k_zoom = ni.k_zoom
    with jax.named_scope("cnn"):
        # pose_only skips the FlowNetS decoder (train-time aux heads) —
        # ~40% of the CNN FLOPs the refine loop never consumes.
        out = model.apply(variables, ni.x, pose_only=not keep_aux)
    with jax.named_scope("compose"):
        quat = decode_rot(select_class(out["rot_raw"], class_idx),
                          model.rot_type)
        trans = select_class(out["trans"], class_idx)
        # Bound the per-iteration update: |vx|,|vy| <= 2000 crop px and
        # |vz| <= 4 (a 55x depth change).  A trained head predicts O(10 px,
        # 0.1) values so the clip never binds; it only stops a diverged
        # hypothesis from overflowing exp(-vz) -> z=0/inf -> NaN and
        # poisoning batch statistics on later iterations.
        trans = jnp.clip(trans, jnp.array([-2000.0, -2000.0, -4.0]),
                         jnp.array([2000.0, 2000.0, 4.0]))
        new_pose = apply_delta(pose, DeltaPose(quat, trans), k_zoom)
    aux = {kk: v for kk, v in out.items() if kk not in ("rot_raw", "trans")} \
        if keep_aux else {}
    return RefineStepOutputs(new_pose, k_zoom, aux)


@partial(
    jax.jit,
    static_argnames=("model", "num_iters", "out_size", "renderer",
                     "zoom_margin", "return_all", "coarse_iters",
                     "coarse_size"),
)
def refine_poses(
    variables,
    model,
    assets: RenderAssets,
    obs_rgb: jax.Array,  # (B, H, W, 3)
    init_pose: jax.Array,  # (B, 3, 4)
    k: jax.Array,  # (B, 3, 3)
    class_idx: jax.Array,  # (B,)
    num_iters: int = 4,
    out_size: tuple[int, int] = (480, 640),
    renderer: str = "pallas",
    zoom_margin: float = 1.4,
    return_all: bool = False,
    obs_mask: jax.Array | None = None,  # (B, H, W) for input_mask models
    obs_depth: jax.Array | None = None,  # (B, H, W) for input_depth models
    coarse_iters: int = 0,
    coarse_size: tuple[int, int] | None = None,
) -> jax.Array:
    """K-iteration refinement (reference ``cfg.TEST.test_iter=4``) -> (B, 3, 4).

    One compiled program: ``lax.scan`` over iterations, everything batched
    over the hypothesis axis B.  ``vmap``/sharding over B scales across
    chips (hypotheses are embarrassingly parallel).  With ``return_all``,
    returns every intermediate estimate (num_iters+1, B, 3, 4) — the
    reference's per-iteration eval tables need them.

    ``coarse_iters`` > 0 runs the FIRST that many iterations at
    ``coarse_size`` (default: half of ``out_size``) — a coarse-to-fine
    schedule.  Early iterations only correct gross pose error, so a
    quarter-cost render+CNN suffices; the final iterations polish at full
    resolution.  Requires ``model.head_grid`` to be set (one shared
    flatten head across resolutions).
    """
    assets_b = gather_class(assets, class_idx)

    def make_step(size, ab):
        def step(pose, _):
            outs = refine_step(
                variables, model, ab, obs_rgb, pose, k, class_idx,
                size, renderer, zoom_margin, obs_mask=obs_mask,
                obs_depth=obs_depth,
            )
            return outs.pose, outs.pose if return_all else None
        return step

    pose = init_pose
    trajs = [init_pose[None]]
    coarse_iters = min(coarse_iters, num_iters)
    if coarse_iters > 0:
        if (getattr(model, "pose_head", "flatten") == "flatten"
                and getattr(model, "head_grid", None) is None):
            raise ValueError(
                "coarse_iters > 0 needs one pose head shared across "
                "resolutions: build the model with head_grid="
                "bottleneck_grid(H, W) (a flatten head without it fails "
                "deep inside model.apply with a Dense shape mismatch)")
        c_size = coarse_size or (out_size[0] // 2, out_size[1] // 2)
        # Coarse iterations render the coarse LOD when the asset set
        # carries one (build_assets lod_faces): they only correct gross
        # pose error, so the ~1k-face level is visually sufficient and
        # roughly halves the dense-mesh raster cost per coarse iteration.
        ab_coarse = (gather_class(assets.lod, class_idx)
                     if assets.lod is not None else assets_b)
        pose, traj_c = jax.lax.scan(make_step(c_size, ab_coarse), pose, None,
                                    length=coarse_iters)
        if return_all:
            trajs.append(traj_c)
    if num_iters > coarse_iters:
        pose, traj_f = jax.lax.scan(make_step(out_size, assets_b), pose, None,
                                    length=num_iters - coarse_iters)
        if return_all:
            trajs.append(traj_f)
    if return_all:
        return jnp.concatenate(trajs, axis=0)
    return pose
