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
from deepim_tpu.models.flownet import decode_rot, network_input, select_class
from deepim_tpu.ops.zoom import compute_zoom_box, zoom_image, zoom_intrinsics
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

    @property
    def num_classes(self) -> int:
        return self.vertices.shape[0]


def build_assets(meshes, sym_transforms=None, num_points: int = 3000,
                 max_vertices: int | None = None, max_faces: int | None = None,
                 max_syms: int | None = None) -> RenderAssets:
    """Stack host Mesh objects into a RenderAssets (pads to shared budgets)."""
    import numpy as np

    from deepim_tpu.geometry.symmetry import sym_set
    from deepim_tpu.raster.mesh import pad_mesh, sample_points

    sym_transforms = sym_transforms or [None] * len(meshes)
    mv = max_vertices or max(m.num_vertices for m in meshes)
    mf = max_faces or max(m.num_faces for m in meshes)
    ms = max_syms or max(
        (1 if s is None else s.shape[0]) for s in sym_transforms
    )
    padded = [pad_mesh(m, mv + 1, mf) for m in meshes]  # +1 pad vertex
    pts = [sample_points(m, num_points) for m in meshes]
    corners = [
        np.stack(np.meshgrid(*zip(m.vertices.min(0), m.vertices.max(0)),
                             indexing="ij"), -1).reshape(8, 3)
        for m in meshes
    ]
    return RenderAssets(
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
    )


def gather_class(assets: RenderAssets, class_idx: jax.Array) -> RenderAssets:
    """Per-sample asset views: class axis C -> batch axis B via gather."""
    idx = class_idx.astype(jnp.int32)
    return RenderAssets(*(jnp.take(a, idx, axis=0) for a in assets))


def render_crops(
    assets_b: RenderAssets,  # batch-gathered (leading dim B)
    poses: jax.Array,  # (B, 3, 4)
    ks: jax.Array,  # (B, 3, 3) crop intrinsics
    out_size: tuple[int, int],
    renderer: str = "pallas",
    max_faces_per_tile: int = 512,
    lighting: raster_xla.Lighting = raster_xla.FLAT_LIGHTING,
) -> tuple[jax.Array, jax.Array]:
    """Rasterize each hypothesis directly at crop resolution -> rgb, depth."""
    if renderer in ("pallas", "pallas_interpret"):
        return raster_pallas.render_batch(
            assets_b.vertices, assets_b.faces, assets_b.colors,
            assets_b.normals, poses, ks, out_size, lighting=lighting,
            max_faces_per_tile=max_faces_per_tile,
            interpret=renderer == "pallas_interpret",
        )
    if renderer == "xla":
        return jax.vmap(
            lambda v, f, c, n, p, kk: raster_xla.render_mesh(
                v, f, c, n, p, kk, out_size, lighting=lighting
            )
        )(assets_b.vertices, assets_b.faces, assets_b.colors,
          assets_b.normals, poses, ks)
    raise ValueError(renderer)


class RefineStepOutputs(NamedTuple):
    pose: jax.Array  # (B, 3, 4) updated pose
    k_zoom: jax.Array  # (B, 3, 3) crop intrinsics used this step
    aux: dict[str, Any]  # net outputs (flow/mask) when requested


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
) -> RefineStepOutputs:
    """One render→zoom→CNN→compose update (all stages on-device)."""
    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, out_size, zoom_margin)
    )(pose, k, assets_b.corners)
    k_zoom = zoom_intrinsics(k, box)

    ren_rgb, _ = render_crops(assets_b, pose, k_zoom, out_size, renderer)
    obs_crop = jax.vmap(
        lambda im, x0, y0, sx, sy: zoom_image(
            im, type(box)(x0, y0, sx, sy), out_size
        )
    )(obs_rgb, box.x0, box.y0, box.sx, box.sy)

    out = model.apply(variables, network_input(obs_crop, ren_rgb))
    quat = decode_rot(select_class(out["rot_raw"], class_idx), model.rot_type)
    trans = select_class(out["trans"], class_idx)
    new_pose = apply_delta(pose, DeltaPose(quat, trans), k_zoom)
    aux = {kk: v for kk, v in out.items() if kk not in ("rot_raw", "trans")} \
        if keep_aux else {}
    return RefineStepOutputs(new_pose, k_zoom, aux)


@partial(
    jax.jit,
    static_argnames=("model", "num_iters", "out_size", "renderer",
                     "zoom_margin"),
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
) -> jax.Array:
    """K-iteration refinement (reference ``cfg.TEST.test_iter=4``) -> (B, 3, 4).

    One compiled program: ``lax.scan`` over iterations, everything batched
    over the hypothesis axis B.  ``vmap``/sharding over B scales across
    chips (hypotheses are embarrassingly parallel).
    """
    assets_b = gather_class(assets, class_idx)

    def step(pose, _):
        outs = refine_step(
            variables, model, assets_b, obs_rgb, pose, k, class_idx,
            out_size, renderer, zoom_margin,
        )
        return outs.pose, None

    pose, _ = jax.lax.scan(step, init_pose, None, length=num_iters)
    return pose
