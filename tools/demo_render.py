"""Visual demo: renders + overlays + flow GT colorwheel -> PNG montage.

Parity with the reference's module-level ``__main__`` demos
(``lib/render_glumpy/render_py.py`` renders a model at a known pose and
saves the image; flow checks use a colorwheel — SURVEY.md §4 item 1).

Usage: python tools/demo_render.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_dir: str = "output/demo") -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
    from deepim_tpu.ops.flow_gt import calc_flow
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.raster.mesh import (
        box_mesh, cylinder_mesh, icosphere_mesh, torus_mesh,
    )
    from deepim_tpu.refine import build_assets, gather_class
    from deepim_tpu.refine.refiner import render_crops, render_scene
    from deepim_tpu.utils import (
        flow_to_rgb, overlay_render, save_image, side_by_side,
    )

    os.makedirs(out_dir, exist_ok=True)
    renderer = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    assets = build_assets(
        [box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05, subdivisions=3),
         cylinder_mesh(), torus_mesh()],
        num_points=64,
    )
    k = make_intrinsics(572.4, 573.6, 325.3, 242.0)
    key = jax.random.PRNGKey(0)
    poses = sample_poses_in_frustum(key, 4, k, (480, 640),
                                    z_range=(0.6, 0.8))
    cls = jnp.arange(4)
    ks = jnp.tile(k[None], (4, 1, 1))
    ab = gather_class(assets, cls)
    rgb, depth = render_crops(ab, poses, ks, (480, 640), renderer)
    montage = side_by_side(*[
        (np.clip(np.asarray(rgb[i]), 0, 1) * 255).astype(np.uint8)
        for i in range(4)
    ])
    save_image(os.path.join(out_dir, "objects.png"), montage)

    # overlay: noisy pose render over the "observed" GT render
    noisy = perturb_poses(jax.random.PRNGKey(1), poses)
    rgb_n, depth_n = render_crops(ab, noisy, ks, (480, 640), renderer)
    ov = overlay_render(np.asarray(rgb[0]), np.asarray(rgb_n[0]),
                        np.asarray(depth_n[0]))
    save_image(os.path.join(out_dir, "overlay_init_vs_observed.png"), ov)

    # flow GT colorwheel between the two poses
    flow, valid = calc_flow(depth_n[0], noisy[0], poses[0], k, depth[0])
    save_image(os.path.join(out_dir, "flow_gt.png"),
               flow_to_rgb(np.asarray(flow)))

    # multi-object scene
    srgb, _ = render_scene(
        assets, cls[None], poses[None], jnp.ones((1, 4), bool), ks[:1],
        (480, 640), interpret=renderer == "xla",
    )
    save_image(os.path.join(out_dir, "scene.png"),
               (np.clip(np.asarray(srgb[0]), 0, 1) * 255).astype(np.uint8))

    # per-pixel texture sampling (deferred UV pass) on a checkered box
    from deepim_tpu.raster.mesh import Mesh, compute_vertex_normals
    from deepim_tpu.raster.textured import (
        render_batch_textured, tri_uv_corner_major,
    )

    bm = box_mesh((0.1, 0.1, 0.1))
    # box UVs: unwrap by vertex xy (coarse but demonstrative)
    uv = (bm.vertices[:, :2] / 0.1 + 1.0) / 2.0
    tm = Mesh(bm.vertices, bm.faces, bm.colors,
              compute_vertex_normals(bm.vertices, bm.faces),
              uv=uv.astype(np.float32))
    checker = ((np.indices((64, 64)).sum(0) // 8) % 2).astype(np.float32)
    tex = np.stack([checker, 1 - checker, np.full_like(checker, 0.5)], -1)
    trgb, _ = render_batch_textured(
        jnp.asarray(tm.vertices[tm.faces].reshape(-1, 9).T)[None],
        jnp.asarray(tri_uv_corner_major(tm))[None],
        jnp.asarray(tm.normals[tm.faces].reshape(-1, 9).T)[None],
        poses[:1], ks[:1], (480, 640), jnp.asarray(tex),
        interpret=renderer == "xla",
    )
    save_image(os.path.join(out_dir, "textured.png"),
               (np.clip(np.asarray(trgb[0]), 0, 1) * 255).astype(np.uint8))
    print(f"wrote demo images to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
