"""Raster micro-profile under refine-loop conditions (crop intrinsics).

In the refine loop the render happens at zoom-crop intrinsics — the object
fills the whole frame, so tiles are crowded (vs the sparse full-frame case
``profile_raster.py`` measures).  Compares the sorted and column kernels in
that regime to set the dispatcher's crossover correctly.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()

import jax
import jax.numpy as jnp

from deepim_tpu.geometry.symmetry import rot_z_syms
from deepim_tpu.ops.zoom import compute_zoom_box, zoom_intrinsics
from deepim_tpu.raster.camera import make_intrinsics
from deepim_tpu.raster.mesh import (
    box_mesh, cylinder_mesh, icosphere_mesh, torus_mesh,
)
from deepim_tpu.raster import raster_pallas
from deepim_tpu.raster.raster_xla import FLAT_LIGHTING
from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.refine import build_assets, gather_class

B = int(os.environ.get("B", "64"))
H, W = 480, 640


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")
    meshes = [
        box_mesh((0.08, 0.1, 0.06)),
        icosphere_mesh(0.05, subdivisions=3),
        cylinder_mesh(),
        torus_mesh(),
    ]
    assets = build_assets(
        meshes, sym_transforms=[rot_z_syms(2), None, None, rot_z_syms(8)],
        num_points=3000,
    )
    f = assets.tri_pos.shape[2]
    k_cam = make_intrinsics(572.4114, 573.5704, 325.2611, 242.049)
    key = jax.random.PRNGKey(7)
    kp, kn, kc = jax.random.split(key, 3)
    pose_gt = sample_poses_in_frustum(kp, B, k_cam, (H, W))
    poses = perturb_poses(kn, pose_gt)
    cls = jax.random.randint(kc, (B,), 0, assets.num_classes)
    assets_b = gather_class(assets, cls)
    ks = jnp.broadcast_to(k_cam, (B, 3, 3))

    # refine-loop intrinsics: zoom crop filling the full frame
    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, (H, W), 1.4)
    )(poses, ks, assets_b.corners)
    k_zoom = zoom_intrinsics(ks, box)

    @jax.jit
    def pack(tp, tc, tn, p, kk):
        return jax.vmap(
            lambda a, b, c, d, e: raster_pallas.pack_tri_params(
                a, b, c, d, e, FLAT_LIGHTING, 0.01
            )
        )(tp, tc, tn, p, kk)

    params, bbox, face_ok = pack(
        assets_b.tri_pos, assets_b.tri_col, assets_b.tri_nrm, poses, k_zoom
    )
    vals, starts, glob = jax.jit(jax.vmap(
        lambda b2, o2: raster_pallas.bin_faces_sorted(b2, o2, (H, W), (32, 256))
    ))(bbox, face_ok)
    counts = starts[:, 1:] - starts[:, :-1]
    print(f"F={f} zoomed per-tile face counts: mean={counts.mean():.1f} "
          f"max={counts.max()} total={counts.sum(axis=1).mean():.0f}/sample "
          f"global={glob[:, 0].mean():.1f}")

    for name, fn in [
        ("sorted", functools.partial(
            raster_pallas._render_from_params_sorted,
            image_size=(H, W), tile=(32, 256), interpret=False)),
        ("cols", functools.partial(
            raster_pallas._render_from_params_cols,
            image_size=(H, W), interpret=False)),
    ]:
        jf = jax.jit(lambda p2, bb, ok, fn=fn: fn(p2, bb, ok))
        t = timeit(jf, params, bbox, face_ok)
        print(f"zoomed kernel {name:8s} {t:8.2f} ms ({B / (t / 1e3):.0f} renders/s)")

    for name, binning in [("sort", "sort"), ("cols", "cols"), ("auto", "auto")]:
        rb = functools.partial(
            raster_pallas.render_batch_tri, image_size=(H, W), binning=binning
        )
        t = timeit(rb, assets_b.tri_pos, assets_b.tri_col, assets_b.tri_nrm,
                   poses, k_zoom)
        print(f"zoomed full {name:8s} {t:8.2f} ms ({B / (t / 1e3):.0f} renders/s)")


if __name__ == "__main__":
    main()
