"""Micro-profile of the Pallas raster path on the real TPU.

Times each stage of ``render_batch_tri`` separately (pack, sort-bin,
kernel) to locate the bottleneck flagged in PARITY.md (raster ~43 ms at
B=64, 480x640).  Run directly: ``python tools/profile_raster.py``.
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
from deepim_tpu.raster.camera import make_intrinsics
from deepim_tpu.raster.mesh import (
    box_mesh, cylinder_mesh, icosphere_mesh, torus_mesh,
)
from deepim_tpu.raster import raster_pallas
from deepim_tpu.raster.raster_xla import FLAT_LIGHTING
from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.refine import build_assets

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
    F = assets.tri_pos.shape[2]
    print(f"faces budget F={F}")

    k_cam = make_intrinsics(572.4114, 573.5704, 325.2611, 242.049)
    key = jax.random.PRNGKey(7)
    kp, kn, kc = jax.random.split(key, 3)
    pose_gt = sample_poses_in_frustum(kp, B, k_cam, (H, W))
    poses = perturb_poses(kn, pose_gt)
    cls = jax.random.randint(kc, (B,), 0, assets.num_classes)
    tri_pos = jnp.take(assets.tri_pos, cls, axis=0)
    tri_col = jnp.take(assets.tri_col, cls, axis=0)
    tri_nrm = jnp.take(assets.tri_nrm, cls, axis=0)
    ks = jnp.broadcast_to(k_cam, (B, 3, 3))

    # --- stage 1: pack ---------------------------------------------------
    @jax.jit
    def pack(tp, tc, tn, p, kk):
        return jax.vmap(
            lambda a, b, c, d, e: raster_pallas.pack_tri_params(
                a, b, c, d, e, FLAT_LIGHTING, 0.01
            )
        )(tp, tc, tn, p, kk)

    t_pack = timeit(pack, tri_pos, tri_col, tri_nrm, poses, ks)
    params, bbox, face_ok = pack(tri_pos, tri_col, tri_nrm, poses, ks)

    # --- stage 2: sort-binning -------------------------------------------
    @jax.jit
    def binsort(bb, ok):
        return jax.vmap(
            lambda b2, o2: raster_pallas.bin_faces_sorted(
                b2, o2, (H, W), (32, 256)
            )
        )(bb, ok)

    t_bin = timeit(binsort, bbox, face_ok)
    vals, starts, glob = binsort(bbox, face_ok)
    counts = starts[:, 1:] - starts[:, :-1]
    print(f"per-tile face counts: mean={counts.mean():.1f} "
          f"max={counts.max()} total={counts.sum(axis=1).mean():.0f}/sample "
          f"global={glob[:, 0].mean():.1f}")

    # --- stage 3: kernel only (from packed params) ------------------------
    @functools.partial(jax.jit, static_argnames=())
    def kernel_only(p2, bb, ok):
        return raster_pallas._render_from_params_sorted(
            p2, bb, ok, (H, W), (32, 256), False
        )

    t_full_sorted = timeit(kernel_only, params, bbox, face_ok)

    # --- column kernel (packed bin + one-DMA-per-column raster) -----------
    @jax.jit
    def kernel_cols(p2, bb, ok):
        return raster_pallas._render_from_params_cols(p2, bb, ok, (H, W), False)

    t_full_cols = timeit(kernel_cols, params, bbox, face_ok)

    # --- full path --------------------------------------------------------
    rb = functools.partial(
        raster_pallas.render_batch_tri, image_size=(H, W), binning="sort"
    )
    t_full = timeit(rb, tri_pos, tri_col, tri_nrm, poses, ks)
    rbc = functools.partial(
        raster_pallas.render_batch_tri, image_size=(H, W), binning="cols"
    )
    t_full_c = timeit(rbc, tri_pos, tri_col, tri_nrm, poses, ks)

    print(f"pack               {t_pack:8.2f} ms")
    print(f"bin(sort)          {t_bin:8.2f} ms")
    print(f"bin+kernel sorted  {t_full_sorted:8.2f} ms")
    print(f"bin+kernel cols    {t_full_cols:8.2f} ms")
    print(f"full sorted        {t_full:8.2f} ms   ({B / (t_full / 1e3):.0f} renders/s)")
    print(f"full cols          {t_full_c:8.2f} ms   ({B / (t_full_c / 1e3):.0f} renders/s)")


if __name__ == "__main__":
    main()
