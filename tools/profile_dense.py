"""Per-stage timing of the refine loop in the DENSE-mesh regime (F=4096).

Round-4 honesty table: the 817 poses/s headline runs <=1,280-face
procedural meshes, but decimated real assets (dataset.max_faces default
4,096) run at 183 poses/s.  This tool locates where the extra time goes
at the real-asset face budget: pack, binning sort, raster kernel, CNN,
and the full loop — at crop intrinsics (the refine loop's regime: the
object fills the frame), B and F configurable.

Usage: ``[B=128] [F=4096] [COARSE=2] python tools/profile_dense.py``
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
from deepim_tpu.models import DeepIMFlowNet, bottleneck_grid
from deepim_tpu.ops.zoom import compute_zoom_box, zoom_intrinsics
from deepim_tpu.raster import raster_pallas
from deepim_tpu.raster.camera import make_intrinsics
from deepim_tpu.raster.mesh import (
    cylinder_mesh, decimate_mesh, icosphere_mesh, torus_mesh,
)
from deepim_tpu.raster.raster_xla import FLAT_LIGHTING
from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.refine import build_assets, refine_poses
from deepim_tpu.refine.refiner import gather_class, render_crops

B = int(os.environ.get("B", "128"))
F = int(os.environ.get("F", "4096"))
COARSE = int(os.environ.get("COARSE", "2"))
LOD = int(os.environ.get("LOD", "0"))  # coarse-LOD budget, 0 = off
H, W = 480, 640


def timeit(fn, *args, n=10, warmup=2):
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
    renderer = "pallas" if dev.platform == "tpu" else "xla"
    print(f"platform={dev.platform} B={B} F={F}")

    dense = [
        icosphere_mesh(0.05, subdivisions=5),
        torus_mesh(n_major=96, n_minor=48),
        cylinder_mesh(segments=256, rows=16),
        icosphere_mesh(0.07, subdivisions=5),
    ]
    meshes = [decimate_mesh(m, F) for m in dense]
    assets = build_assets(
        meshes, sym_transforms=[None, rot_z_syms(8), None, None],
        num_points=3000, lod_faces=LOD or None,
    )
    f_budget = assets.tri_pos.shape[2]
    print(f"face budget={f_budget} "
          f"cull={[float(c) for c in assets.cull_dir]}")

    model = DeepIMFlowNet(num_classes=assets.num_classes,
                          head_grid=bottleneck_grid(H, W))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)))
    k_cam = make_intrinsics(572.4114, 573.5704, 325.2611, 242.049)
    key = jax.random.PRNGKey(7)
    kp, kn, kc, ko = jax.random.split(key, 4)
    pose = perturb_poses(kn, sample_poses_in_frustum(kp, B, k_cam, (H, W)))
    cls = jax.random.randint(kc, (B,), 0, assets.num_classes)
    obs = jax.random.uniform(ko, (B, H, W, 3))
    ks = jnp.tile(k_cam[None], (B, 1, 1))
    assets_b = gather_class(assets, cls)

    # Crop intrinsics — the regime the refine loop renders in.
    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, (H, W), 1.4)
    )(pose, ks, assets_b.corners)
    k_zoom = zoom_intrinsics(ks, box)

    # --- full loop -------------------------------------------------------
    def full():
        out = refine_poses(variables, model, assets, obs, pose, ks, cls,
                           num_iters=4, out_size=(H, W), renderer=renderer,
                           coarse_iters=COARSE)
        return float(out[0, 0, 0])

    t_full = timeit(full)
    print(f"full K=4 loop (coarse={COARSE}): {t_full:8.2f} ms "
          f"({B / (t_full / 1e3):.0f} poses/s)")

    # --- render at full and half res ------------------------------------
    for size in ((H, W), (H // 2, W // 2)):
        kz = k_zoom if size == (H, W) else k_zoom * jnp.array(
            [[0.5], [0.5], [1.0]])

        @jax.jit
        def render_only(p, kk):
            rgb, d = render_crops(assets_b, p, kk, size, renderer)
            return rgb.sum() + d.sum()

        t_r = timeit(render_only, pose, kz)
        print(f"render {size}: {t_r:8.2f} ms")

    # --- CNN forward -----------------------------------------------------
    for size in ((H, W), (H // 2, W // 2)):
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, *size, 6))

        @jax.jit
        def cnn_only(v, xx):
            out = model.apply(v, xx, pose_only=True)
            return out["rot_raw"].sum() + out["trans"].sum()

        t_c = timeit(cnn_only, variables, x)
        print(f"cnn {size}:    {t_c:8.2f} ms")

    if renderer != "pallas":
        return

    # --- raster stage breakdown at full res ------------------------------
    @jax.jit
    def pack(p, kk):
        return jax.vmap(
            lambda tp, tc, tn, pp, kkk, cd: raster_pallas.pack_tri_params(
                tp, tc, tn, pp, kkk, FLAT_LIGHTING, 0.01, cd
            )
        )(assets_b.tri_pos, assets_b.tri_col, assets_b.tri_nrm, p, kk,
          assets_b.cull_dir)

    t_pack = timeit(pack, pose, k_zoom)
    params, bbox, face_ok = pack(pose, k_zoom)
    print(f"pack:          {t_pack:8.2f} ms  "
          f"(valid faces/sample mean={face_ok.sum(1).mean():.0f})")

    @jax.jit
    def bin_only(bb, ok):
        return jax.vmap(
            lambda b2, o2: raster_pallas.bin_faces_packed(
                b2, o2, (H, W), (8, 128), 6, 2, 120
            )
        )(bb, ok)

    t_bin = timeit(bin_only, bbox, face_ok)
    ids, starts, glob = bin_only(bbox, face_ok)
    spans = starts[:, -1]
    print(f"bin cols (no compaction): {t_bin:8.2f} ms  "
          f"(incidences/sample mean={spans.mean():.0f} max={spans.max()}; "
          f"glob starts tail={glob[:, W // 128].mean():.1f})")

    @jax.jit
    def cols_launch(p2, bb, ok):
        # opt-in compaction (default is off; this row keeps the A/B alive)
        return raster_pallas._render_from_params_cols(p2, bb, ok, (H, W),
                                                      False,
                                                      compact_frac=0.625)

    t_cols = timeit(cols_launch, params, bbox, face_ok)
    print(f"bin+kernel cols (compact 0.625): {t_cols:8.2f} ms")

    @jax.jit
    def cols_nocompact(p2, bb, ok):
        return raster_pallas._render_from_params_cols(
            p2, bb, ok, (H, W), False, compact_frac=0.0)

    t_nc = timeit(cols_nocompact, params, bbox, face_ok)
    print(f"bin+kernel cols (no compact): {t_nc:8.2f} ms")

    # sorted-kernel comparison at this budget
    @jax.jit
    def sort_launch(p2, bb, ok):
        return raster_pallas._render_from_params_sorted(
            p2, bb, ok, (H, W), (32, 256), False, sy_span=8, sx_span=3)

    t_sort = timeit(sort_launch, params, bbox, face_ok)
    print(f"bin+kernel sorted(8,3):   {t_sort:8.2f} ms")


if __name__ == "__main__":
    main()
