"""Per-stage timing of the refine loop (device wall-clock, coarse).

Times, at the bench configuration (B=64, 480x640, K=4):
  - the full jitted refine loop (poses/s headline),
  - the CNN forward alone (encoder-only, since aux heads are DCE'd in eval),
  - the rasterizer alone,
  - the observed-image zoom alone.

Usage: ``python tools/profile_refine.py [B]``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()

import jax
import jax.numpy as jnp

from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.models import DeepIMFlowNet
from deepim_tpu.ops.zoom import compute_zoom_box, zoom_image, zoom_intrinsics
from deepim_tpu.raster.camera import make_intrinsics
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
from deepim_tpu.refine import build_assets, refine_poses
from deepim_tpu.refine.refiner import gather_class, render_crops


def timeit(fn, reps=5):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hw = (480, 640)
    renderer = "pallas" if jax.devices()[0].platform == "tpu" else "xla"

    assets = build_assets(
        [box_mesh((0.08, 0.1, 0.06)), icosphere_mesh(0.05, subdivisions=3)],
        num_points=512,
    )
    model = DeepIMFlowNet(num_classes=assets.num_classes)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 6)))
    k_cam = make_intrinsics(572.4114, 573.5704, 325.2611, 242.049)
    key = jax.random.PRNGKey(7)
    kp, kn, kc, ko = jax.random.split(key, 4)
    pose = perturb_poses(kn, sample_poses_in_frustum(kp, b, k_cam, hw))
    cls = jax.random.randint(kc, (b,), 0, assets.num_classes)
    obs = jax.random.uniform(ko, (b, *hw, 3))
    ks = jnp.tile(k_cam[None], (b, 1, 1))
    assets_b = gather_class(assets, cls)

    # full K=4 loop
    def full():
        out = refine_poses(variables, model, assets, obs, pose, ks, cls,
                           num_iters=4, out_size=hw, renderer=renderer)
        return float(out[0, 0, 0])

    # CNN forward only (pose outputs -> aux heads DCE'd, like eval)
    x = jax.random.uniform(jax.random.PRNGKey(1), (b, *hw, 6))

    @jax.jit
    def cnn_only(variables, x):
        out = model.apply(variables, x)
        return out["rot_raw"].sum() + out["trans"].sum()

    # raster only
    box = jax.vmap(
        lambda p, kk, c: compute_zoom_box(p, kk, c, hw, 1.4)
    )(pose, ks, assets_b.corners)
    k_zoom = zoom_intrinsics(ks, box)

    @jax.jit
    def raster_only(pose, k_zoom):
        rgb, depth = render_crops(assets_b, pose, k_zoom, hw, renderer)
        return rgb.sum() + depth.sum()

    @jax.jit
    def zoom_only(obs):
        crop = jax.vmap(
            lambda im, x0, y0, sx, sy: zoom_image(
                im, type(box)(x0, y0, sx, sy), hw,
                precision=jax.lax.Precision.DEFAULT,
            )
        )(obs, box.x0, box.y0, box.sx, box.sy)
        return crop.sum()

    t_full = timeit(lambda: full())
    t_cnn = timeit(lambda: float(cnn_only(variables, x)))
    t_raster = timeit(lambda: float(raster_only(pose, k_zoom)))
    t_zoom = timeit(lambda: float(zoom_only(obs)))
    print(f"B={b} renderer={renderer}")
    print(f"full K=4 loop : {t_full * 1e3:8.2f} ms  ({b / t_full:8.1f} poses/s)")
    print(f"per iteration : {t_full / 4 * 1e3:8.2f} ms")
    print(f"cnn forward   : {t_cnn * 1e3:8.2f} ms")
    print(f"raster        : {t_raster * 1e3:8.2f} ms")
    print(f"zoom observed : {t_zoom * 1e3:8.2f} ms")
    print(f"unaccounted/it: {(t_full / 4 - t_cnn - t_raster - t_zoom) * 1e3:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
