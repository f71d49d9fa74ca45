"""Capture an xprof trace of the K=4 refine loop on the current device.

Usage: ``python tools/trace_refine.py [logdir]`` (default /tmp/xprof_refine).
Open with TensorBoard's profile plugin / xprof.  The refine stages show up
as named regions (zoom_box / render / zoom_obs / cnn / compose) via
``jax.named_scope`` annotations in ``deepim_tpu.refine.refiner``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()

import jax
import jax.numpy as jnp

from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
from deepim_tpu.models import DeepIMFlowNet
from deepim_tpu.raster.camera import make_intrinsics
from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh
from deepim_tpu.refine import build_assets, refine_poses
from deepim_tpu.utils.profiling import trace


def main() -> int:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_refine"
    b, hw = int(os.environ.get("B", "64")), (480, 640)
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
    init = perturb_poses(kn, sample_poses_in_frustum(kp, b, k_cam, hw))
    cls = jax.random.randint(kc, (b,), 0, assets.num_classes)
    obs = jax.random.uniform(ko, (b, *hw, 3))
    ks = jnp.tile(k_cam[None], (b, 1, 1))

    def run():
        out = refine_poses(variables, model, assets, obs, init, ks, cls,
                           num_iters=4, out_size=hw, renderer=renderer)
        return float(out[0, 0, 0])  # hard sync

    run()  # compile outside the trace
    with trace(logdir):
        for _ in range(3):
            run()
    print(f"trace written to {logdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
