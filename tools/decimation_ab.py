"""Is decimated-mesh RENDERING accuracy-neutral?  (round-3 VERDICT #4)

Real scanned meshes (YCB: 100k+ faces) are decimated to
``dataset.max_faces`` (default 4096) before they reach the rasterizer;
the pose-error METRIC always uses points sampled from the full-res mesh.
This tool measures what the render-side decimation costs in accuracy:
observations are rendered from FULL-resolution meshes, refinement runs
with assets decimated to each face budget, and both are evaluated with
the same full-mesh metric points.

    python tools/decimation_ab.py --cfg experiments/cfgs/<exp>.yaml \
        [--budgets 1024,4096,0] [--samples 2048]

Budget 0 = no decimation (the full-res reference row).  Requires a
trained checkpoint for the config (the refiner must actually move poses
for the delta to mean anything).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="render-side decimation accuracy A/B")
    p.add_argument("--cfg", required=True)
    p.add_argument("--budgets", default="1024,4096,0",
                   help="comma list of face budgets (0 = full resolution)")
    p.add_argument("--samples", type=int, default=2048)
    p.add_argument("--subdiv", type=int, default=5,
                   help="icosphere subdivisions for the dense stand-in "
                        "meshes (5 -> ~20k faces, the scanned-mesh regime)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="override cfg.test.batch_size (CPU smoke)")
    p.add_argument("--lod-faces", type=int, default=0,
                   help="also build the coarse LOD level at this budget "
                        "for every budget row (validates the product "
                        "default dataset.lod_faces: coarse iterations "
                        "render the LOD level)")
    p.add_argument("--coarse-iters", type=int, default=-1,
                   help="override cfg.test.coarse_iters (-1 = config)")
    p.add_argument("--results-out", default="",
                   help="write the table to this JSON (committed "
                        "results/ tree)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepim_tpu.config import update_config
    from deepim_tpu.data.synthetic import synthetic_batch
    from deepim_tpu.eval import evaluate_poses
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.raster.mesh import (
        cylinder_mesh, decimate_mesh, icosphere_mesh, torus_mesh,
    )
    from deepim_tpu.refine import build_assets, refine_poses
    from deepim_tpu.train import init_state, make_model
    from deepim_tpu.train.checkpoint import latest_step, restore_checkpoint

    cfg = update_config(args.cfg)
    # Dense stand-ins for scanned assets (~10-20k faces each).  The
    # checkpoint's class count must match the config's objects; reuse its
    # class slots with same-symmetry dense shapes.
    dense = [
        icosphere_mesh(0.06, subdivisions=args.subdiv),
        icosphere_mesh(0.05, subdivisions=args.subdiv),
        torus_mesh(n_major=96, n_minor=48),
        cylinder_mesh(segments=256, rows=16),
    ][: len(cfg.dataset.objects)]
    while len(dense) < len(cfg.dataset.objects):
        dense.append(icosphere_mesh(0.05 + 0.01 * len(dense),
                                    subdivisions=args.subdiv))
    print("dense meshes:",
          [int(np.asarray(m.faces).shape[0]) for m in dense])

    full_assets = build_assets(dense, num_points=cfg.dataset.num_points)
    model = make_model(cfg, len(cfg.dataset.objects), inference=True)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(cfg.output_dir, cfg.experiment, "checkpoints")
    if latest_step(ckpt_dir) is None:
        print("WARNING: no checkpoint — identity refiner", file=sys.stderr)
    else:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded checkpoint step {int(state.step)}")

    d = cfg.dataset
    k_cam = make_intrinsics(d.fx, d.fy, d.cx, d.cy)
    image_size = (d.image_height, d.image_width)
    out_size = (cfg.network.input_height, cfg.network.input_width)
    renderer = cfg.test.renderer if jax.devices()[0].platform == "tpu" \
        else "xla"
    bs = args.batch_size or cfg.test.batch_size
    n = max(bs, (args.samples // bs) * bs)
    names = [f"dense_{i}" for i in range(len(dense))]
    sym = [False] * len(dense)

    # Observations: rendered ONCE from the full-res meshes.
    obs_batches = []
    for i in range(n // bs):
        b = synthetic_batch(
            jax.random.PRNGKey(52000 + i), full_assets, bs, k_cam,
            image_size, rot_noise_deg=cfg.train.rot_noise_deg,
            rot_max_deg=cfg.train.rot_noise_max_deg,
            trans_noise=cfg.train.trans_noise,
            trans_max=cfg.train.trans_noise_max, renderer=renderer,
        )
        obs_batches.append({kk: np.asarray(v) for kk, v in b.items()
                            if kk in ("obs_rgb", "pose_src", "pose_tgt",
                                      "class_idx")})

    coarse_iters = (args.coarse_iters if args.coarse_iters >= 0
                    else cfg.test.coarse_iters)
    rows = []
    header = f"{'budget':>8} {'faces':>7} {'add(-s)':>9} {'5d5cm':>7} " \
             f"{'proj2d':>7} {'auc':>7} {'mean_rot':>9}"
    print(header)
    print("-" * len(header))
    for budget in [int(x) for x in args.budgets.split(",")]:
        if budget:
            meshes = [decimate_mesh(m, budget) for m in dense]
        else:
            meshes = dense
        assets_b = build_assets(meshes, num_points=d.num_points,
                                lod_faces=args.lod_faces or None)
        # metric points from the FULL mesh in every row (pose errors must
        # be comparable across budgets)
        assets_b = assets_b._replace(points=full_assets.points,
                                     diameters=full_assets.diameters)
        est_all, gt_all, cls_all = [], [], []
        for b in obs_batches:
            ks = jnp.tile(k_cam[None], (bs, 1, 1))
            est = refine_poses(
                state.params, model, assets_b, jnp.asarray(b["obs_rgb"]),
                jnp.asarray(b["pose_src"]), ks,
                jnp.asarray(b["class_idx"]),
                num_iters=cfg.test.test_iter, out_size=out_size,
                renderer=renderer, coarse_iters=coarse_iters,
            )
            est_all.append(np.asarray(est))
            gt_all.append(b["pose_tgt"])
            cls_all.append(b["class_idx"])
        est = np.concatenate(est_all)
        gt = np.concatenate(gt_all)
        cls = np.concatenate(cls_all)
        ks_np = np.tile(np.asarray(k_cam)[None], (est.shape[0], 1, 1))
        res = evaluate_poses(full_assets, names, sym, est, gt, cls, ks_np)
        m = res["mean"]
        faces = int(np.asarray(meshes[0].faces).shape[0])
        print(f"{budget or 'full':>8} {faces:>7} "
              f"{m['add(-s)_0.1d']:>9.2f} {m['5deg_5cm']:>7.2f} "
              f"{m['proj2d_5px']:>7.2f} {m['auc_add(-s)']:>7.2f} "
              f"{m['mean_rot_deg']:>9.2f}")
        rows.append({"budget": budget, "faces": faces,
                     "lod_faces": args.lod_faces,
                     "coarse_iters": coarse_iters, "n": int(est.shape[0]),
                     "mean": m})
    if args.results_out:
        from deepim_tpu.utils.results import record_result

        record_result(args.results_out,
                      {"rows": rows, "checkpoint_step": int(state.step),
                       "samples": n}, experiment=cfg.experiment, argv=argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
