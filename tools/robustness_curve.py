"""Refinement success vs. init-pose error curves (reference protocol).

The DeepIM paper characterizes the refiner by sweeping the initial pose
error and plotting the post-refinement success rate (its ModelNet section
reports success-vs-init curves rather than one number).  This tool runs
that protocol on a trained checkpoint: for each init-noise level it
generates a fixed eval set, refines with K iterations (optionally
multi-hypothesis), and prints one table row per level with init vs
refined ADD(-S)@0.1d / (5°,5cm) / Proj2D.

Usage:
    python tools/robustness_curve.py --cfg experiments/cfgs/foo.yaml \
        [--samples 256] [--hypotheses 1] \
        [--rot-levels 5,15,30,45,60] [--trans-scale 0.02]

``--trans-scale`` sets the translation noise std (meters, all axes) at
the 15° level; other levels scale it proportionally to rot/15 so both
error sources grow together (the paper's sweep couples them the same
way).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="success-vs-init-error robustness curves")
    p.add_argument("--cfg", required=True)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--hypotheses", type=int, default=1)
    p.add_argument("--rot-levels", default="5,15,30,45,60",
                   help="comma list of init rotation noise stds (deg)")
    p.add_argument("--trans-scale", type=float, default=0.02,
                   help="translation noise std (m) at the 15deg level")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from deepim_tpu.utils.platform import respect_platform_env

    respect_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepim_tpu.cli.train import load_assets_and_names
    from deepim_tpu.config import update_config
    from deepim_tpu.data.synthetic import synthetic_batch
    from deepim_tpu.eval import evaluate_poses
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.refine import refine_poses
    from deepim_tpu.train import init_state, make_model
    from deepim_tpu.train.checkpoint import latest_step, restore_checkpoint

    cfg = update_config(args.cfg)
    assets, names, symmetric = load_assets_and_names(cfg, eval_set=True)
    model = make_model(cfg, len(cfg.dataset.objects), inference=True)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(cfg.output_dir, cfg.experiment, "checkpoints")
    if latest_step(ckpt_dir) is None:
        print("WARNING: no checkpoint — identity refiner", file=sys.stderr)
    else:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded checkpoint step {int(state.step)}")
    variables = state.params  # same convention as cli.test

    d = cfg.dataset
    k_cam = make_intrinsics(d.fx, d.fy, d.cx, d.cy)
    image_size = (d.image_height, d.image_width)
    out_size = (cfg.network.input_height, cfg.network.input_width)
    renderer = cfg.test.renderer if jax.devices()[0].platform == "tpu" \
        else "xla"
    bs = cfg.test.batch_size
    n = max(bs, (args.samples // bs) * bs)
    levels = [float(x) for x in args.rot_levels.split(",")]

    header = (f"{'rot_std':>8} {'trans_std':>10} {'init_add':>9} "
              f"{'add(-s)':>8} {'5d5cm':>7} {'proj2d':>7} {'auc':>6}")
    print(header)
    print("-" * len(header))
    for rot in levels:
        tr = args.trans_scale * rot / 15.0
        est_all, gt_all, cls_all = [], [], []
        init_all = []
        for i in range(n // bs):
            batch = synthetic_batch(
                jax.random.PRNGKey(31000 + i), assets, bs, k_cam,
                image_size, rot_noise_deg=rot, rot_max_deg=3 * rot,
                trans_noise=(tr,) * 3, trans_max=(3 * tr,) * 3,
                renderer=renderer,
            )
            ks = jnp.tile(k_cam[None], (bs, 1, 1))
            if args.hypotheses > 1:
                from deepim_tpu.refine import refine_multi_hypothesis

                est, _ = refine_multi_hypothesis(
                    variables, model, assets, batch["obs_rgb"],
                    batch["pose_src"], ks, batch["class_idx"],
                    jax.random.PRNGKey(77 + i),
                    num_hypotheses=args.hypotheses,
                    num_iters=cfg.test.test_iter, out_size=out_size,
                    renderer=renderer, obs_depth=batch.get("obs_depth"),
                    obs_mask=batch.get("obs_mask"),
                    coarse_iters=cfg.test.coarse_iters,
                )
            else:
                est = refine_poses(
                    variables, model, assets, batch["obs_rgb"],
                    batch["pose_src"], ks, batch["class_idx"],
                    num_iters=cfg.test.test_iter, out_size=out_size,
                    renderer=renderer, coarse_iters=cfg.test.coarse_iters,
                    obs_depth=batch.get("obs_depth"),
                    obs_mask=batch.get("obs_mask"),
                )
            est_all.append(np.asarray(est))
            init_all.append(np.asarray(batch["pose_src"]))
            gt_all.append(np.asarray(batch["pose_tgt"]))
            cls_all.append(np.asarray(batch["class_idx"]))
        est = np.concatenate(est_all)
        init = np.concatenate(init_all)
        gt = np.concatenate(gt_all)
        cls = np.concatenate(cls_all)
        ks_np = np.tile(np.asarray(k_cam)[None], (est.shape[0], 1, 1))
        t_init = evaluate_poses(assets, names, symmetric, init, gt, cls,
                                ks_np)
        t_ref = evaluate_poses(assets, names, symmetric, est, gt, cls,
                               ks_np)
        m, mi = t_ref["mean"], t_init["mean"]
        print(f"{rot:8.1f} {tr:10.3f} {mi['add(-s)_0.1d']:9.2f} "
              f"{m['add(-s)_0.1d']:8.2f} {m['5deg_5cm']:7.2f} "
              f"{m['proj2d_5px']:7.2f} {m['auc_add(-s)']:6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
