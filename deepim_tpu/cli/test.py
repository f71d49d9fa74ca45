"""Testing driver: ``python -m deepim_tpu.cli.test --cfg <yaml>``.

Rebuild of the reference's test entry point (``deepim_test.py`` →
``deepim/core/tester.py §pred_eval``): loads a checkpoint, runs the
K-iteration refinement over the test set (synthetic on-device set or an
on-disk LM6d-layout dataset), and prints the ADD(-S)/(5°,5cm)/Proj-2D
evaluation table.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a deepim_tpu model")
    p.add_argument("--cfg", required=True)
    p.add_argument("--num-samples", type=int, default=0,
                   help="synthetic eval set size (0 = 8*batch)")
    p.add_argument("--no-refine", action="store_true",
                   help="evaluate the init poses only (baseline row)")
    p.add_argument("--hypotheses", type=int, default=1,
                   help=">1: multi-hypothesis refinement with render-"
                        "agreement selection (occlusion protocol)")
    p.add_argument("--coarse-iters", type=int, default=-1,
                   help="override cfg.test.coarse_iters (coarse-to-fine "
                        "schedule A/B; -1 = use the config value)")
    p.add_argument("--vis", type=int, default=0,
                   help="dump per-iteration rendered-vs-observed overlay "
                        "montages for the first N samples (reference "
                        "tester's visualization flags)")
    p.add_argument("--init-poses", default="",
                   help="BOP results CSV of external init poses (PoseCNN-"
                        "style import), matched to LM6d test records by "
                        "(scene_id, im_id, obj_id); unmatched records keep "
                        "their default init")
    p.add_argument("--save-poses", action="store_true",
                   help="write per-sample refined pose trajectories to "
                        "refined_poses.npz (reference pred_eval stores "
                        "all_poses_est/all_poses_gt)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepim_tpu.cli.train import load_assets_and_names
    from deepim_tpu.config import update_config
    from deepim_tpu.data.pairs import perturb_poses
    from deepim_tpu.eval import evaluate_poses, format_table
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.refine import refine_poses
    from deepim_tpu.train import init_state, make_model
    from deepim_tpu.train.checkpoint import latest_step, restore_checkpoint

    cfg = update_config(args.cfg)
    out_dir = os.path.join(cfg.output_dir, cfg.experiment)
    # eval-only runs (external/absent checkpoints) start from nothing
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    assets, names, symmetric = load_assets_and_names(cfg, eval_set=True)
    # class-aware heads are sized by the TRAINING class set; with
    # class_agnostic there is one shared head and eval classes may differ.
    train_assets_classes = (cfg.dataset.zoo_size
                            if cfg.dataset.name == "modelnet"
                            else len(cfg.dataset.objects))
    model = make_model(cfg, train_assets_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded checkpoint step {int(state.step)}")
    else:
        print("WARNING: no checkpoint found — evaluating an untrained net "
              "(identity deltas)")

    d = cfg.dataset
    image_size = (d.image_height, d.image_width)
    out_size = (cfg.network.input_height, cfg.network.input_width)
    k_cam = make_intrinsics(d.fx, d.fy, d.cx, d.cy)
    bs = cfg.test.batch_size
    obs_depth = obs_mask = None  # input_depth/input_mask extra channels
    batches = None  # synthetic branches fill this; lm6d builds arrays
    records = None  # lm6d test records (scene/frame ids for BOP export)
    if d.obj_ids and len(d.obj_ids) != len(d.objects):
        # checked before ANY batch generation: --save-poses maps class
        # indices through obj_ids after the refinement run, and failing
        # there would waste the whole run (synthetic configs included)
        raise SystemExit(
            f"dataset.obj_ids ({len(d.obj_ids)} entries) must be "
            f"parallel to dataset.objects ({len(d.objects)}) — "
            "failing now rather than after the refinement run")
    if args.init_poses and (d.name.startswith("synthetic")
                            or d.name == "modelnet"):
        raise SystemExit("--init-poses requires an on-disk dataset; got "
                         f"dataset.name={d.name!r} — external init poses "
                         "are matched by (scene, im, obj) ids which "
                         "generated data does not have")

    if d.name == "synthetic_occlusion":
        # Occluded-LINEMOD protocol: observed frames are multi-object
        # scenes with distractor occluders.
        from deepim_tpu.data.synthetic import synthetic_occlusion_batch

        n = args.num_samples or 8 * bs
        n = (n // bs) * bs
        batches = [
            synthetic_occlusion_batch(
                jax.random.PRNGKey(1000 + i), assets, bs, k_cam, image_size,
                rot_noise_deg=cfg.train.rot_noise_deg,
                rot_max_deg=cfg.train.rot_noise_max_deg,
                trans_noise=cfg.train.trans_noise,
                trans_max=cfg.train.trans_noise_max,
                renderer=cfg.test.renderer,
            )
            for i in range(n // bs)
        ]
    elif d.name.startswith("synthetic") or d.name == "modelnet":
        # Observed frames come from the SAME generator as training
        # (randomized lighting, noise background) — the eval distribution
        # must match the train distribution, only the seeds differ.
        from deepim_tpu.data.synthetic import synthetic_batch

        n = args.num_samples or 8 * bs
        n = (n // bs) * bs
        batches = [
            synthetic_batch(
                jax.random.PRNGKey(9000 + i), assets, bs, k_cam, image_size,
                rot_noise_deg=cfg.train.rot_noise_deg,
                rot_max_deg=cfg.train.rot_noise_max_deg,
                trans_noise=cfg.train.trans_noise,
                trans_max=cfg.train.trans_noise_max,
                renderer=cfg.test.renderer,
            )
            for i in range(n // bs)
        ]
    else:
        from deepim_tpu.data.lm6d import LM6DDataset, make_eval_arrays

        ds = LM6DDataset(d.root, list(d.objects))
        records = []
        for obj in d.objects:
            records += ds.gt_roidb(obj, "test")
        num_real = len(records)
        n = (num_real + bs - 1) // bs * bs
        arrs = make_eval_arrays(ds, records, pad_to=n)
        obs = jnp.asarray(arrs["obs_rgb"])
        obs_depth = (jnp.asarray(arrs["obs_depth"])
                     if cfg.network.input_depth else None)
        obs_mask = (jnp.asarray(arrs["obs_mask"])
                    if cfg.network.input_mask else None)
        pose_gt = jnp.asarray(arrs["pose_gt"])
        init = jnp.asarray(arrs["init_pose"])
        class_idx = jnp.asarray(arrs["class_idx"])
        ks = jnp.tile(k_cam[None], (n, 1, 1))
        if cfg.test.init == "perturb":
            init = perturb_poses(
                jax.random.PRNGKey(7), pose_gt, cfg.train.rot_noise_deg,
                cfg.train.rot_noise_max_deg, cfg.train.trans_noise,
                cfg.train.trans_noise_max,
            )
        if args.init_poses:
            from deepim_tpu.data.lm6d import apply_bop_init

            init_np = np.asarray(init).copy()
            matched = apply_bop_init(records, init_np, args.init_poses,
                                     obj_ids=list(d.obj_ids) or None)
            init = jnp.asarray(init_np)
            print(f"external init poses: matched {matched}/{len(records)} "
                  f"records from {args.init_poses}")

    if batches is not None:
        num_real = n  # generated batches have no padding
        obs = jnp.concatenate([b["obs_rgb"] for b in batches])
        pose_gt = jnp.concatenate([b["pose_tgt"] for b in batches])
        init = jnp.concatenate([b["pose_src"] for b in batches])
        class_idx = jnp.concatenate([b["class_idx"] for b in batches])
        ks = jnp.tile(k_cam[None], (n, 1, 1))
        if cfg.network.input_depth:
            obs_depth = jnp.concatenate([b["obs_depth"] for b in batches])
        if cfg.network.input_mask:
            obs_mask = jnp.concatenate([b["obs_mask"] for b in batches])

    # Data-parallel eval (reference: tester split test batches over --gpus).
    # Sharding the batch axis over a ('data',) mesh lets GSPMD partition the
    # jitted refine loop; params are explicitly replicated over the mesh
    # (checkpoint restore commits them to device 0, which would otherwise
    # conflict with mesh-sharded batch inputs).
    ndev = len(jax.devices())
    if ndev > 1 and bs % ndev == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        data_mesh = Mesh(np.array(jax.devices()), ("data",))
        replicated = NamedSharding(data_mesh, PartitionSpec())
        state = state._replace(
            params=jax.device_put(state.params, replicated))

        def shard(x):
            spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(data_mesh, spec))

        print(f"eval data-parallel over {ndev} devices")
    else:
        def shard(x):
            return x

    trajs = []
    t0 = time.time()
    for i in range(0, n, bs):
        sl = slice(i, i + bs)
        if args.no_refine:
            trajs.append(jnp.tile(init[sl][None], (2, 1, 1, 1)))
            continue
        if args.hypotheses > 1:
            from deepim_tpu.refine import refine_multi_hypothesis

            best, _ = refine_multi_hypothesis(
                state.params, model, assets, shard(obs[sl]), shard(init[sl]),
                shard(ks[sl]), shard(class_idx[sl]), jax.random.PRNGKey(17 + i),
                num_hypotheses=args.hypotheses,
                num_iters=cfg.test.test_iter, out_size=out_size,
                renderer=cfg.test.renderer,
                obs_mask=None if obs_mask is None else shard(obs_mask[sl]),
                obs_depth=(None if obs_depth is None
                           else shard(obs_depth[sl])),
            )
            trajs.append(jnp.stack([init[sl], best]))
            continue
        n_cfg = cfg.network
        coarse_size = ((n_cfg.coarse_height, n_cfg.coarse_width)
                       if n_cfg.coarse_height else None)
        coarse_iters = (cfg.test.coarse_iters if args.coarse_iters < 0
                        else args.coarse_iters)
        trajs.append(
            refine_poses(
                state.params, model, assets, shard(obs[sl]), shard(init[sl]),
                shard(ks[sl]), shard(class_idx[sl]),
                num_iters=cfg.test.test_iter,
                out_size=out_size, renderer=cfg.test.renderer,
                return_all=True,
                obs_mask=None if obs_mask is None else shard(obs_mask[sl]),
                obs_depth=(None if obs_depth is None
                           else shard(obs_depth[sl])),
                coarse_iters=coarse_iters,
                coarse_size=coarse_size,
            )
        )
    traj = jnp.concatenate(trajs, axis=1)  # (iters+1, n, 3, 4)
    traj.block_until_ready()
    dt = time.time() - t0
    print(f"refined {n} hypotheses x {cfg.test.test_iter} iters "
          f"in {dt:.2f}s ({n / dt:.1f} poses/s, incl. compile)")
    n_refined = n  # rows actually refined (incl. padding) — for time_s

    if num_real < n:
        # Batch padding repeats the last record (make_eval_arrays pad_to);
        # drop those rows so metrics and exports weight each real record
        # exactly once.
        traj = traj[:, :num_real]
        pose_gt, class_idx, ks = (pose_gt[:num_real], class_idx[:num_real],
                                  ks[:num_real])
        obs = obs[:num_real]
        n = num_real

    # Per-iteration tables (reference pred_eval prints per-iter results).
    results = None
    for it in range(traj.shape[0]):
        results = evaluate_poses(
            assets, names, symmetric, np.asarray(traj[it]),
            np.asarray(pose_gt), np.asarray(class_idx), np.asarray(ks),
        )
        label = "INIT" if it == 0 else f"iter {it}"
        print(f"[{label}] ADD(-S)@0.1d={results['mean']['add(-s)_0.1d']:.2f} "
              f"5d5cm={results['mean']['5deg_5cm']:.2f} "
              f"proj2d={results['mean']['proj2d_5px']:.2f}")
    title = (f"{cfg.experiment} — "
             f"{'INIT (unrefined)' if args.no_refine else f'{cfg.test.test_iter} refine iters'}")
    print(format_table(results, title))

    if args.vis:
        # Per-iteration rendered-vs-observed overlays (reference: the
        # tester's visualization flags dump these during testing).  One
        # montage per sample: columns INIT, iter 1..K, GT.
        from deepim_tpu.refine import render_scene
        from deepim_tpu.utils.viz import (
            overlay_render, save_image, side_by_side,
        )

        vis_dir = os.path.join(out_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        nv = min(args.vis, n)
        ones = jnp.ones((nv, 1), bool)
        interpret = jax.devices()[0].platform == "cpu"
        cols = []  # (iters+2) × (nv, H, W, 3/1) render outputs
        for pose_it in list(traj[:, :nv]) + [pose_gt[:nv]]:
            rgb, depth = render_scene(
                assets, class_idx[:nv, None], pose_it[:, None], ones,
                ks[:nv], image_size, interpret=interpret,
            )
            cols.append((np.asarray(rgb), np.asarray(depth)))
        obs_np = np.asarray(obs[:nv])
        for i in range(nv):
            tiles = [overlay_render(obs_np[i], rgb[i], depth[i])
                     for rgb, depth in cols]
            save_image(os.path.join(vis_dir, f"sample{i:03d}.png"),
                       side_by_side(*tiles))
        print(f"wrote {nv} overlay montages (INIT, "
              f"{traj.shape[0] - 1} iters, GT) to {vis_dir}")
    with open(os.path.join(out_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)

    if args.save_poses:
        # Reference pred_eval keeps all_poses_est/all_poses_gt for the
        # dataset's evaluate_pose; here the full per-iteration trajectory
        # is saved so downstream consumers can re-run any metric.
        path = os.path.join(out_dir, "refined_poses.npz")
        traj_np = np.asarray(traj)  # (iters+1, n, 3, 4); [0] = init
        cls_np = np.asarray(class_idx)
        np.savez_compressed(path, traj=traj_np, pose_gt=np.asarray(pose_gt),
                            class_idx=cls_np, k=np.asarray(ks))
        print(f"wrote pose trajectories to {path}")

        # BOP-toolkit-compatible CSV of the final refined poses.  Object
        # ids come from dataset.obj_ids (the dataset's real 1-based BOP
        # ids) when configured, else positional class_idx+1; on-disk
        # records also carry their real scene/im ids.
        from deepim_tpu.eval import write_bop_csv

        if d.obj_ids:
            oid_map = np.asarray(list(d.obj_ids), np.int64)
            if int(cls_np.max(initial=0)) >= len(oid_map):
                # reachable on modelnet, where class indices come from
                # the zoo, not dataset.objects
                raise SystemExit(
                    f"class index {int(cls_np.max(initial=0))} is out of "
                    f"range for dataset.obj_ids ({len(oid_map)} entries) "
                    "— the id map must cover every class the refinement "
                    "ran on (zoo classes included)")
            obj_col = oid_map[cls_np]
        else:
            obj_col = cls_np + 1
        scene_ids = im_ids = None
        if records is not None:
            def _ints(vals):
                try:
                    return np.asarray([int(v) for v in vals], np.int64)
                except ValueError:
                    return None
            scene_ids = _ints([r.scene for r in records])
            im_ids = _ints([r.frame for r in records])
            if scene_ids is None or im_ids is None:
                # fall back JOINTLY — real scene ids paired with
                # fabricated arange im ids would score against the wrong
                # existing ground truths in the BOP toolkit
                scene_ids = im_ids = None
                print("WARNING: scene/frame names are not numeric; the "
                      "BOP CSV gets placeholder scene_id=0 / im_id=row "
                      "ids, which the BOP toolkit cannot match against "
                      "real ground truth")
        else:
            print("WARNING: generated data has no scene/frame ids; the "
                  "BOP CSV gets placeholder scene_id=0 / im_id=row ids")
        csv_path = os.path.join(out_dir, "bop_results.csv")
        write_bop_csv(csv_path, traj_np[-1], obj_col,
                      scene_ids=scene_ids, im_ids=im_ids,
                      time_s=float(dt) / max(n_refined, 1))
        print(f"wrote BOP results CSV to {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
