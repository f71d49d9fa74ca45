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
                   help="synthetic eval set size (0 = max(2048, 8*batch): "
                        "sized so the tables' ±CI resolves few-point "
                        "deltas — streaming eval keeps memory flat)")
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
    p.add_argument("--posecnn-mat", default="",
                   help="directory of PoseCNN released per-keyframe .mat "
                        "results ({i:06d}.mat ordered by keyframe.txt) "
                        "used as init poses (dataset.name=ycb_video only)")
    p.add_argument("--init-rot-noise", type=float, default=-1.0,
                   help="override the eval init-pose rotation noise std "
                        "(degrees; max = 3x std).  The reference evaluates "
                        "robustness across init qualities; gross values "
                        "(e.g. 45) are the regime where multi-hypothesis "
                        "selection earns its keep")
    p.add_argument("--init-trans-noise", type=float, default=-1.0,
                   help="override the eval init-pose translation noise std "
                        "(meters, all axes; max = 3x std)")
    p.add_argument("--quant-calib", default="max_c",
                   help="int8_static calibration estimator: max | p999 "
                        "(99.9%% clip) | max_c / p999_c (per-channel, "
                        "folded into weights) — see models/quant.py")
    p.add_argument("--quant", default="",
                   choices=("", "none", "int8", "int8_static"),
                   help="override cfg.network.quant for this eval: A/B "
                        "the quantized-inference path against the same "
                        "checkpoint ('int8_static' first runs a short "
                        "activation-scale calibration over eval batches)")
    p.add_argument("--seed", type=int, default=-1,
                   help="evaluate a seed-variance training run: suffixes "
                        "the experiment dir with _seed<k> exactly like "
                        "cli.train --seed (the EVAL set stays the fixed "
                        "protocol one, so runs differ only by training)")
    p.add_argument("--results-out", default="",
                   help="ALSO write the eval results JSON (wrapped with "
                        "argv/git metadata) to this path — protocol runs "
                        "point it into the committed results/ tree so "
                        "published numbers stay auditable")
    p.add_argument("--save-poses", action="store_true",
                   help="write per-sample refined pose trajectories to "
                        "refined_poses.npz (reference pred_eval stores "
                        "all_poses_est/all_poses_gt)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from deepim_tpu.utils.platform import respect_platform_env

    respect_platform_env()

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
    if args.seed >= 0:
        cfg.experiment = f"{cfg.experiment}_seed{args.seed}"
    if args.quant:
        cfg.network.quant = args.quant
    if args.init_rot_noise >= 0:
        cfg.train.rot_noise_deg = args.init_rot_noise
        cfg.train.rot_noise_max_deg = 3.0 * args.init_rot_noise
    if args.init_trans_noise >= 0:
        cfg.train.trans_noise = (args.init_trans_noise,) * 3
        cfg.train.trans_noise_max = (3.0 * args.init_trans_noise,) * 3
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
    model = make_model(cfg, train_assets_classes, inference=True)
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
    batches = None  # "stream" marks the on-disk (IO-prefetched) branch
    # observed depth feeds the network only for input_depth models, but
    # ALSO the multi-hypothesis visibility score (occlusion robustness) —
    # carry it whenever either consumer is active and the data has it
    want_depth = bool(cfg.network.input_depth) or args.hypotheses > 1
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

    # Every branch produces a per-batch STREAM (dicts with obs_rgb,
    # pose_src, pose_tgt, class_idx [, obs_depth, obs_mask]); observed
    # frames are never materialized as one whole-set device array — a
    # LINEMOD-scale test set (~13k frames x 480x640x3 f32) is ~48 GB,
    # more than chip HBM, so frames stream host->device per refine batch
    # (reference tester iterates its TestDataLoader the same way).
    if d.name == "synthetic_occlusion":
        # Occluded-LINEMOD protocol: observed frames are multi-object
        # scenes with distractor occluders.
        from deepim_tpu.data.synthetic import synthetic_occlusion_batch

        n = args.num_samples or max(2048, 8 * bs)
        n = (n // bs) * bs
        num_real = n  # generated batches have no padding

        def batch_stream():
            for i in range(n // bs):
                yield synthetic_occlusion_batch(
                    jax.random.PRNGKey(1000 + i), assets, bs, k_cam,
                    image_size,
                    rot_noise_deg=cfg.train.rot_noise_deg,
                    rot_max_deg=cfg.train.rot_noise_max_deg,
                    trans_noise=cfg.train.trans_noise,
                    trans_max=cfg.train.trans_noise_max,
                    renderer=cfg.test.renderer,
                )
    elif d.name.startswith("synthetic") or d.name == "modelnet":
        # Observed frames come from the SAME generator as training
        # (randomized lighting, noise background) — the eval distribution
        # must match the train distribution, only the seeds differ.
        from deepim_tpu.data.synthetic import synthetic_batch

        n = args.num_samples or max(2048, 8 * bs)
        n = (n // bs) * bs
        num_real = n

        def batch_stream():
            for i in range(n // bs):
                yield synthetic_batch(
                    jax.random.PRNGKey(9000 + i), assets, bs, k_cam,
                    image_size,
                    rot_noise_deg=cfg.train.rot_noise_deg,
                    rot_max_deg=cfg.train.rot_noise_max_deg,
                    trans_noise=cfg.train.trans_noise,
                    trans_max=cfg.train.trans_noise_max,
                    renderer=cfg.test.renderer,
                )
    elif d.name == "ycb_video":
        # YCB-Video keyframe protocol (reference §2.3): evaluate every
        # object of a sequence on the released keyframe list, batched per
        # keyframe (no tracking), PoseCNN inits, AUC tables.
        from deepim_tpu.data.video import (
            VideoDataset, iter_keyframe_batches, keyframe_records,
        )

        vds = VideoDataset(d.root, list(d.objects))
        if not vds.has_keyframes():
            raise SystemExit(
                f"dataset.name=ycb_video needs {d.root}/video_sets/"
                "keyframe.txt (the keyframe test list); for sequential "
                "tracking use cli.track instead")
        records = keyframe_records(vds)
        num_real = len(records)
        n = (num_real + bs - 1) // bs * bs
        recs_pad = records + [records[-1]] * (n - num_real)
        pose_gt_all = np.stack([r.pose for r in recs_pad])
        init_all = pose_gt_all.copy()
        cls_all = np.asarray([r.class_idx for r in recs_pad], np.int32)
        if cfg.test.init == "perturb":
            init_all = np.asarray(perturb_poses(
                jax.random.PRNGKey(7), jnp.asarray(pose_gt_all),
                cfg.train.rot_noise_deg, cfg.train.rot_noise_max_deg,
                cfg.train.trans_noise, cfg.train.trans_noise_max,
            ))
        if args.posecnn_mat:
            from deepim_tpu.data.video import apply_posecnn_mat_init

            matched = apply_posecnn_mat_init(
                records, init_all, args.posecnn_mat,
                obj_ids=list(d.obj_ids) or None)
            print(f"PoseCNN .mat init poses: matched {matched}/"
                  f"{len(records)} records from {args.posecnn_mat}")
        if args.init_poses:
            from deepim_tpu.data.lm6d import apply_bop_init

            matched = apply_bop_init(records, init_all, args.init_poses,
                                     obj_ids=list(d.obj_ids) or None)
            print(f"external init poses: matched {matched}/{len(records)} "
                  f"records from {args.init_poses}")

        def batch_stream():
            frames = iter_keyframe_batches(vds, records, bs, pad_to=n)
            for j, fr in enumerate(frames):
                sl = slice(j * bs, (j + 1) * bs)
                out = {
                    "obs_rgb": fr["obs_rgb"],
                    "pose_src": init_all[sl],
                    "pose_tgt": pose_gt_all[sl],
                    "class_idx": cls_all[sl],
                }
                if want_depth:
                    out["obs_depth"] = fr["obs_depth"]
                if cfg.network.input_mask:
                    out["obs_mask"] = fr["obs_mask"]
                yield out

        batches = "stream"
    else:
        from deepim_tpu.data.lm6d import LM6DDataset, iter_frame_batches

        ds = LM6DDataset(d.root, list(d.objects))
        records = []
        for obj in d.objects:
            records += ds.gt_roidb(obj, "test")
        num_real = len(records)
        n = (num_real + bs - 1) // bs * bs
        # Poses/ids are tiny (3x4 per record) — build them whole-set from
        # the roidb without touching any image file.
        recs_pad = records + [records[-1]] * (n - num_real)
        pose_gt_all = np.stack([r.pose for r in recs_pad])
        init_all = np.stack([
            r.init_pose if r.init_pose is not None else r.pose
            for r in recs_pad
        ])
        cls_all = np.asarray([r.class_idx for r in recs_pad], np.int32)
        if cfg.test.init == "perturb":
            init_all = np.asarray(perturb_poses(
                jax.random.PRNGKey(7), jnp.asarray(pose_gt_all),
                cfg.train.rot_noise_deg, cfg.train.rot_noise_max_deg,
                cfg.train.trans_noise, cfg.train.trans_noise_max,
            ))
        if args.init_poses:
            from deepim_tpu.data.lm6d import apply_bop_init

            matched = apply_bop_init(records, init_all, args.init_poses,
                                     obj_ids=list(d.obj_ids) or None)
            print(f"external init poses: matched {matched}/{len(records)} "
                  f"records from {args.init_poses}")

        def batch_stream():
            frames = iter_frame_batches(ds, records, bs, pad_to=n)
            for j, fr in enumerate(frames):
                sl = slice(j * bs, (j + 1) * bs)
                out = {
                    "obs_rgb": fr["obs_rgb"],
                    "pose_src": init_all[sl],
                    "pose_tgt": pose_gt_all[sl],
                    "class_idx": cls_all[sl],
                }
                if want_depth:
                    out["obs_depth"] = fr["obs_depth"]
                if cfg.network.input_mask:
                    out["obs_mask"] = fr["obs_mask"]
                yield out

        batches = "stream"  # marker: wrap in the IO prefetch thread

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

    n_cfg = cfg.network
    coarse_size = ((n_cfg.coarse_height, n_cfg.coarse_width)
                   if n_cfg.coarse_height else None)
    coarse_iters = (cfg.test.coarse_iters if args.coarse_iters < 0
                    else args.coarse_iters)
    stream = batch_stream()
    if batches == "stream":
        # On-disk frames: run the PNG IO/decode one batch ahead on a
        # background thread so it overlaps device compute.
        from deepim_tpu.data.lm6d import prefetch_iter

        stream = prefetch_iter(stream)
    if cfg.network.quant == "int8_static" and not args.no_refine:
        # Calibrate static activation scales on the first eval batches
        # (models/quant.py): the dynamic-int8 model sows per-layer max-abs,
        # the clone carries them as fixed scales.  The consumed batches are
        # chained back so the eval still covers every sample.
        import itertools

        from deepim_tpu.models.quant import calibrate_model

        calib = list(itertools.islice(stream, 2))
        model = calibrate_model(model, state.params, assets, calib, k_cam,
                                out_size, renderer=cfg.test.renderer,
                                num_iters=cfg.test.test_iter,
                                mode=args.quant_calib)
        stream = itertools.chain(calib, stream)
        print(f"int8_static: calibrated activation scales on "
              f"{len(calib)} batches (mode={args.quant_calib})")
    ks_b = jnp.tile(k_cam[None], (bs, 1, 1))  # same intrinsics every batch
    trajs = []  # per-batch (iters+1, bs, 3, 4) pose trajectories (tiny)
    gt_parts, cls_parts = [], []
    vis_rows: list[np.ndarray] = []  # first args.vis observed frames only
    t0 = time.time()
    for bi, batch in enumerate(stream):
        obs_b = jnp.asarray(batch["obs_rgb"])
        init_b = jnp.asarray(batch["pose_src"])
        cls_b = jnp.asarray(batch["class_idx"])
        obs_mask_b = (jnp.asarray(batch["obs_mask"])
                      if cfg.network.input_mask else None)
        obs_depth_b = (jnp.asarray(batch["obs_depth"])
                       if want_depth and "obs_depth" in batch else None)
        gt_parts.append(np.asarray(batch["pose_tgt"]))
        cls_parts.append(np.asarray(batch["class_idx"]))
        if args.vis and len(vis_rows) < args.vis:
            take = min(args.vis - len(vis_rows), obs_b.shape[0])
            vis_rows += list(np.asarray(batch["obs_rgb"][:take]))
        if args.no_refine:
            trajs.append(jnp.tile(init_b[None], (2, 1, 1, 1)))
            continue
        if args.hypotheses > 1:
            from deepim_tpu.refine import refine_multi_hypothesis

            best, _ = refine_multi_hypothesis(
                state.params, model, assets, shard(obs_b), shard(init_b),
                shard(ks_b), shard(cls_b),
                jax.random.PRNGKey(17 + bi * bs),
                num_hypotheses=args.hypotheses,
                num_iters=cfg.test.test_iter, out_size=out_size,
                renderer=cfg.test.renderer,
                obs_mask=None if obs_mask_b is None else shard(obs_mask_b),
                obs_depth=None if obs_depth_b is None else shard(obs_depth_b),
                coarse_iters=coarse_iters, coarse_size=coarse_size,
            )
            trajs.append(jnp.stack([init_b, best]))
            continue
        trajs.append(
            refine_poses(
                state.params, model, assets, shard(obs_b), shard(init_b),
                shard(ks_b), shard(cls_b),
                num_iters=cfg.test.test_iter,
                out_size=out_size, renderer=cfg.test.renderer,
                return_all=True,
                obs_mask=None if obs_mask_b is None else shard(obs_mask_b),
                obs_depth=None if obs_depth_b is None else shard(obs_depth_b),
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

    pose_gt = np.concatenate(gt_parts)
    class_idx = np.concatenate(cls_parts)
    ks = np.tile(np.asarray(k_cam)[None], (n, 1, 1))
    if num_real < n:
        # Batch padding repeats the last record; drop those rows so
        # metrics and exports weight each real record exactly once.
        traj = traj[:, :num_real]
        pose_gt, class_idx, ks = (pose_gt[:num_real], class_idx[:num_real],
                                  ks[:num_real])
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
        nv = min(args.vis, n, len(vis_rows))
        ones = jnp.ones((nv, 1), bool)
        interpret = jax.devices()[0].platform == "cpu"
        cols = []  # (iters+2) × (nv, H, W, 3/1) render outputs
        for pose_it in list(traj[:, :nv]) + [jnp.asarray(pose_gt[:nv])]:
            rgb, depth = render_scene(
                assets, jnp.asarray(class_idx[:nv, None]), pose_it[:, None],
                ones, jnp.asarray(ks[:nv]), image_size, interpret=interpret,
            )
            cols.append((np.asarray(rgb), np.asarray(depth)))
        obs_np = np.stack(vis_rows[:nv])
        for i in range(nv):
            tiles = [overlay_render(obs_np[i], rgb[i], depth[i])
                     for rgb, depth in cols]
            save_image(os.path.join(vis_dir, f"sample{i:03d}.png"),
                       side_by_side(*tiles))
        print(f"wrote {nv} overlay montages (INIT, "
              f"{traj.shape[0] - 1} iters, GT) to {vis_dir}")
    with open(os.path.join(out_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    if args.results_out:
        from deepim_tpu.utils.results import record_result

        record_result(args.results_out, results, experiment=cfg.experiment,
                      argv=argv)

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
