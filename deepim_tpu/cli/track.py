"""Video tracking driver: ``python -m deepim_tpu.cli.track --cfg <yaml>``.

The YCB-Video evaluation role of the reference (``lib/dataset/ycb_video*``
+ ``pred_eval``): track every object through each sequence by propagating
refined poses frame-to-frame, then report per-frame ADD(-S) and the AUC
tables the YCB protocol uses.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Video pose tracking eval")
    p.add_argument("--cfg", required=True)
    p.add_argument("--video-root", default="",
                   help="video dataset root (default: generate synthetic)")
    p.add_argument("--num-frames", type=int, default=8)
    p.add_argument("--iters-first", type=int, default=4)
    p.add_argument("--iters-rest", type=int, default=2)
    p.add_argument("--objects-per-seq", type=int, default=1,
                   help="objects per generated sequence (1 = LM6d-style "
                        "single-object tracking; 0 = all, YCB-style)")
    p.add_argument("--window", type=int, default=64,
                   help="frames streamed per tracking window — real "
                        "sequences run to thousands of frames (tens of GB "
                        "as one device array); windows carry the pose "
                        "across boundaries with identical results")
    p.add_argument("--occluders", type=int, default=0,
                   help="generated sequences only: add N untracked "
                        "distractor boxes sweeping in front of the "
                        "tracked objects (occlusion-induced track loss)")
    p.add_argument("--recover-threshold", type=float, default=None,
                   help="arm lost-track recovery: score_poses confidence "
                        "below this triggers multi-hypothesis "
                        "re-acquisition (try -0.12; scores are -mean "
                        "truncated |RGB diff| over visible foreground)")
    p.add_argument("--recover-hypotheses", type=int, default=4)
    p.add_argument("--recover-iters", type=int, default=4)
    p.add_argument("--seed", type=int, default=-1,
                   help="track with a seed-variance training run's "
                        "checkpoint: suffixes the experiment dir with "
                        "_seed<k> exactly like cli.train --seed")
    p.add_argument("--results-out", default="",
                   help="ALSO write the tracking results JSON (wrapped "
                        "with argv/git metadata) to this path — protocol "
                        "runs point it into the committed results/ tree")
    p.add_argument("--label-ids", choices=("slot", "global"),
                   default="slot",
                   help="label.png pixel convention: 'slot' = 1 + object "
                        "position in the sequence's object list (what "
                        "gen_video writes); 'global' = dataset-wide object "
                        "id (dataset.obj_ids when configured, else "
                        "class_idx + 1 — real YCB-Video-style labels)")
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
    from deepim_tpu.data.video import VideoDataset, gen_video
    from deepim_tpu.eval import evaluate_poses, format_table
    from deepim_tpu.raster.mesh import PROCEDURAL_MESHES
    from deepim_tpu.refine.video import refine_video
    from deepim_tpu.train import init_state, make_model
    from deepim_tpu.train.checkpoint import latest_step, restore_checkpoint

    cfg = update_config(args.cfg)
    if args.seed >= 0:
        cfg.experiment = f"{cfg.experiment}_seed{args.seed}"
    out_dir = os.path.join(cfg.output_dir, cfg.experiment)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    d = cfg.dataset
    image_size = (d.image_height, d.image_width)
    out_size = (cfg.network.input_height, cfg.network.input_width)
    k_np = np.array([[d.fx, 0, d.cx], [0, d.fy, d.cy], [0, 0, 1]], np.float32)

    assets, names, symmetric = load_assets_and_names(cfg, eval_set=True)
    model = make_model(cfg, len(cfg.dataset.objects), inference=True)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    if latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        print(f"loaded checkpoint step {int(state.step)}")
    else:
        print("WARNING: no checkpoint — tracking with an untrained net")

    root = args.video_root
    if not root:
        # The cache key must carry every generation parameter: a run with
        # --num-frames 32 must not silently reuse 16-frame data generated
        # by an earlier invocation (this happened; the identical metrics
        # were the tell).
        suffix = f"_occ{args.occluders}" if args.occluders else ""
        if args.num_frames != 8:
            suffix += f"_f{args.num_frames}"
        if args.objects_per_seq != 1:
            suffix += f"_o{args.objects_per_seq}"
        root = os.path.join(out_dir, f"video_data{suffix}")
        if not os.path.isdir(os.path.join(root, "video_sets")):
            print(f"generating synthetic video dataset under {root}")
            meshes = {n: PROCEDURAL_MESHES[n]() for n in names}
            gen_video(root, meshes, k_np, image_size,
                      num_frames=args.num_frames,
                      renderer="xla" if jax.devices()[0].platform == "cpu"
                      else "pallas",
                      objects_per_sequence=args.objects_per_seq or None,
                      occluders=args.occluders)
    ds = VideoDataset(root, names)

    renderer = (cfg.test.renderer
                if jax.devices()[0].platform == "tpu" else "xla")
    all_est, all_gt, all_cls = [], [], []
    for seq in ds.sequences():
        n_frames = len(ds.frame_ids(seq))
        win = max(args.window, 1)
        cls = ks = None
        carry_pose = None  # pose carried across window boundaries
        t_total = m = 0
        # Depth feeds the CNN only for input_depth models, but ALSO the
        # recovery confidence score (z-resolution the scale-normalizing
        # zoom denies to RGB — score_poses docstring); load it whenever
        # either consumer is active.
        want_depth = (cfg.network.input_depth
                      or args.recover_threshold is not None)
        for w0 in range(0, n_frames, win):
            # Stream one window from disk — frames are shared across the
            # M tracked objects (refine_video broadcasts per step; no
            # M-fold copy, no whole-sequence device array).
            data = ds.load_sequence(seq,
                                    with_depths=want_depth,
                                    with_labels=cfg.network.input_mask,
                                    start=w0, count=win)
            frames = jnp.asarray(data["frames"])  # (T, H, W, 3) shared
            if cls is None:
                cls = jnp.asarray(data["class_idx"])
                ks = jnp.tile(jnp.asarray(k_np)[None],
                              (cls.shape[0], 1, 1))
            if carry_pose is None:
                init = ds.init_poses(seq)
                init = jnp.asarray(init if init is not None
                                   else data["poses"][0])
            else:
                init = carry_pose
            obs_depths = None
            if want_depth:
                # input_depth checkpoints must track with the recorded
                # depth stream, not the rendered-depth fallback; RGB-only
                # models with recovery armed use it for scoring only.
                if data["depths"] is not None:
                    obs_depths = jnp.asarray(data["depths"])  # shared
                elif w0 == 0 and cfg.network.input_depth:
                    print(f"WARNING: seq {seq} has no depth stream; "
                          "input_depth model falls back to rendered depth")
            obs_masks = None
            if cfg.network.input_mask:
                # same train/test contract for the observed-mask channel:
                # per-object masks from the recorded label stream (pixel
                # ids per --label-ids), or warn on fallback.
                if data["labels"] is not None:
                    lab = jnp.asarray(data["labels"])  # (T, H, W)
                    if args.label_ids == "global":
                        cls_np = np.asarray(cls)
                        ids = jnp.asarray(
                            np.asarray(list(d.obj_ids), np.int64)[cls_np]
                            if d.obj_ids else cls_np + 1)
                    else:
                        ids = jnp.arange(1, cls.shape[0] + 1)
                    obs_masks = (lab[:, None] ==
                                 ids[None, :, None, None]
                                 ).astype(jnp.float32)
                    if w0 == 0 and not bool(obs_masks.any()):
                        print(f"WARNING: seq {seq}: label stream matched "
                              f"no pixels under the '{args.label_ids}' id "
                              "convention — check --label-ids (slot vs "
                              "global); the model is tracking with "
                              "all-empty observed masks")
                elif w0 == 0:
                    print(f"WARNING: seq {seq} has no label stream; "
                          "input_mask model falls back to rendered masks")
            traj = refine_video(
                state.params, model, assets, frames, init, ks, cls,
                # the big-init-error budget applies to frame 0 only;
                # later windows continue from the carried pose
                iters_first=(args.iters_first if w0 == 0
                             else args.iters_rest),
                iters_rest=args.iters_rest,
                out_size=out_size, renderer=renderer,
                obs_depths=obs_depths, obs_masks=obs_masks,
                recover_threshold=args.recover_threshold,
                recover_hypotheses=args.recover_hypotheses,
                recover_iters=args.recover_iters,
                key=jax.random.PRNGKey(17 + w0),
            )
            if args.recover_threshold is not None:
                traj, conf = traj
                n_low = int((np.asarray(conf)
                             < args.recover_threshold).sum())
                if n_low:
                    print(f"  seq {seq} window {w0}: {n_low} low-"
                          f"confidence frame-objects (recovery armed)")
            carry_pose = traj[-1]
            t_w, m = traj.shape[0], traj.shape[1]
            t_total += t_w
            all_est.append(np.asarray(traj).reshape(t_w * m, 3, 4))
            all_gt.append(np.asarray(data["poses"]).reshape(t_w * m, 3, 4))
            all_cls.append(np.tile(np.asarray(cls), t_w))
        print(f"seq {seq}: tracked {m} objects over {t_total} frames "
              f"({-(-n_frames // win)} windows)")

    est = np.concatenate(all_est)
    gt = np.concatenate(all_gt)
    cls = np.concatenate(all_cls)
    ks = np.tile(k_np[None], (len(est), 1, 1))
    results = evaluate_poses(assets, names, symmetric, est, gt, cls, ks)
    print(format_table(results, f"{cfg.experiment} — video tracking "
                                f"(AUC = YCB protocol)"))
    with open(os.path.join(out_dir, "track_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    if args.results_out:
        from deepim_tpu.utils.results import record_result

        record_result(args.results_out, results, experiment=cfg.experiment,
                      argv=argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
