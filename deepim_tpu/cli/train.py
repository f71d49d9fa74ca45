"""Training driver: ``python -m deepim_tpu.cli.train --cfg <yaml>``.

Rebuild of the reference's entry point
(``experiments/deepim/deepim_train_test.py §train_net``: argparse → YAML
config → datasets/loaders → MutableModule.fit).  Differences: data
parallelism comes from the device mesh (``--gpus`` is gone — all local
devices are used unless ``--n-devices`` caps them), and synthetic configs
train with the fused on-device generate+train step.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a deepim_tpu model")
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("--n-devices", type=int, default=0,
                   help="cap data-parallel devices (0 = all)")
    p.add_argument("--num-steps", type=int, default=0,
                   help="override cfg.train.num_steps")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint")
    p.add_argument("--seed", type=int, default=-1,
                   help="override cfg.train.seed (seed-variance studies); "
                        "also suffixes the experiment dir with _seed<k> so "
                        "runs don't clobber the protocol checkpoint")
    return p.parse_args(argv)


def load_assets_and_names(cfg, eval_set: bool = False):
    """Meshes per cfg.dataset -> (RenderAssets, class names, symmetric flags).

    ``eval_set`` selects ``cfg.dataset.eval_objects`` when present (the
    ModelNet unseen-category protocol evaluates meshes not trained on).
    """
    from deepim_tpu.geometry.symmetry import (
        LINEMOD_SYMMETRIC, PROCEDURAL_SYMMETRIC, YCB_SYMMETRIC,
    )
    from deepim_tpu.raster.mesh import PROCEDURAL_MESHES
    from deepim_tpu.refine import build_assets

    sym_table = {**LINEMOD_SYMMETRIC, **YCB_SYMMETRIC, **PROCEDURAL_SYMMETRIC}
    d = cfg.dataset
    names = list(d.eval_objects) if eval_set and d.eval_objects else \
        list(d.objects)
    if d.name == "modelnet" and eval_set and d.cad_dir:
        # Real CAD evaluation set: every mesh file in cad_dir (ModelNet
        # .off, or .obj/.ply), normalized to metric scale.  This is the
        # reference's actual unseen-category protocol once real ModelNet
        # assets are present.
        import numpy as np  # noqa: F811 — function-local import style

        from deepim_tpu.raster.mesh import (
            decimate_mesh, load_mesh, normalize_mesh,
        )

        files = sorted(
            fn for fn in os.listdir(d.cad_dir)
            if os.path.splitext(fn)[1].lower() in (".off", ".obj", ".ply")
        )
        if not files:
            raise SystemExit(f"dataset.cad_dir={d.cad_dir!r} contains no "
                             ".off/.obj/.ply mesh files")
        names = [os.path.splitext(fn)[0] for fn in files]
        meshes = [
            decimate_mesh(
                normalize_mesh(load_mesh(os.path.join(d.cad_dir, fn)),
                               d.cad_diameter),
                d.max_faces,
            )
            for fn in files
        ]
    elif d.name == "modelnet" and not (eval_set and d.eval_objects):
        # ModelNet protocol: train on a randomized procedural shape zoo.
        from deepim_tpu.raster.mesh import ZOO_FAMILIES, random_mesh_zoo

        fams = tuple(d.zoo_families) or ZOO_FAMILIES
        zoo = random_mesh_zoo(d.zoo_size, d.zoo_seed, fams,
                              texture_prob=d.texture_prob)
        names = list(zoo)
        meshes = [zoo[n] for n in names]
    elif d.name.startswith("synthetic") or d.name == "modelnet":
        meshes = [PROCEDURAL_MESHES[n]() for n in names]
        if d.texture_prob > 0.0:
            import numpy as np

            from deepim_tpu.raster.mesh import texturize

            rng_tex = np.random.RandomState(d.zoo_seed)
            meshes = [
                texturize(m, d.zoo_seed * 100003 + i)
                if rng_tex.rand() < d.texture_prob else m
                for i, m in enumerate(meshes)
            ]
    else:
        from deepim_tpu.data.lm6d import LM6DDataset

        ds = LM6DDataset(d.root, names)
        meshes = ds.load_meshes(max_faces=d.max_faces)
    # zoo cylinders/tori are CONTINUOUSLY z-symmetric like their canonical
    # versions (closed-form min in the PM loss; dense discrete in metrics)
    from deepim_tpu.geometry.symmetry import CONTINUOUS_Z

    def sym_for(n):
        if n.startswith(("zoo_cyl", "zoo_torus", "zoo_cone", "zoo_capsule",
                         "zoo_frustum", "zoo_tube")):
            return CONTINUOUS_Z
        # dense stand-in variants share their base shape's symmetry
        # (torus_dense / cylinder_dense are as z-symmetric as the originals)
        import re

        return sym_table.get(re.sub(r"_dense\d*$", "", n), sym_table.get(n))

    syms = [sym_for(n) for n in names]
    use_tex = {"auto": None, "on": True, "off": False}[d.use_textures]
    # The coarse LOD is only rendered by refine_poses' coarse iterations;
    # with coarse-to-fine off it would be built (per-mesh decimation at
    # startup), replicated per shard, and never touched — pure waste.
    lod = d.lod_faces if cfg.test.coarse_iters > 0 else None
    assets = build_assets(meshes, sym_transforms=syms,
                          num_points=d.num_points, use_textures=use_tex,
                          lod_faces=lod or None)
    return assets, names, [s is not None for s in syms]


def main(argv=None):
    args = parse_args(argv)

    from deepim_tpu.utils.platform import respect_platform_env

    respect_platform_env()

    import jax

    from deepim_tpu.config import save_config, update_config
    from deepim_tpu.parallel import make_mesh
    from deepim_tpu.raster.camera import make_intrinsics
    from deepim_tpu.train import (
        init_state, make_model, make_synthetic_train_step,
    )
    from deepim_tpu.train.checkpoint import (
        clear_checkpoints, latest_step, restore_checkpoint, save_checkpoint,
    )

    cfg = update_config(args.cfg)
    if args.num_steps:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           num_steps=args.num_steps)
        )
    if args.seed >= 0:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, seed=args.seed),
            experiment=f"{cfg.experiment}_seed{args.seed}",
        )
    out_dir = os.path.join(cfg.output_dir, cfg.experiment)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, "config.yaml"))

    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    n_dev = args.n_devices or len(jax.devices())
    mesh = make_mesh(n_data=n_dev) if n_dev > 1 else None
    print(f"devices: {n_dev} ({jax.devices()[0].platform}); "
          f"mesh={'1x1' if mesh is None else dict(mesh.shape)}")
    if os.environ.get("DEEPIM_SUPERVISED") != "1":
        # Long runs over the flaky axon tunnel should be driven by the
        # failure-detecting supervisor (kills+resumes wedged runs); the
        # round-3 flagship died unfinished because it wasn't.
        print("hint: for unattended runs use\n"
              f"  python tools/supervise_train.py --cfg {args.cfg}")

    assets, names, _ = load_assets_and_names(cfg)
    model = make_model(cfg, assets.num_classes)
    state = init_state(cfg, model, jax.random.PRNGKey(cfg.train.seed))
    start_step = 0
    if args.resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}")
    else:
        if latest_step(ckpt_dir) is not None:
            print("fresh run: clearing stale checkpoints "
                  "(pass --resume to continue them)")
            clear_checkpoints(ckpt_dir)
        if cfg.train.pretrained:
            # Reference workflow: start from pretrained FlowNet weights,
            # re-init whatever doesn't fit (new heads, extra channels).
            from deepim_tpu.train.checkpoint import (
                merge_pretrained, restore_params_raw,
            )

            src = restore_params_raw(cfg.train.pretrained,
                                     cfg.train.pretrained_step or None)
            merged, _ = merge_pretrained(
                state.params, src, reinit=tuple(cfg.train.pretrained_reinit))
            state = state._replace(params=merged)
            print(f"pretrained init from {cfg.train.pretrained}")

    d = cfg.dataset
    k_cam = make_intrinsics(d.fx, d.fy, d.cx, d.cy)
    syn_step = make_synthetic_train_step(model, assets, cfg, k_cam,
                                         mesh=mesh)
    syn_step_coarse = None
    if cfg.train.coarse_fraction > 0:
        # Mixed-resolution training: some steps run the whole synthesize+
        # train step at the coarse crop size, so the shared flatten head
        # (models.flownet head_grid) also sees coarse-resolution features
        # — required for the coarse-to-fine eval schedule.
        import dataclasses

        nw = cfg.network
        cfg_c = dataclasses.replace(cfg, network=dataclasses.replace(
            nw,
            input_height=nw.coarse_height or nw.input_height // 2,
            input_width=nw.coarse_width or nw.input_width // 2,
        ))
        syn_step_coarse = make_synthetic_train_step(model, assets, cfg_c,
                                                    k_cam, mesh=mesh)
    batcher = disk_step = None
    if d.name.startswith("lm6d") or d.name == "ycb":
        # On-disk training (reference TrainDataLoader flow): shuffled
        # frame batches + per-step perturbed src poses, mixed with
        # in-graph synthetic steps per cfg.train.syn_fraction.
        import jax.numpy as jnp

        from deepim_tpu.data.lm6d import LM6DDataset, TrainBatcher
        from deepim_tpu.data.pairs import perturb_poses
        from deepim_tpu.train import make_train_step

        from deepim_tpu.parallel import process_local_batch_size

        ds_disk = LM6DDataset(d.root, names)
        # Multi-host: each process loads its own roidb shard and feeds its
        # local slice of the global batch (single process: no-op).
        batcher = TrainBatcher(ds_disk, names,
                               process_local_batch_size(cfg.train.batch_size),
                               seed=cfg.train.seed,
                               num_shards=jax.process_count(),
                               shard_index=jax.process_index())
        disk_step = make_train_step(model, assets, cfg, mesh=mesh)
        print(f"on-disk training: {batcher.num_records} frames, "
              f"syn_fraction={cfg.train.syn_fraction}")

        def run_disk_step(state, sub):
            t = cfg.train
            b = batcher.next()
            pose_tgt = jnp.asarray(b["pose_tgt"])
            pose_src = perturb_poses(
                sub, pose_tgt, rot_std_deg=t.rot_noise_deg,
                rot_max_deg=t.rot_noise_max_deg, trans_std=t.trans_noise,
                trans_max=t.trans_noise_max,
            )
            batch = {
                "obs_rgb": jnp.asarray(b["obs_rgb"]),
                "obs_depth": jnp.asarray(b["obs_depth"]),
                "obs_mask": jnp.asarray(b["obs_mask"]),
                "pose_src": pose_src,
                "pose_tgt": pose_tgt,
                "k": jnp.tile(jnp.asarray(k_cam)[None],
                              (pose_tgt.shape[0], 1, 1)),
                "class_idx": jnp.asarray(b["class_idx"]),
            }
            return disk_step(state, batch)

    def frac_hit(frac, it):
        # Deterministic interleave at a configured fraction (host-side
        # counter: reading state.step would sync every step).
        return (int(frac * (it + 1)) - int(frac * it)) == 1

    def step_fn(state, sub, it):
        if batcher is not None and not frac_hit(cfg.train.syn_fraction, it):
            return run_disk_step(state, sub)
        if syn_step_coarse is not None and \
                frac_hit(cfg.train.coarse_fraction, it):
            return syn_step_coarse(state, sub)
        return syn_step(state, sub)

    key = jax.random.PRNGKey(cfg.train.seed + 1)
    t_last = time.time()
    log_path = os.path.join(out_dir, "train_log.jsonl")
    with open(log_path, "a") as logf:
        for it in range(start_step, cfg.train.num_steps):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, it)
            if (it + 1) % cfg.train.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                sps = cfg.train.log_every / dt
                t_last = time.time()
                # Speedometer-style line (reference core/callback.py).
                print(f"step {it + 1}/{cfg.train.num_steps} "
                      f"loss={metrics['loss']:.5f} "
                      f"rot={metrics['rot_err_deg_0']:.2f}deg "
                      f"trans={metrics['trans_err_0'] * 100:.2f}cm "
                      f"({sps * cfg.train.batch_size:.1f} samples/s)",
                      flush=True)
                logf.write(json.dumps({"step": it + 1, **metrics}) + "\n")
                logf.flush()
            if (it + 1) % cfg.train.checkpoint_every == 0 or \
                    it + 1 == cfg.train.num_steps:
                save_checkpoint(ckpt_dir, state)
    print(f"done; checkpoints in {ckpt_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
