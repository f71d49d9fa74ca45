"""One-command asset-day workflow: detect -> convert -> validate -> eval.

    python tools/real_data_runbook.py <assets_root> \
        [--out <converted_root>] [--cfg <base.yaml>] [--weights w.npz] \
        [--objects ...] [--classes file] [--num-samples N] [--dry-run]

The day real LINEMOD/YCB assets are mounted, this replaces the manual
convert -> validate -> test chain (reference parity: the ``toolkit/``
prep scripts + test driver, SURVEY §2.6, run as one command):

1. **detect**  the drop's layout: already-converted LM6d / video layout,
   BOP/SIXD (``<split>/<scene>/scene_gt.json|gt.yml``), the original
   ACCV'12 LINEMOD release (``<obj>/data/color0.jpg`` + ``.rot/.tra``),
   or the original YCB-Video release (``data/<seq>/*-color.png`` +
   ``image_sets/keyframe.txt``).
2. **convert** source releases into the framework layout (skipped when
   the drop is already converted).
3. **validate** with the adversarial preflight (``data/validate.py``);
   ERROR findings stop the run (``--force`` overrides).
4. **weights** (optional): overlay a reference MXNet tensor dump
   (``.npz`` with ``arg:``/``aux:`` keys) onto the model and save it as
   a restorable checkpoint.
5. **eval** via ``cli.test`` on a derived config written next to the
   converted data.  Without a checkpoint the baseline ``--no-refine``
   eval still runs, proving the whole data path end-to-end.

``--dry-run`` performs detect+convert+validate and then prints the eval
invocation instead of running it (the CI exercise on procedural
stand-ins — no trained weights needed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def detect_release(root: str) -> str:
    """Layout of the asset drop (superset of ``validate.detect_format``:
    also recognizes the two *source* releases the converters consume)."""
    if os.path.isdir(os.path.join(root, "video_sets")):
        return "ycb_video"
    if os.path.isdir(os.path.join(root, "data", "observed")):
        return "lm6d"
    for split in ("test", "train", "val", "test_all", "train_pbr"):
        sd = os.path.join(root, split)
        if os.path.isdir(sd):
            for scene in sorted(os.listdir(sd)):
                s = os.path.join(sd, scene)
                if (os.path.exists(os.path.join(s, "scene_gt.json"))
                        or os.path.exists(os.path.join(s, "gt.yml"))):
                    return f"bop:{split}"
    if (os.path.isdir(os.path.join(root, "image_sets"))
            and os.path.isdir(os.path.join(root, "data"))):
        for seq in sorted(os.listdir(os.path.join(root, "data"))):
            sd = os.path.join(root, "data", seq)
            if os.path.isdir(sd) and any(
                    f.endswith("-color.png") for f in os.listdir(sd)):
                return "ycb_original"
    for obj in sorted(os.listdir(root)):
        od = os.path.join(root, obj, "data")
        if os.path.isdir(od) and any(
                f.startswith("rot") and f.endswith(".rot")
                for f in os.listdir(od)):
            return "lm_original"
    raise SystemExit(
        f"{root}: unrecognized layout — expected converted LM6d "
        "(data/observed/) or video (video_sets/), BOP/SIXD "
        "(<split>/<scene>/scene_gt.json|gt.yml), original LINEMOD "
        "(<obj>/data/rot*.rot), or original YCB (data/<seq>/*-color.png "
        "+ image_sets/)")


def bop_object_names(root: str, spec: str) -> dict[int, str]:
    """--objects 'id:name,...' if given, else models_info.json ids."""
    if spec:
        return {int(p.split(":")[0]): p.split(":")[1]
                for p in spec.split(",")}
    info = os.path.join(root, "models", "models_info.json")
    if not os.path.exists(info):
        raise SystemExit("BOP drop has no models/models_info.json; pass "
                         "--objects id:name,...")
    with open(info) as f:
        ids = sorted(int(k) for k in json.load(f))
    return {i: f"obj_{i:06d}" for i in ids}


def ycb_class_names(root: str, spec: str) -> list[str]:
    """--classes file if given, else the release's image_sets/classes.txt."""
    path = spec or os.path.join(root, "image_sets", "classes.txt")
    if not os.path.exists(path):
        raise SystemExit("original YCB drop needs the ordered class list: "
                         "pass --classes <file> (release ships "
                         "image_sets/classes.txt)")
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="asset-day runbook: detect/convert/validate/eval")
    p.add_argument("assets_root")
    p.add_argument("--out", default="",
                   help="converted-output root (default <assets_root>_converted"
                        " next to the drop; ignored for converted drops)")
    p.add_argument("--cfg", default="",
                   help="base experiment YAML for the eval (default: a "
                        "minimal config derived from the converted data)")
    p.add_argument("--weights", default="",
                   help="MXNet tensor dump (.npz, arg:/aux: keys) to "
                        "convert and save as the eval checkpoint")
    p.add_argument("--objects", default="", help="BOP id:name list")
    p.add_argument("--classes", default="", help="YCB ordered class file")
    p.add_argument("--split", default="test", help="BOP source split")
    p.add_argument("--num-samples", type=int, default=0)
    p.add_argument("--force", action="store_true",
                   help="continue past validation ERRORs")
    p.add_argument("--dry-run", action="store_true",
                   help="stop before the eval; print what would run")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from deepim_tpu.utils.platform import respect_platform_env

    respect_platform_env()

    root = os.path.abspath(args.assets_root)
    fmt = detect_release(root)
    print(f"[runbook] detected layout: {fmt}")

    # --- convert ----------------------------------------------------------
    out_root = root
    if fmt == "lm6d" or fmt == "ycb_video":
        print("[runbook] already converted; skipping conversion")
        data_fmt = fmt
    elif fmt.startswith("bop"):
        split = fmt.split(":", 1)[1] if ":" in fmt else args.split
        out_root = args.out or root.rstrip("/") + "_converted"
        from deepim_tpu.data.bop import convert_bop_split

        names = bop_object_names(root, args.objects)
        ds = convert_bop_split(root, split, out_root, names)
        print(f"[runbook] converted BOP '{split}' -> {out_root} "
              f"({len(ds.objects)} objects)")
        data_fmt = "lm6d"
    elif fmt == "lm_original":
        out_root = args.out or root.rstrip("/") + "_converted"
        from deepim_tpu.data.lm_original import convert_lm_original

        ds = convert_lm_original(root, out_root)
        print(f"[runbook] converted original LINEMOD -> {out_root} "
              f"({len(ds.objects)} objects)")
        data_fmt = "lm6d"
    else:  # ycb_original
        out_root = args.out or root.rstrip("/") + "_converted"
        from deepim_tpu.data.video import convert_ycb_original

        classes = ycb_class_names(root, args.classes)
        ds = convert_ycb_original(root, out_root, classes)
        print(f"[runbook] converted original YCB -> {out_root} "
              f"({len(ds.sequences())} sequences)")
        data_fmt = "ycb_video"

    # --- validate ---------------------------------------------------------
    from deepim_tpu.data.validate import format_findings, validate

    findings = validate(out_root, data_fmt)
    print(format_findings(findings))
    if any(f.level == "ERROR" for f in findings):
        if not args.force:
            print("[runbook] validation ERRORs — stopping (use --force "
                  "to eval anyway)")
            return 2
        print("[runbook] validation ERRORs overridden by --force")

    # --- derived eval config ---------------------------------------------
    from deepim_tpu.config import save_config, update_config
    from deepim_tpu.config.config import config_from_dict

    from deepim_tpu.data.lm6d import LM6DDataset

    objects = LM6DDataset.discover_objects(out_root)
    ds_name = "ycb_video" if data_fmt == "ycb_video" else "lm6d"
    if not objects:
        raise SystemExit(f"[runbook] no objects discovered under {out_root}")
    overrides = {
        "experiment": "real_data_runbook",
        "dataset": {"name": ds_name, "root": out_root,
                    "objects": list(objects)},
    }
    cfg = (update_config(args.cfg) if args.cfg else None)
    cfg = config_from_dict(overrides, base=cfg)
    cfg_path = os.path.join(cfg.output_dir, cfg.experiment, "config.yaml")
    os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
    save_config(cfg, cfg_path)
    print(f"[runbook] eval config -> {cfg_path}")

    # --- optional reference-weight conversion ----------------------------
    ckpt_dir = os.path.join(cfg.output_dir, cfg.experiment, "checkpoints")
    have_ckpt = False
    if args.weights:
        import jax

        from deepim_tpu.train import init_state, make_model
        from deepim_tpu.train.checkpoint import save_checkpoint
        from deepim_tpu.train.convert_mxnet import (
            convert_mxnet_dict, load_mxnet_npz,
        )

        model = make_model(cfg, len(objects))
        state = init_state(cfg, model, jax.random.PRNGKey(0))
        params, missing = convert_mxnet_dict(load_mxnet_npz(args.weights),
                                             state.params)
        if missing:
            print(f"[runbook] weights: {len(missing)} layers kept their "
                  f"init (first: {missing[:4]})")
        save_checkpoint(ckpt_dir, state._replace(params=params))
        have_ckpt = True
        print(f"[runbook] converted weights -> {ckpt_dir}")
    else:
        from deepim_tpu.train.checkpoint import latest_step

        have_ckpt = latest_step(ckpt_dir) is not None

    # --- eval -------------------------------------------------------------
    eval_argv = ["--cfg", cfg_path]
    if args.num_samples:
        eval_argv += ["--num-samples", str(args.num_samples)]
    if not have_ckpt:
        eval_argv += ["--no-refine"]
        print("[runbook] no checkpoint: running the --no-refine baseline "
              "eval (data path proof); train or pass --weights for the "
              "refined numbers")
    if args.dry_run:
        print("[runbook] dry run — would now run:\n  python -m "
              "deepim_tpu.cli.test " + " ".join(eval_argv))
        return 0
    from deepim_tpu.cli import test as cli_test

    return cli_test.main(eval_argv) or 0


if __name__ == "__main__":
    raise SystemExit(main())
