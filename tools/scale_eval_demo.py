"""Real-dataset-scale eval demonstration (VERDICT r1 #1 done-criterion).

Generates an LM6d-layout test set of N frames (default 10,016) — synthetic
observation PNGs written straight from numpy so generation is IO-bound,
with real GT pose files — then runs the STREAMED eval path
(``cli.test --no-refine``) over it with 3,000 metric points and prints
peak host RSS.  The point being demonstrated: neither the frames nor the
ADD-S distance matrices ever materialize whole (a 13k-frame 480x640 f32
set is ~48 GB; the un-tiled ADD-S matrices ~470 GB), so the eval's memory
stays bounded and independent of N.

Usage:
    python tools/scale_eval_demo.py [--frames 10016] [--height 64]
        [--width 128] [--root /tmp/scale_lm6d] [--refine] [--keep]

``--refine`` runs the full K-iteration refinement instead of
--no-refine (slower; use on the TPU).  Numbers-equality vs the one-shot
metric path is covered by tests/test_eval_data.py's parity tests; this
script is the scale/memory half of the criterion.
"""

from __future__ import annotations

import argparse
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepim_tpu.utils.platform import respect_platform_env

respect_platform_env()

import numpy as np


def gen_noise_dataset(root: str, num_frames: int, hw: tuple[int, int],
                      objects=("box", "icosphere")) -> None:
    """LM6d-layout test set with numpy-generated observations.

    Frames are noise + a bright object-colored disk at the projected
    object center (enough signal for --vis sanity, none needed for the
    streaming/memory demonstration); poses/labels/depths are real files
    in the exact layout so the whole reader stack runs.
    """
    from deepim_tpu.data.lm6d import LM6DDataset
    from deepim_tpu.raster.mesh import box_mesh, icosphere_mesh

    h, w = hw
    ds = LM6DDataset(root, list(objects))
    meshes = {"box": box_mesh((0.08, 0.1, 0.06)),
              "icosphere": icosphere_mesh(0.05)}
    for o in objects:
        ds.write_model(o, meshes[o])
    rng = np.random.RandomState(0)
    frames_per_obj = num_frames // len(objects)
    t0 = time.time()
    for ci, obj in enumerate(objects):
        frame_ids = []
        scene = f"{ci:02d}"
        for i in range(frames_per_obj):
            fid = f"{i:06d}"
            z = 0.6 + 0.3 * rng.rand()
            ang = rng.rand() * 2 * np.pi
            c, s = np.cos(ang), np.sin(ang)
            pose = np.asarray(
                [[c, -s, 0, 0.02 * rng.randn()],
                 [s, c, 0, 0.02 * rng.randn()],
                 [0, 0, 1, z]], np.float32)
            rgb = rng.rand(h, w, 3).astype(np.float32) * 0.3
            depth = np.zeros((h, w), np.float32)
            label = np.zeros((h, w), np.uint8)
            yy, xx = np.mgrid[:h, :w]
            cx, cy = w // 2, h // 2
            disk = (xx - cx) ** 2 + (yy - cy) ** 2 < (h // 4) ** 2
            rgb[disk] = (0.9, 0.5, 0.2)
            depth[disk] = z
            label[disk] = ci + 1
            ds.write_frame(scene, fid, rgb, depth, label, {obj: pose})
            frame_ids.append((scene, fid))
        ds.write_image_set(obj, "test", frame_ids)
    print(f"generated {num_frames} frames in {time.time() - t0:.1f}s "
          f"under {root}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10016)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--root", default="/tmp/scale_lm6d")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--refine", action="store_true",
                    help="full refinement instead of --no-refine")
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated dataset on disk")
    args = ap.parse_args()

    import yaml

    if not os.path.exists(os.path.join(args.root, "image_set")):
        gen_noise_dataset(args.root, args.frames,
                          (args.height, args.width))

    cfg = {
        "experiment": "scale_eval",
        "output_dir": os.path.join(args.root, "_out"),
        "network": {"input_height": args.height, "input_width": args.width,
                    "dtype": "float32", "fc_dim": 32,
                    "with_flow": False, "with_mask": False},
        "dataset": {"name": "lm6d", "root": args.root,
                    "objects": ["box", "icosphere"],
                    "image_height": args.height, "image_width": args.width,
                    "fx": 120.0, "fy": 120.0,
                    "cx": args.width / 2.0, "cy": args.height / 2.0,
                    "num_points": 3000},
        "test": {"test_iter": 2, "batch_size": args.batch_size,
                 "renderer": "pallas", "init": "perturb"},
        "train": {"rot_noise_deg": 15.0, "trans_noise": [0.01, 0.01, 0.05]},
    }
    cfg_path = os.path.join(args.root, "scale_eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from deepim_tpu.cli import test as cli_test

    t0 = time.time()
    argv = ["--cfg", cfg_path]
    if not args.refine:
        argv.append("--no-refine")
    rc = cli_test.main(argv)
    dt = time.time() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"streamed eval over {args.frames} frames x 3000 points: "
          f"{dt:.1f}s, peak host RSS {peak_gb:.2f} GB "
          f"(whole-set f32 frames alone would be "
          f"{args.frames * args.height * args.width * 3 * 4 / 1e9:.1f} GB)")
    if not args.keep:
        shutil.rmtree(args.root, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
