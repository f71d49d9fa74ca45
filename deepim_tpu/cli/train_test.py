"""Combined driver: ``python -m deepim_tpu.cli.train_test --cfg <yaml>``.

Rebuild of the reference's primary entry point
(``experiments/deepim/deepim_train_test.py``): run the full training
schedule, then immediately evaluate the final checkpoint with the
K-iteration refinement and print the ADD(-S)/(5°,5cm)/Proj-2D tables.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Train, then evaluate (reference deepim_train_test.py)")
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("--n-devices", type=int, default=0,
                   help="cap data-parallel devices (0 = all)")
    p.add_argument("--num-steps", type=int, default=0,
                   help="override cfg.train.num_steps")
    p.add_argument("--resume", action="store_true",
                   help="resume training from the latest checkpoint")
    p.add_argument("--num-samples", type=int, default=0,
                   help="eval set size for synthetic configs (0 = default)")
    p.add_argument("--vis", type=int, default=0,
                   help="dump overlay montages for the first N eval samples")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from deepim_tpu.cli import test as cli_test
    from deepim_tpu.cli import train as cli_train

    train_argv = ["--cfg", args.cfg]
    if args.n_devices:
        train_argv += ["--n-devices", str(args.n_devices)]
    if args.num_steps:
        train_argv += ["--num-steps", str(args.num_steps)]
    if args.resume:
        train_argv.append("--resume")
    rc = cli_train.main(train_argv)
    if rc:
        return rc

    test_argv = ["--cfg", args.cfg]
    if args.num_samples:
        test_argv += ["--num-samples", str(args.num_samples)]
    if args.vis:
        test_argv += ["--vis", str(args.vis)]
    return cli_test.main(test_argv)


if __name__ == "__main__":
    raise SystemExit(main())
