"""Aggregate seed-variance eval runs -> mean ± σ per metric.

    python tools/seed_variance.py output/occlusion_small_seed3 \
        output/occlusion_small_seed4 output/occlusion_small_seed5

Reads each run's ``eval_results.json`` (written by ``cli.test``) and
prints the cross-seed mean, sample σ, and range for the headline
metrics — the training-side noise floor that protocol deltas must clear
(round-3 VERDICT #1: two same-config 30k runs measured 4.3 ADD points
apart with nobody able to say why).
"""

from __future__ import annotations

import json
import math
import os
import sys


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("dirs", nargs="*", help="per-seed run output dirs")
    p.add_argument("--results-out", default="",
                   help="record the aggregate into this JSON "
                        "(committed results/ tree)")
    args = p.parse_args(argv)
    out_path = args.results_out
    dirs = args.dirs
    if len(dirs) < 2:
        print(__doc__)
        return 2
    metrics = ("add(-s)_0.1d", "5deg_5cm", "proj2d_5px", "auc_add(-s)")
    rows = []
    for d in dirs:
        path = os.path.join(d, "eval_results.json")
        with open(path) as f:
            res = json.load(f)
        rows.append((d, res["mean"], res.get("num_samples")))
    print(f"{'run':<36}" + "".join(f"{m:>14}" for m in metrics) + f"{'n':>7}")
    for d, m, n in rows:
        print(f"{os.path.basename(d.rstrip('/')):<36}"
              + "".join(f"{m[k]:>14.2f}" for k in metrics) + f"{n:>7}")
    print("-" * (36 + 14 * len(metrics) + 7))
    agg = {}
    for label, fn in (
        ("mean", lambda v: sum(v) / len(v)),
        ("sigma", lambda v: math.sqrt(
            sum((x - sum(v) / len(v)) ** 2 for x in v) / (len(v) - 1))),
        ("range", lambda v: max(v) - min(v)),
    ):
        vals = [fn([m[k] for _, m, _ in rows]) for k in metrics]
        agg[label] = dict(zip(metrics, vals))
        print(f"{label:<36}" + "".join(f"{v:>14.2f}" for v in vals))
    if out_path:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from deepim_tpu.utils.results import record_result

        record_result(out_path, {
            "runs": [{"dir": d, "mean": m, "n": n} for d, m, n in rows],
            **agg,
        }, experiment="seed_variance", argv=list(dirs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
