"""Plot training curves from an experiment's train_log.jsonl.

Observability tooling on top of the structured metrics stream the
training CLI writes (the reference only had Speedometer console lines).
Small multiples, one panel per metric family, EMA-smoothed, PNG out.

Usage:
    python tools/plot_train.py output/<experiment>/train_log.jsonl \
        [--out output/<experiment>/train_curves.png] [--ema 0.9]
"""

from __future__ import annotations

import argparse
import json
import os

# Validated categorical palette (fixed order, never cycled) + ink tokens.
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
INK, INK2 = "#0b0b0b", "#52514e"
SURFACE, GRID = "#fcfcfb", "#e7e6e2"

PANELS = [
    ("total loss", ["loss"], True),
    ("point-matching loss", ["pm_loss_"], True),
    ("aux losses", ["flow_loss_", "mask_loss_"], True),
    ("rotation error (deg)", ["rot_err_deg_"], False),
    ("translation error (m)", ["trans_err_"], False),
    ("ADD (m)", ["add_"], False),
]


def load(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def ema(values, alpha: float):
    out, acc = [], None
    for v in values:
        acc = v if acc is None else alpha * acc + (1 - alpha) * v
        out.append(acc)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("log", help="path to train_log.jsonl")
    p.add_argument("--out", default="")
    p.add_argument("--ema", type=float, default=0.9,
                   help="EMA smoothing factor (0 = raw)")
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = load(args.log)
    if not recs:
        print("empty log")
        return 1
    steps = [r["step"] for r in recs]
    keys = sorted({k for r in recs for k in r} - {"step", "time"})

    fig, axes = plt.subplots(2, 3, figsize=(15, 7.5), dpi=110)
    fig.patch.set_facecolor(SURFACE)
    for ax, (title, prefixes, log_y) in zip(axes.flat, PANELS):
        ax.set_facecolor(SURFACE)
        cols = [k for k in keys
                if any(k == pre or k.startswith(pre) for pre in prefixes)]
        for ci, k in enumerate(sorted(cols)):
            ys = [r.get(k, float("nan")) for r in recs]
            ys = ema(ys, args.ema) if args.ema else ys
            color = SERIES[ci % len(SERIES)]
            ax.plot(steps, ys, color=color, lw=2, label=k)
            # selective direct label: final value at the line's end
            ax.annotate(f" {ys[-1]:.4g}", (steps[-1], ys[-1]), color=color,
                        fontsize=8, va="center")
        if not cols:
            ax.set_visible(False)
            continue
        if log_y:
            ax.set_yscale("log")
        if len(cols) > 1:
            ax.legend(fontsize=8, frameon=False, labelcolor=INK2)
        ax.set_title(title, color=INK, fontsize=11, loc="left")
        ax.grid(color=GRID, lw=0.8)
        ax.tick_params(colors=INK2, labelsize=8)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(GRID)
    axes.flat[-1].set_xlabel("step", color=INK2, fontsize=9)

    name = os.path.basename(os.path.dirname(os.path.abspath(args.log)))
    fig.suptitle(f"{name} — training curves", color=INK, x=0.01, ha="left",
                 fontsize=13)
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    out = args.out or os.path.join(os.path.dirname(args.log),
                                   "train_curves.png")
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out} ({len(recs)} log records, {len(keys)} metrics)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
