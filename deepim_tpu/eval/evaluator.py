"""Pose evaluation: ADD(-S) @ 0.1d, (5°, 5cm), Proj-2D @ 5px, AUC tables.

Rebuild of the reference's per-dataset ``evaluate_pose`` methods
(``lib/dataset/LM6d_*.py`` etc.): given refined poses + GT, produce the
per-class accuracy tables the reference prints at the end of testing
(the de-facto regression surface — SURVEY.md §4).

Metric kernels run batched on device (one jit over all samples); only the
table formatting is host-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deepim_tpu.geometry.pose_errors import (
    add_auc,
    add_error,
    adds_error,
    proj2d_error,
    rot_error_deg,
    trans_error,
)
from deepim_tpu.refine.refiner import RenderAssets


@dataclass(frozen=True)
class EvalThresholds:
    """The standard 6D-pose thresholds used by the reference/paper."""

    add_frac: float = 0.1  # ADD < 0.1 * diameter
    rot_deg: float = 5.0  # (5°, 5 cm)
    trans_m: float = 0.05
    proj_px: float = 5.0  # Proj-2D < 5 px
    auc_max_m: float = 0.1  # YCB AUC threshold range


PROPORTION_METRICS = ("add(-s)_0.1d", "add_0.1d", "adds_0.1d",
                      "5deg_5cm", "proj2d_5px")


def wilson_ci(p_pct: float, n: int, z: float = 1.96) -> tuple[float, float]:
    """95% Wilson score interval for a success proportion, in percent.

    Every accuracy in the reference's tables is a binomial proportion, so
    its sampling noise is knowable from (p, n) alone — and at the n=512
    evals of earlier rounds the ±3-4 pt interval exceeded several deltas
    that were published as wins.  Tables therefore carry this interval.
    Wilson rather than normal approximation: behaves at p near 0/100 and
    small n (a 100% @ n=64 reads ±5.7, not ±0).
    """
    if n <= 0:
        return (float("nan"), float("nan"))
    p = min(max(p_pct / 100.0, 0.0), 1.0)
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    hw = (z * np.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / denom
    return (max(0.0, center - hw) * 100, min(1.0, center + hw) * 100)


def ci_halfwidth(p_pct: float, n: int, z: float = 1.96) -> float:
    """Max deviation of the Wilson CI from the point estimate (pct pts)."""
    lo, hi = wilson_ci(p_pct, n, z)
    return float(max(p_pct - lo, hi - p_pct))


def macro_mean_halfwidth(rows: list[dict], key: str, z: float = 1.96) -> float:
    """95% half-width of the macro (per-class) mean of a proportion metric.

    Classes are independent eval sets, so var(mean) = Σ p_i(1-p_i)/n_i / C²
    (normal approximation; fine at the aggregate n this is used for).
    """
    if not rows:
        return float("nan")
    var = 0.0
    for r in rows:
        p = min(max(r[key] / 100.0, 0.0), 1.0)
        n = max(int(r["n"]), 1)
        var += p * (1 - p) / n
    return float(z * np.sqrt(var) / len(rows) * 100)


@partial(jax.jit, static_argnames=("point_block",))
def compute_pose_errors(
    points: jax.Array,  # (B, N, 3) per-sample model points
    sym_poses: jax.Array,  # (B, S, 3, 4) symmetry sets (identity-padded)
    pose_est: jax.Array,  # (B, 3, 4)
    pose_gt: jax.Array,  # (B, 3, 4)
    k: jax.Array,  # (B, 3, 3)
    point_block: int | None = None,
) -> dict[str, jax.Array]:
    """All per-sample error measures in one jitted pass -> dict of (B,).

    ``add_sym`` is min-over-symmetry ADD (the discrete-symmetry analogue
    the PM loss trains against); ``adds`` is nearest-point ADD-S.
    ``point_block`` tiles the ADD-S pairwise matrix over estimated-point
    blocks (see :func:`adds_error`) to bound memory at batch scale.
    """
    from deepim_tpu.geometry.se3 import se3_mul

    add = add_error(points, pose_est, pose_gt)
    adds = adds_error(points, pose_est, pose_gt, point_block=point_block)
    gt_syms = se3_mul(pose_gt[:, None], sym_poses)  # (B, S, 3, 4)
    add_sym = jnp.min(
        jax.vmap(lambda pg: add_error(points, pose_est, pg),
                 in_axes=1, out_axes=1)(gt_syms),
        axis=1,
    )
    return {
        "add": add,
        "adds": adds,
        "add_sym": add_sym,
        "rot_deg": rot_error_deg(pose_est, pose_gt),
        "trans_m": trans_error(pose_est, pose_gt),
        "proj2d_px": proj2d_error(points, pose_est, pose_gt, k),
    }


def evaluate_poses(
    assets: RenderAssets,
    class_names: list[str],
    symmetric: list[bool],
    pose_est: np.ndarray,  # (B, 3, 4)
    pose_gt: np.ndarray,
    class_idx: np.ndarray,  # (B,)
    k: np.ndarray,  # (B, 3, 3)
    thresholds: EvalThresholds = EvalThresholds(),
    chunk: int = 256,
    point_block: int = 512,
) -> dict:
    """Per-class + mean metric table (reference ``evaluate_pose`` output).

    Symmetric classes are scored with ADD-S (reference protocol); the
    headline 'ADD(-S)' row mixes the two accordingly.

    The metric kernels run on fixed-size sample chunks (last chunk padded,
    padding dropped host-side) with the ADD-S matrix tiled over
    ``point_block`` estimated points, so a real-dataset-scale eval (10k+
    frames x 3000 points) runs in bounded device memory — at the defaults
    the live ADD-S block is chunk x N x point_block ≈ 1.6 GB — and compiles
    exactly one chunk shape.
    """
    from deepim_tpu.refine.refiner import gather_class

    b = int(np.asarray(pose_est).shape[0])
    chunk = min(chunk, b)
    parts: list[dict[str, np.ndarray]] = []
    for i in range(0, b, chunk):
        sl = slice(i, min(i + chunk, b))
        size = sl.stop - sl.start
        pad = chunk - size

        def _take(x):
            x = np.asarray(x)[sl]
            if pad:  # repeat the last row: one compiled chunk shape
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            return jnp.asarray(x)

        ab = gather_class(assets, _take(class_idx))
        out = compute_pose_errors(
            ab.points, ab.sym_poses, _take(pose_est), _take(pose_gt),
            _take(k), point_block=point_block,
        )
        parts.append({kk: np.asarray(v)[:size] for kk, v in out.items()})
    errs = {kk: np.concatenate([p[kk] for p in parts]) for kk in parts[0]}
    diam = np.asarray(assets.diameters)

    per_class = {}
    all_rows = []
    for ci, name in enumerate(class_names):
        m = np.asarray(class_idx) == ci
        n = int(m.sum())
        if n == 0:
            continue
        add_like = errs["adds"][m] if symmetric[ci] else errs["add"][m]
        thresh = thresholds.add_frac * diam[ci]
        row = {
            "n": n,
            "add(-s)_0.1d": float((add_like < thresh).mean() * 100),
            "add_0.1d": float((errs["add"][m] < thresh).mean() * 100),
            "adds_0.1d": float((errs["adds"][m] < thresh).mean() * 100),
            "5deg_5cm": float(
                ((errs["rot_deg"][m] < thresholds.rot_deg)
                 & (errs["trans_m"][m] < thresholds.trans_m)).mean() * 100
            ),
            "proj2d_5px": float(
                (errs["proj2d_px"][m] < thresholds.proj_px).mean() * 100
            ),
            "auc_add(-s)": float(
                add_auc(jnp.asarray(add_like), thresholds.auc_max_m) * 100
            ),
            "mean_add_m": float(add_like.mean()),
            "mean_rot_deg": float(errs["rot_deg"][m].mean()),
            "mean_trans_m": float(errs["trans_m"][m].mean()),
        }
        row["ci95"] = {kk: round(ci_halfwidth(row[kk], n), 2)
                       for kk in PROPORTION_METRICS}
        per_class[name] = row
        all_rows.append(row)

    mean = {
        kk: float(np.mean([r[kk] for r in all_rows]))
        for kk in all_rows[0]
        if kk not in ("n", "ci95")
    } if all_rows else {}
    if mean:
        mean["ci95"] = {kk: round(macro_mean_halfwidth(all_rows, kk), 2)
                        for kk in PROPORTION_METRICS}
    return {"per_class": per_class, "mean": mean,
            "num_samples": int(len(class_idx))}


def format_table(results: dict, title: str = "Pose evaluation") -> str:
    """Plain-text table in the reference's eval-log style.

    Proportion columns print as value±hw (95% Wilson CI half-width) so a
    reader can judge every delta against its own noise floor.
    """
    cols = ["add(-s)_0.1d", "5deg_5cm", "proj2d_5px", "auc_add(-s)",
            "mean_rot_deg", "mean_trans_m"]

    def cell(row, c):
        hw = row.get("ci95", {}).get(c)
        if hw is not None and hw == hw:
            return f"{row[c]:.2f}±{hw:.2f}"
        return f"{row[c]:.2f}"

    lines = [title, "=" * len(title)]
    header = f"{'class':<16}" + "".join(f"{c:>14}" for c in cols) + f"{'n':>8}"
    lines.append(header)
    lines.append("-" * len(header))
    for name, row in results["per_class"].items():
        lines.append(
            f"{name:<16}"
            + "".join(f"{cell(row, c):>14}" for c in cols)
            + f"{row['n']:>8d}"
        )
    if results["mean"]:
        lines.append("-" * len(header))
        lines.append(
            f"{'MEAN':<16}"
            + "".join(f"{cell(results['mean'], c):>14}" for c in cols)
            + f"{results['num_samples']:>8d}"
        )
    return "\n".join(lines)
