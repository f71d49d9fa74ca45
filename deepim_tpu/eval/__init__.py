"""Evaluation: ADD(-S)/(5°,5cm)/Proj-2D/AUC tables.

Behavioral parity target: the ``evaluate_pose`` methods of the reference's
dataset classes (``lib/dataset/LM6d_*.py``, YCB/ModelNet variants).
"""

from deepim_tpu.eval.bop_results import read_bop_csv, write_bop_csv
from deepim_tpu.eval.evaluator import (
    EvalThresholds,
    compute_pose_errors,
    evaluate_poses,
    format_table,
)
