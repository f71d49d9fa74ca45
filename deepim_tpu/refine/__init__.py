"""The jitted render→zoom→CNN→compose refinement loop.

Behavioral parity target: ``deepim/core/tester.py §Predictor §pred_eval``
(mx-DeepIM) — the reference's host-driven per-iteration loop collapsed into
one on-device ``lax.scan``.
"""

from deepim_tpu.refine.refiner import (
    RenderAssets,
    build_assets,
    gather_class,
    refine_poses,
    refine_step,
    render_crops,
    render_scene,
)
from deepim_tpu.refine.hypotheses import refine_multi_hypothesis, score_poses
from deepim_tpu.refine.video import refine_video
