"""Utilities: profiling/tracing, logging, visualization.

Behavioral parity targets: ``deepim/core/callback.py §Speedometer``,
``lib/utils/print_and_log.py``, ``lib/utils`` flow/mask visualization
(mx-DeepIM) — plus xprof tracing and structured metrics the reference
lacked.
"""

from deepim_tpu.utils.logging import MetricsLogger, PrintAndLog, mkdir_if_missing
from deepim_tpu.utils.profiling import Speedometer, StageTimer, stage, trace
from deepim_tpu.utils.viz import (
    flow_to_rgb,
    mask_to_rgb,
    overlay_render,
    save_image,
    side_by_side,
)
