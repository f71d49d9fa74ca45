"""Fused data ops: dynamic zoom (crop/resize), resampling, flow ground truth.

TPU-native equivalents of the reference's MXNet CustomOps
(``deepim/operator_py/zoom_*.py``) and host flow computation
(``lib/pair_matching/flow.py``) — all pure XLA, zero host round-trips.
"""

from deepim_tpu.ops.resample import (
    affine_grid,
    bilinear_sample,
    nearest_sample,
    resample_affine,
)
from deepim_tpu.ops.zoom import (
    ZoomBox,
    model_corners,
    compute_zoom_box,
    zoom_intrinsics,
    zoom_image,
    zoom_flow,
    unzoom_points,
)
from deepim_tpu.ops.flow_gt import calc_flow
