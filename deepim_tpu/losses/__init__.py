"""Losses: point-matching (symmetry-aware), flow EPE pyramid, mask CE.

Behavioral parity target: ``deepim/operator_py/point_matching_loss.py`` and
the aux-loss wiring in ``deepim/symbols/deepim_flownet*.py`` (mx-DeepIM).
"""

from deepim_tpu.losses.losses import (
    FLOW_LEVEL_WEIGHTS,
    angle_trans_l1_loss,
    flow_epe_loss,
    mask_ce_loss,
    point_matching_loss,
)
