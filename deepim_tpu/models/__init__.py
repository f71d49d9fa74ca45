"""Network layer: FlowNetS-backbone DeepIM model (flow/mask/pose heads).

Behavioral parity target: ``deepim/symbols/deepim_flownet*.py §get_symbol``
in mx-DeepIM — rebuilt as a Flax module in NHWC/bfloat16 for the MXU.
"""

from deepim_tpu.models.flownet import (
    DeepIMFlowNet,
    FLOW_LEVELS,
    bottleneck_grid,
    decode_rot,
    network_input,
    select_class,
)
