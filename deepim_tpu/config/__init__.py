"""Config system (dataclass defaults + YAML overlay).

Behavioral parity target: ``deepim/config/config.py §config §update_config``
(mx-DeepIM easydict tree + per-experiment YAML deep-merge).
"""

from deepim_tpu.config.config import (
    Config,
    DatasetConfig,
    NetworkConfig,
    TestConfig,
    TrainConfig,
    config_from_dict,
    save_config,
    update_config,
)
