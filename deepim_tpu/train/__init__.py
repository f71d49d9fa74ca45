"""Training runtime: loss assembly, optimizer, jitted/sharded train steps,
checkpointing.

Behavioral parity target: ``deepim/core/module.py §MutableModule.fit``,
``DataParallelExecutorGroup``, and the loss wiring of
``deepim/symbols/deepim_flownet*.py`` (mx-DeepIM).
"""

from deepim_tpu.train.train import (
    TrainState,
    compute_losses,
    init_state,
    make_lr_schedule,
    make_model,
    make_optimizer,
    make_synthetic_train_step,
    make_train_step,
)
