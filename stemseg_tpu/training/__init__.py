from stemseg_tpu.training.optim import (  # noqa: F401
    make_lr_schedule,
    make_optimizer,
    param_freeze_labels,
)
from stemseg_tpu.training.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    prepare_targets,
)
