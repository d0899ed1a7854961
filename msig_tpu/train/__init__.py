"""Training runtime: fused step, schedules, state, trainer loop, checkpoints."""

from msig_tpu.train.schedule import (  # noqa: F401
    WEIGHT_KEYS,
    cosine_lr,
    current_loss_weights,
    loss_weight_factor,
    weights_vector,
)
from msig_tpu.train.state import (  # noqa: F401
    Models,
    TrainState,
    create_train_state,
    make_optimizers,
    param_count,
)
from msig_tpu.train.step import make_train_step, prepare_images  # noqa: F401
