from disn_tpu.train.trainer import (  # noqa: F401
    TrainState, create_state, make_train_step, make_cam_train_step,
    to_model_batch, lr_schedule,
)
from disn_tpu.train import checkpoint  # noqa: F401
