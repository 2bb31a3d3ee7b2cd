from i2pnet_tpu.train.state import TrainState, create_train_state, make_optimizer
from i2pnet_tpu.train.step import (
    make_accum_train_step,
    make_train_step,
    make_eval_step,
    make_train_step_proj,
    make_eval_step_proj,
)
