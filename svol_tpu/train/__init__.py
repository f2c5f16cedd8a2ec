from svol_tpu.train.state import TrainState, create_train_state, make_lr_schedule
from svol_tpu.train.steps import (
    make_accum_train_step,
    make_eval_step,
    make_multi_train_step,
    make_predict_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "make_train_step",
    "make_multi_train_step",
    "make_accum_train_step",
    "make_eval_step",
    "make_predict_step",
]
