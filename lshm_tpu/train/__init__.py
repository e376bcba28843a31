from lshm_tpu.train.objective import LossWeights, cascade_objective, dual_update
from lshm_tpu.train.step import (
    TrainState,
    LBFGSTrainState,
    make_train_step,
    init_train_state,
    make_lbfgs_train_step,
    init_lbfgs_train_state,
)
from lshm_tpu.train.schedule import group_mask, ramp_stage_for_epoch
from lshm_tpu.train.parallel import make_mesh, shard_batch, train_step_sharded

__all__ = [
    "LossWeights",
    "cascade_objective",
    "dual_update",
    "TrainState",
    "LBFGSTrainState",
    "make_train_step",
    "init_train_state",
    "make_lbfgs_train_step",
    "init_lbfgs_train_state",
    "group_mask",
    "ramp_stage_for_epoch",
    "make_mesh",
    "shard_batch",
    "train_step_sharded",
]
