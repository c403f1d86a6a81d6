from odc_tpu.train.trainer import Trainer, TrainState, make_train_step
from odc_tpu.train.schedule import StagedSchedule
from odc_tpu.train import checkpoint

__all__ = [
    "Trainer",
    "TrainState",
    "make_train_step",
    "StagedSchedule",
    "checkpoint",
]
