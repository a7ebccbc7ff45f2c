from .losses import WeightedL2Loss, WeightedL2Loss2d
from .schedule import onecycle_schedule
from .trainer import run_train, TrainResult

__all__ = ["WeightedL2Loss", "WeightedL2Loss2d", "onecycle_schedule",
           "run_train", "TrainResult"]
