from .trainer import Run3D, make_train_state, make_step_fns
from .metrics import MetricLogger

__all__ = ["Run3D", "make_train_state", "make_step_fns", "MetricLogger"]
