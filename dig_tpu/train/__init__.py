from .debug import (assert_donation_discipline, collective_selfcheck,
                    debug_mode)
from .metrics import MetricLogger
from .profiling import StepProfiler, profile_block
from .trainer import Run3D, make_step_fns, make_train_state

__all__ = ["Run3D", "make_train_state", "make_step_fns", "MetricLogger",
           "StepProfiler", "profile_block", "debug_mode",
           "assert_donation_discipline", "collective_selfcheck"]
