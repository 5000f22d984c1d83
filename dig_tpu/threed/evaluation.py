"""3D task evaluator: MAE over a y_true/y_pred dict — same ``eval`` contract
as ``dig/threedgraph/evaluation/eval.py:4-34``."""
from __future__ import annotations

from typing import Dict

import numpy as np


class ThreeDEvaluator:
    def eval(self, input_dict: Dict) -> Dict[str, float]:
        y_true = np.asarray(input_dict["y_true"])
        y_pred = np.asarray(input_dict["y_pred"])
        if y_true.shape != y_pred.shape:
            raise ValueError(
                f"shape mismatch: y_true {y_true.shape} vs y_pred {y_pred.shape}")
        return {"mae": float(np.mean(np.abs(y_pred - y_true)))}
