"""3D molecular GNN task module (parity with ``dig/threedgraph``)."""
from .evaluation import ThreeDEvaluator
from ..train.trainer import Run3D
from ..train.trainer import Run3D as run  # reference exposes class `run`

__all__ = ["ThreeDEvaluator", "Run3D", "run"]
