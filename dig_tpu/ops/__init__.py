"""Hot graph ops: segment reductions, gather/scatter message passing,
radius-graph construction, triplet/torsion index building, basis functions.

XLA implementations are the reference semantics. Pallas TPU kernels back
two hot paths: the fused dense cfconv (``pallas_cfconv.py``) and the
sorted-CSR segment-sum/SpMM (``pallas_segment.py``, opt-in via the
models' ``segment_eb`` attribute / ``segment_sum_sorted``; off-TPU both
fall back to the XLA path so tests run everywhere).
"""
from .segment import (
    segment_sum,
    segment_sum_sorted,
    segment_mean,
    segment_max,
    segment_min,
    segment_softmax,
    segment_normalize,
    segment_argmin,
)
from .scatter import gather, scatter_sum_edges, coalesce_mean
from .radius import radius_graph_flat, knn_graph_flat, radius_overflow
from .triplets import build_triplets, triplet_geometry, torsion_angles

__all__ = [
    "segment_sum", "segment_mean", "segment_max", "segment_min",
    "segment_softmax", "segment_normalize", "segment_argmin",
    "gather", "scatter_sum_edges", "coalesce_mean",
    "radius_graph_flat", "knn_graph_flat", "radius_overflow",
    "build_triplets", "triplet_geometry", "torsion_angles",
]
