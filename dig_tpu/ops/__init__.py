"""Hot graph ops: segment reductions, gather/scatter message passing,
radius-graph construction, triplet/torsion index building, basis functions.

XLA implementations are the reference semantics; Pallas TPU kernels (in
``pallas_segment.py``) accelerate the CSR-sorted aggregation path and are
dispatched automatically on TPU backends for shapes where they win.
"""
from .segment import (
    segment_sum,
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
