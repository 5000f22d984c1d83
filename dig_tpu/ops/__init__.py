"""Hot graph ops: segment reductions, gather/scatter message passing,
radius-graph construction, triplet/torsion index building, basis functions.

XLA implementations are the reference semantics. Pallas TPU kernels back
three hot paths: the fused dense cfconv (``pallas_cfconv.py``), the
sorted-CSR segment-sum/SpMM (``pallas_segment.py``, opt-in via the
models' ``segment_eb`` attribute / ``segment_sum_sorted`` /
``spmm_bidir_csr``), and the fused triplet interaction
(``pallas_triplet.py``, ``SphereNet(pallas_triplet=True)``); off-TPU all
fall back to the XLA path / interpret mode so tests run everywhere.
Periodic-boundary radius graphs live in ``pbc.py``.
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
    spmm_bidir_csr,
)
from .scatter import gather, scatter_sum_edges, coalesce_mean
from .radius import (radius_graph_flat, knn_graph_flat, radius_overflow,
                     radius_graph_nk, radius_graph_nk_blocked,
                     radius_blocked_dropped)
from .triplets import (build_triplets, build_triplets_nk, nk_edge_distances,
                       nk_gather_nodes, triplet_geometry, torsion_angles,
                       triplet_kj_distances)
from .pbc import radius_graph_pbc_flat, pbc_overflow
from .pallas_triplet import fused_angle_product, fused_triplet_product

__all__ = [
    "segment_sum", "segment_sum_sorted", "segment_mean", "segment_max",
    "segment_min", "segment_softmax", "segment_normalize", "segment_argmin",
    "spmm_bidir_csr",
    "gather", "scatter_sum_edges", "coalesce_mean",
    "radius_graph_flat", "knn_graph_flat", "radius_overflow",
    "radius_graph_nk", "radius_graph_nk_blocked", "radius_blocked_dropped",
    "build_triplets", "build_triplets_nk", "nk_edge_distances",
    "nk_gather_nodes", "triplet_geometry",
    "torsion_angles", "triplet_kj_distances",
    "radius_graph_pbc_flat", "pbc_overflow",
    "fused_angle_product", "fused_triplet_product",
]
