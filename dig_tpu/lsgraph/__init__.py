"""Large-scale / scalable GNN training — TPU-native rebuild of
``dig/lsgraph`` (SURVEY.md §2.9), the reference's only native-code module.

The reference trains GNNs on graphs too big for one device by METIS
partitioning + per-partition minibatches, with out-of-batch neighbor
embeddings served from a pinned-CPU *history* cache over async CUDA copies
(``GraphFMOB/{history.py,pool.py,csrc/}``). Here:

* partitioning & one-hop relabeling run in C++
  (``dig_tpu/native/partition.cpp``) with numpy fallbacks;
* histories are device-resident jnp tables updated *functionally* inside
  the jitted step (push = scatter of fresh in-batch embeddings, pull =
  gather for halo rows) — the role of AsyncIOPool's compute/IO overlap is
  played by XLA scheduling, and beyond-HBM tables shard over the mesh via
  ``dig_tpu.parallel.halo``;
* ``FeatureMomentum`` (GraphFM-OB) blends history with fresh boundary
  estimates exactly as ``dig/lsgraph/method/FM.py:67-70``.
"""
from .history import History, FeatureMomentum
from .loader import SubgraphLoader, EvalSubgraphLoader, metis_permute, SubData
from .models import ScalableGCN, ScalableGCN2, ScalablePNA, ScalableGNN
from .data import synthetic_large_graph, get_data
from .fm_ib import GraphFMIB, NeighborSampledLoader, NeighborBatch

__all__ = [
    "History", "FeatureMomentum",
    "SubgraphLoader", "EvalSubgraphLoader", "metis_permute", "SubData",
    "ScalableGNN", "ScalableGCN", "ScalableGCN2", "ScalablePNA",
    "synthetic_large_graph", "get_data",
    "GraphFMIB", "NeighborSampledLoader", "NeighborBatch",
]
