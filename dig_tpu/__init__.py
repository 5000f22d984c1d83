"""dig_tpu — a TPU-native graph deep learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the research capabilities of
divelab/DIG: 3D molecular GNNs, contrastive SSL, molecular graph generation,
explainability, OOD/fairness/augmentation datasets and methods, and a
scalable-GNN path with graph partitioning + halo exchange over device
meshes.

Layering (SURVEY.md §7):
  graph / graph_dense   static-shape padded graph batches (pytree)
  ops                   segment/scatter kernels, radius graph, triplets, basis
  nn                    shared network building blocks + inits
  models                model zoo (SchNet, DimeNet++, SphereNet, GIN, ...)
  train                 jitted trainer, checkpointing, metrics
  datasets              loaders (downloaded caches or synthetic fallback)
  parallel              mesh/sharding, partitioning, halo exchange
  threed/ssl/ggraph/... task modules mirroring DIG's capability surface
"""

__version__ = "0.1.0"

from . import graph, graph_dense, ops

__all__ = ["graph", "graph_dense", "ops", "__version__"]
