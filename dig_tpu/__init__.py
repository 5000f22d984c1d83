"""dig_tpu — a TPU-native graph deep learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the research capabilities of
divelab/DIG: 3D molecular GNNs, contrastive SSL, molecular graph
generation (2D + 3D), explainability, OOD/fairness/augmentation methods,
and a scalable-GNN path with graph partitioning + halo exchange over
device meshes.

Layering (SURVEY.md §7):
  graph / graph_dense   static-shape padded graph batches (pytree)
  ops                   segment/scatter kernels, radius graph, triplets,
                        basis functions, Pallas cfconv
  nn                    shared network building blocks + inits
  models                3D model zoo (SchNet[,Dense], DimeNet++, SphereNet,
                        ComENet, ProNet)
  train                 jitted trainer, checkpointing, metrics
  parallel              mesh/sharding, partitioning, halo exchange
  native                C++ host tools (partitioner, relabel)
  chem                  RDKit-free chemistry kernel
  datasets              loaders (cached downloads or synthetic fallback)
  config                unified config tree
  threed/ssl/ggraph/ggraph3d/xgraph/oodgraph/auggraph/fairgraph/lsgraph
                        task modules mirroring DIG's capability surface
"""

__version__ = "0.2.0"

from . import graph, graph_dense, ops
from .config import Config

__all__ = ["graph", "graph_dense", "ops", "Config", "__version__"]
