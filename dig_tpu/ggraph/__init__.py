"""Molecular graph generation — TPU-native rebuild of ``dig/ggraph``
(SURVEY.md §2.3).

* :mod:`generator` — the 3-task Generator ABC
  (``dig/ggraph/method/generator.py:1-52``).
* :mod:`models` — dense-tensor generative models: GraphDF (discrete flow),
  GraphAF (continuous masked flow), GraphEBM (Langevin EBM), shared RGCN.
* :mod:`methods` — train/run drivers for rand-gen / prop-opt /
  const-prop-opt.
* :mod:`dataset` — SMILES -> dense one-hot (x, adj) datasets with BFS
  ordering (``dig/ggraph/dataset/PygDataset.py:16-376``).
* :mod:`evaluation` — RandGen / PropOpt / ConstPropOpt evaluators
  (``dig/ggraph/evaluation/metric.py:7-163``).
* :mod:`environment` — chemical env utils (valency, validity, rewards;
  ``dig/ggraph/utils/environment.py``) on the dig_tpu chem kernel.
"""
from .generator import Generator
from .dataset import DenseMolDataset, DenseMolLoader, synthetic_smiles_dataset
from .evaluation import (RandGenEvaluator, PropOptEvaluator,
                         ConstPropOptEvaluator)
from .methods import GraphDF, GraphAF, GraphEBM
from .jtvae import JTVAE, Vocab, MolTree, tree_decomp

__all__ = [
    "Generator", "DenseMolDataset", "DenseMolLoader",
    "synthetic_smiles_dataset",
    "RandGenEvaluator", "PropOptEvaluator", "ConstPropOptEvaluator",
    "GraphDF", "GraphAF", "GraphEBM",
    "JTVAE", "Vocab", "MolTree", "tree_decomp",
]
