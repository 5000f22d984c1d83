"""Contrastive self-supervised learning on graphs — TPU-native rebuild of
``dig/sslgraph`` (SURVEY.md §2.2).

Components (reference files in parens):
* :mod:`encoders` — Encoder wrapper over GIN / GCN / ResGCN stacks with
  per-layer sum/mean pooling (``dig/sslgraph/utils/encoders.py``).
* :mod:`views` — graph augmentations as *pure jit-able functions*
  ``(key, GraphBatch) -> GraphBatch`` (``.../views_fn/{sample,structure,
  feature,combination}.py``). The reference mutates PyG Data on host per
  batch; here views run on device inside the training step.
* :mod:`objectives` — InfoNCE / NT-Xent family and JSE family
  (``.../objectives/{infonce,jse}.py``).
* :mod:`contrastive` — the generic pretrain engine
  (``.../model/contrastive.py:86-140``).
* :mod:`methods` — GraphCL, InfoGraph, MVGRL, GRACE, pGRACE
  (``.../model/*.py``).
* :mod:`evaluation` — GraphUnsupervised / GraphSemisupervised /
  NodeUnsupervised harnesses (``dig/sslgraph/evaluation/``).
* :mod:`adaptive` — centrality-weighted augmentation probabilities for
  GCA/pGRACE (``dig/sslgraph/utils/adaptive.py``).
"""
from .encoders import Encoder, GIN, GCN, ResGCN
from .views import (UniformSample, RWSample, EdgePerturbation, NodeAttrMask,
                    Diffusion, DiffusionWithSample, RandomView,
                    SequentialView, identity_view)
from .objectives import nce_loss, jse_loss, nt_xent, intra_node_nce
from .contrastive import Contrastive
from .methods import GraphCL, InfoGraph, MVGRL, GRACE, pGRACE, NodeMVGRL
from .evaluation import (GraphUnsupervised, GraphSemisupervised,
                         NodeUnsupervised)

__all__ = [
    "Encoder", "GIN", "GCN", "ResGCN",
    "UniformSample", "RWSample", "EdgePerturbation", "NodeAttrMask",
    "Diffusion", "DiffusionWithSample", "RandomView", "SequentialView",
    "identity_view",
    "nce_loss", "jse_loss", "nt_xent", "intra_node_nce",
    "Contrastive", "GraphCL", "InfoGraph", "MVGRL", "GRACE", "pGRACE",
    "NodeMVGRL",
    "GraphUnsupervised", "GraphSemisupervised", "NodeUnsupervised",
]
