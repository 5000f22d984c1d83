"""Explainability walkthrough: train a zoo GNN on a planted-motif set,
explain it with GNNExplainer / GradCAM / SubgraphX, collect fidelity
(reference benchmarks/xgraph pipeline + docs tutorials; full sweep:
benchmarks/xgraph/run_benchmark.py)."""
import numpy as np

from dig_tpu.datasets.graphs import GraphClsLoader
from dig_tpu.xgraph import (GNNExplainer, GradCAM, SubgraphX, XCollector)
from dig_tpu.xgraph.datasets import ba_2motifs
from dig_tpu.xgraph.model_manager import load_model, train_gnn

data = ba_2motifs(num_graphs=120, seed=0)
model = load_model("GIN_3l", dim_hidden=32, num_classes=2)
# full-batch + cosine schedule needs its horizon (see
# benchmarks/xgraph/run_benchmark.py) — short runs sit at chance
params, train_acc = train_gnn(model, data, epochs=800, batch_size=120,
                              lr=1e-2)
print(f"trained GIN_3l: train acc {train_acc:.3f}")

g = next(iter(GraphClsLoader(data[:1], 1)))
label = int(data[0]["y"])

collector = XCollector()
ex = GNNExplainer(model, params, epochs=50, lr=0.05)
masks, related = ex(g, num_classes=2, sparsity=0.6)
collector.collect_data(masks, related, label=label)
print(f"GNNExplainer: fidelity {collector.fidelity:.3f} "
      f"fidelity_inv {collector.fidelity_inv:.3f} "
      f"sparsity {collector.sparsity:.3f}")

cam = GradCAM(model, params)
scores = cam.explain(g, target_label=label)
print(f"GradCAM: {int(np.isfinite(scores).sum())} scored edges, "
      f"top edge {int(np.nanargmax(np.where(np.isfinite(scores), scores, -np.inf)))}")

sx = SubgraphX(model, params, num_classes=2, rollout=5, min_atoms=3,
               sample_num=5)
best, rel = sx.explain(g, label=label, max_nodes=6)
print(f"SubgraphX: coalition {sorted(best.coalition)} "
      f"sparsity {rel['sparsity']:.3f}")
