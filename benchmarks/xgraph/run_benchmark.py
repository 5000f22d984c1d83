"""xgraph benchmark pipeline (reference benchmarks/xgraph: hydra-driven
dataset x model x explainer sweep -> fidelity/sparsity table)."""
import argparse

import numpy as np

from dig_tpu.datasets import synthetic_graph_dataset, GraphClsLoader
from dig_tpu.xgraph import (GNNExplainer, GradCAM, GNN_GI, SubgraphX,
                            XCollector)
from dig_tpu.xgraph.model_manager import load_model, train_gnn

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="GCN_2l")
parser.add_argument("--explainers", nargs="+",
                    default=["gnnexplainer", "gradcam", "gnn_gi"])
parser.add_argument("--sparsity", type=float, default=0.5)
parser.add_argument("--num_explain", type=int, default=10)
args = parser.parse_args()

data = synthetic_graph_dataset(120, seed=0)
model = load_model(args.model, dim_hidden=32, num_classes=2)
params, acc = train_gnn(model, data, epochs=20)
print(f"trained {args.model}: acc {acc:.3f}")

_EXPLAINERS = {
    "gnnexplainer": lambda: GNNExplainer(model, params, epochs=50, lr=0.05),
    "gradcam": lambda: GradCAM(model, params),
    "gnn_gi": lambda: GNN_GI(model, params),
}
for name in args.explainers:
    ex = _EXPLAINERS[name]()
    col = XCollector()
    for d in data[:args.num_explain]:
        g = next(iter(GraphClsLoader([d], 1)))
        if name == "gnnexplainer":
            masks, related = ex(g, num_classes=2, sparsity=args.sparsity)
            col.collect_data(masks, related, label=int(d["y"]))
        else:
            scores = ex.explain(g, target_label=int(d["y"]))
            mask = ex.control_sparsity(scores, args.sparsity)
            related = ex.eval_related_pred(g, [mask, mask])
            col.collect_data([mask], related, label=int(d["y"]))
    print(f"{name}: fidelity+ {col.fidelity:.4f}  "
          f"fidelity- {col.fidelity_inv:.4f}  sparsity {col.sparsity:.2f}")
