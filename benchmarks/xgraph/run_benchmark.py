"""xgraph benchmark pipeline: dataset x explainer sweep with
fidelity-vs-sparsity curves.

Mirrors the reference hydra pipeline (``benchmarks/xgraph/Readme.md:6-35``:
train per-dataset checkpoints, run every explainer over a sparsity sweep,
aggregate fidelity+/fidelity-). Offline differences: the datasets are the
synthetic families (the reference's real sets need downloads; its own
metric unit tests run on synthetic BA graphs too), checkpoints are trained
in-process and cached under ``--out``, and results stream to JSONL instead
of hydra run dirs.

Usage::

    python -m benchmarks.xgraph.run_benchmark \
        --datasets ba_2motifs ba_lrp dense_vs_sparse \
        --explainers gnnexplainer pgexplainer gradcam gnn_gi subgraphx \
        --sparsities 0.5 0.6 0.7 0.8 --num_explain 20 --out results
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from dig_tpu.datasets import GraphClsLoader, synthetic_graph_dataset
from dig_tpu.xgraph import (GNN_GI, GNNExplainer, GradCAM, PGExplainer,
                            SubgraphX, XCollector)
from dig_tpu.xgraph.datasets import ba_lrp
from dig_tpu.xgraph.model_manager import load_model, train_gnn

DATASETS = {
    # degree-statistics classification (reference ba_lrp.py)
    "ba_lrp": lambda: ba_lrp(num_graphs=120, num_nodes=16, seed=0),
    # density-quantile classes, feature-correlated
    "dense_vs_sparse": lambda: synthetic_graph_dataset(120, seed=0),
    # smaller/denser variant — distinct degree + size regime
    "ba_2motifs": lambda: synthetic_graph_dataset(
        120, seed=7, min_nodes=10, max_nodes=20, num_classes=2),
}


def make_explainer(name, model, params):
    if name == "gnnexplainer":
        return GNNExplainer(model, params, epochs=40, lr=0.05)
    if name == "pgexplainer":
        return PGExplainer(model, params, epochs=10)
    if name == "gradcam":
        return GradCAM(model, params)
    if name == "gnn_gi":
        return GNN_GI(model, params)
    if name == "subgraphx":
        return SubgraphX(model, params, num_classes=2, rollout=5,
                         min_atoms=3, sample_num=8)
    raise KeyError(name)


def run_one(ex_name, ex, data, num_explain, sparsity):
    col = XCollector()
    t0 = time.perf_counter()
    # ONE loader over the whole set: per-graph loaders pad each graph to
    # its own size, which changes shapes and recompiles every jitted
    # explainer step per graph (~5 s each)
    loader = GraphClsLoader(data[:num_explain], 1)
    for d, g in zip(data[:num_explain], loader):
        label = int(d["y"])
        if ex_name == "gnnexplainer":
            masks, related = ex(g, num_classes=2, sparsity=sparsity)
            col.collect_data(masks, related, label=label)
        elif ex_name == "pgexplainer":
            masks, related = ex(g, num_classes=2, sparsity=sparsity)
            col.collect_data(masks, related, label=label)
        elif ex_name == "subgraphx":
            n_real = int(np.asarray(g.node_mask).sum())
            max_nodes = max(3, int(round((1 - sparsity) * n_real)))
            _, related = ex.explain(g, label=label, max_nodes=max_nodes)
            col.collect_data([None], related, label=label)
        else:
            scores = ex.explain(g, target_label=label)
            mask = ex.control_sparsity(scores, sparsity)
            related = ex.eval_related_pred(g, [mask, mask])
            col.collect_data([mask], related, label=label)
    return {
        "fidelity": round(col.fidelity, 4),
        "fidelity_inv": round(col.fidelity_inv, 4),
        "sparsity_measured": round(col.sparsity, 4),
        "seconds": round(time.perf_counter() - t0, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", default=list(DATASETS))
    p.add_argument("--explainers", nargs="+",
                   default=["gnnexplainer", "gradcam", "gnn_gi",
                            "subgraphx"])
    p.add_argument("--model", default="GCN_2l")
    p.add_argument("--sparsities", nargs="+", type=float,
                   default=[0.5, 0.6, 0.7, 0.8])
    p.add_argument("--num_explain", type=int, default=10)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--out", default="benchmarks/xgraph/results")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "fidelity_sweep.jsonl")
    with open(path, "w") as f:
        for ds_name in args.datasets:
            data = DATASETS[ds_name]()
            model = load_model(args.model, dim_hidden=32, num_classes=2)
            params, acc = train_gnn(model, data, epochs=args.epochs)
            print(f"[{ds_name}] trained {args.model}: acc {acc:.3f}")
            for ex_name in args.explainers:
                ex = make_explainer(ex_name, model, params)
                if ex_name == "pgexplainer":
                    gs = list(GraphClsLoader(data[: args.num_explain], 1))
                    ex.train_explanation_network(gs)
                for sp in args.sparsities:
                    row = {"dataset": ds_name, "model": args.model,
                           "train_acc": round(acc, 4),
                           "explainer": ex_name, "sparsity": sp}
                    row.update(run_one(ex_name, ex, data,
                                       args.num_explain, sp))
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print("  " + json.dumps(row))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
