"""GraphCL pretrain + unsupervised probe (reference
benchmarks/sslgraph/example_graphcl.ipynb flow)."""
from dig_tpu.datasets import synthetic_graph_dataset
from dig_tpu.ssl import Encoder, GraphCL, GraphUnsupervised

data = synthetic_graph_dataset(200, seed=0)
enc = Encoder(feat_dim=8, hidden_dim=32, n_layers=3, gnn="gin")
gcl = GraphCL(dim=96, aug_1="dropN", aug_2="permE", aug_ratio=0.2)
ev = GraphUnsupervised(data, classifier="SVC", n_folds=5, batch_size=64)
ev.setup_train_config(batch_size=64, p_lr=0.01, p_epoch=10)
acc, std = ev.evaluate(gcl, enc)
print(f"unsupervised accuracy {acc:.4f} +/- {std:.4f}")
