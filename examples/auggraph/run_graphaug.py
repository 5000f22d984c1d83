"""GraphAug learned-augmentation pipeline (reference
dig/auggraph/method/GraphAug: RunnerRewardGen -> RunnerGenerator ->
RunnerAugCls) plus SMixup (graph mixup via a matching network)."""
from dig_tpu.auggraph import (RunnerAugCls, RunnerGenerator,
                              RunnerRewardGen, SMixup)
from dig_tpu.datasets.graphs import synthetic_graph_dataset

data = synthetic_graph_dataset(120, seed=0)

# 1. label-invariance reward model
rr = RunnerRewardGen(hidden=32)
rparams = rr.train(data, batch_size=16, epochs=2)

# 2. augmentation policy trained against the reward
rg = RunnerGenerator(hidden=32, max_steps=2)
aparams = rg.train(data, rr.model, rparams, batch_size=16, epochs=2)

# 3. classifier trained WITH the learned augmentation
rc = RunnerAugCls(num_classes=2, hidden=32)
acc = rc.train(data, rg.augmenter, aparams, batch_size=16, epochs=8)
print(f"GraphAug-augmented classifier accuracy: {acc:.3f}")

# SMixup baseline on the same data
sm = SMixup(num_classes=2, hidden=32)
sm.train(data, batch_size=16, epochs=8)
print(f"SMixup classifier accuracy: {sm.evaluate(data, batch_size=16):.3f}")
