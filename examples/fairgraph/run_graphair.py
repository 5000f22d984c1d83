"""Graphair fair-representation training: adversarial augmentation +
sensitivity adversary + contrastive loss, reporting accuracy / demographic
parity / equalized odds (reference dig/fairgraph/method/run.py:13-75).

Real POKEC/NBA csvs are cache-gated (dig_tpu.fairgraph.load_fair_dataset);
this example runs on the offline synthetic benchmark."""
from dig_tpu.fairgraph import run, synthetic_fair_graph

data = synthetic_fair_graph(300, seed=0)
res = run(data, epochs=60, warmup=10, classifier_epochs=200)
print(f"accuracy {res['accuracy']:.3f}  "
      f"DP {res['dp']:.2f}  EO {res['eo']:.2f}")
