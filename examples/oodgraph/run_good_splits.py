"""GOOD out-of-distribution splits: the eight named dataset classes with
covariate/concept/no-shift protocols (reference dig/oodgraph/good_*.py —
the reference only downloads pre-split caches; dig_tpu additionally
GENERATES the protocols for any graph set via make_ood_splits)."""
from dig_tpu.datasets.graphs import synthetic_graph_dataset
from dig_tpu.oodgraph import (GOODCBAS, GOODHIV, GOODMotif,
                              make_ood_splits)

# cache-gated named datasets fall back to documented synthetic backbones
meta, splits = GOODHIV.load("/tmp/good_cache", "size",
                            shift="covariate", generate=True)
print(f"GOODHIV[{meta['metric']}] covariate/size: "
      + " ".join(f"{k}={len(v)}" for k, v in splits.items()))

meta, splits = GOODMotif.load("/tmp/good_cache", "basis",
                              shift="concept", generate=True)
print(f"GOODMotif[{meta['metric']}] concept/basis: "
      + " ".join(f"{k}={len(v)}" for k, v in splits.items()))

# the split generator works on any graph list
graphs = synthetic_graph_dataset(200, seed=0)
for shift in ("no_shift", "covariate", "concept"):
    sp = make_ood_splits(graphs, shift=shift)
    tr = {g["num_nodes"] for g in sp["train"]}
    te = {g["num_nodes"] for g in sp["test"]}
    print(f"{shift:9s}: train {len(sp['train'])} test {len(sp['test'])} "
          f"(train sizes <= {max(tr)}, test sizes >= {min(te)})")
