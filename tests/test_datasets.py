"""Data-layer tests that need no network egress: the reference's exact
split determinism (pure RandomState math), and the raw-format parsers
(TU graph-kernel files, MoleculeNet CSV, QM9/MD17 npz) on tiny frozen
fixtures written to tmp_path."""
import numpy as np
import pytest

from dig_tpu.datasets import QM93D, MD17, load_tu_dataset
from dig_tpu.datasets.qm9 import get_idx_split


def test_qm9_seed42_split_determinism():
    """Reference fixture: /root/reference/test/threedgraph/dataset/
    test_QM93D.py:31-34 — 130,831 molecules, train 1000 / valid 10000,
    seed 42 gives first indices 112526 / 120798 / 107901."""
    split = get_idx_split(130831, 1000, 10000, seed=42)
    assert split["train"][0] == 112526
    assert split["valid"][0] == 120798
    assert split["test"][0] == 107901
    assert len(split["train"]) == 1000
    assert len(split["valid"]) == 10000
    assert len(split["test"]) == 130831 - 11000
    # partition: disjoint and complete
    all_ids = np.concatenate([split["train"], split["valid"], split["test"]])
    assert len(np.unique(all_ids)) == 130831


def test_qm9_npz_roundtrip(tmp_path):
    """QM93D parses the DimeNet qm9_eV.npz layout (flat R/Z + N counts)."""
    rng = np.random.default_rng(0)
    N = np.array([3, 5, 2], np.int64)
    total = int(N.sum())
    R = rng.normal(size=(total, 3)).astype(np.float32)
    Z = rng.integers(1, 9, total).astype(np.int32)
    fields = {t: rng.normal(size=3).astype(np.float32)
              for t in ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
                        "U0", "U", "H", "G", "Cv"]}
    np.savez(tmp_path / "qm9_eV.npz", R=R, Z=Z, N=N, **fields)
    ds = QM93D(root=str(tmp_path))
    assert len(ds) == 3
    m1 = ds[1]
    np.testing.assert_array_equal(m1["z"], Z[3:8])
    np.testing.assert_allclose(m1["pos"], R[3:8])
    assert m1["y"].shape == (12,)
    np.testing.assert_allclose(m1["y"][7], fields["U0"][1])


def test_qm9_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        QM93D(root=str(tmp_path / "nope"))


def test_md17_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    T, n = 6, 9
    np.savez(tmp_path / "md17_benzene_old.npz",
             E=rng.normal(size=(T, 1)).astype(np.float32),
             F=rng.normal(size=(T, n, 3)).astype(np.float32),
             R=rng.normal(size=(T, n, 3)).astype(np.float32),
             z=rng.integers(1, 7, n).astype(np.int32))
    ds = MD17(root=str(tmp_path), name="benzene_old")
    assert len(ds) == T
    m = ds[2]
    assert m["pos"].shape == (n, 3)
    assert m["force"].shape == (n, 3)
    assert np.isscalar(m["y"]) or m["y"].shape in ((), (1,))


def _write_tu(tmp_path, name="TOY"):
    d = tmp_path / name / "raw"
    d.mkdir(parents=True)
    # two graphs: triangle (nodes 1-3) and an edge pair (nodes 4-5)
    (d / f"{name}_A.txt").write_text(
        "1, 2\n2, 1\n2, 3\n3, 2\n1, 3\n3, 1\n4, 5\n5, 4\n")
    (d / f"{name}_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n")
    (d / f"{name}_graph_labels.txt").write_text("1\n-1\n")
    (d / f"{name}_node_labels.txt").write_text("0\n1\n0\n2\n1\n")
    return tmp_path


def test_tu_parser(tmp_path):
    root = _write_tu(tmp_path)
    graphs = load_tu_dataset(str(root), "TOY")
    assert len(graphs) == 2
    g0, g1 = graphs
    assert g0["num_nodes"] == 3 and g1["num_nodes"] == 2
    assert len(g0["senders"]) == 6 and len(g1["senders"]) == 2
    # labels remapped to 0..C-1
    assert sorted([g0["y"], g1["y"]]) == [0, 1]
    # edges are local (relabeled per graph)
    assert g1["senders"].max() < 2


def test_moleculenet_csv_parser(tmp_path):
    from dig_tpu.xgraph.datasets import molecule_dataset
    (tmp_path / "bbbp.csv").write_text(
        "num,name,p_np,smiles\n"
        "1,propanol,1,CCCO\n"
        "2,bad,0,not_a_smiles(((\n"
        "3,benzene,0,c1ccccc1\n")
    graphs = molecule_dataset(str(tmp_path), "bbbp")
    # the malformed row is skipped, the two valid molecules parse
    assert len(graphs) == 2
    assert graphs[0]["num_nodes"] == 4          # C C C O
    assert graphs[1]["num_nodes"] == 6          # benzene ring
    assert graphs[0]["y"] == 1 and graphs[1]["y"] == 0
    assert graphs[1]["senders"].shape[0] == 12  # 6 aromatic bonds, both dirs


def test_ood_splits_deterministic_partition():
    from dig_tpu.oodgraph.datasets import make_ood_splits
    rng = np.random.default_rng(2)
    graphs = [{"num_nodes": int(rng.integers(4, 30)), "id": i,
               "y": int(rng.integers(0, 2))} for i in range(200)]
    for shift in ("no_shift", "covariate", "concept"):
        a = make_ood_splits(graphs, shift=shift, seed=7)
        b = make_ood_splits(graphs, shift=shift, seed=7)
        ids_a = sorted(g["id"] for part in a.values() for g in part)
        assert ids_a == list(range(200)), shift
        for k in a:
            assert [g["id"] for g in a[k]] == [g["id"] for g in b[k]], shift
    cov = make_ood_splits(graphs, shift="covariate", seed=7)
    tr = max(g["num_nodes"] for g in cov["train"]) if cov["train"] else 0
    te = min(g["num_nodes"] for g in cov["test"]) if cov["test"] else 99
    assert tr <= te + 1  # covariate shift orders the domain
