"""fairgraph / oodgraph / auggraph / ggraph3D end-to-end tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.auggraph import (Augmenter, RunnerAugCls, RunnerGenerator,
                              RunnerRewardGen, SMixup, sinkhorn)
from dig_tpu.datasets.graphs import synthetic_graph_dataset
from dig_tpu.fairgraph import run as fair_run, synthetic_fair_graph
from dig_tpu.ggraph3d import (GSphereNet, QM93DGEN, RandGenEvaluator3D,
                              compute_mmd, steps_from_molecule)
from dig_tpu.oodgraph import GOODHIV, make_ood_splits


def test_fairgraph_run():
    data = synthetic_fair_graph(100, seed=0)
    res = fair_run(data, epochs=15, warmup=3, classifier_epochs=60)
    assert 0.0 <= res["accuracy"] <= 1.0
    assert 0.0 <= res["dp"] <= 100.0
    assert 0.0 <= res["eo"] <= 100.0


def test_ood_splits_cover_and_shift():
    graphs = synthetic_graph_dataset(100, seed=0)
    for shift in ("no_shift", "covariate", "concept"):
        splits = make_ood_splits(graphs, shift=shift)
        total = sum(len(v) for v in splits.values())
        assert total <= len(graphs)
        assert len(splits["train"]) > 0 and len(splits["test"]) > 0
    # covariate: test domains (sizes) disjoint from train
    splits = make_ood_splits(graphs, shift="covariate")
    tr_sizes = {g["num_nodes"] for g in splits["train"]}
    te_sizes = {g["num_nodes"] for g in splits["test"]}
    assert max(tr_sizes) <= min(te_sizes)


def test_good_dataset_generate():
    meta, splits = GOODHIV.load("/tmp/nonexistent_good", "size",
                                shift="covariate", generate=True)
    assert meta["metric"] == "ROC-AUC"
    assert len(splits["train"]) > 0


def test_graphaug_pipeline():
    data = synthetic_graph_dataset(30, seed=0)
    rr = RunnerRewardGen(hidden=16)
    rparams = rr.train(data, batch_size=8, epochs=1)
    rg = RunnerGenerator(hidden=16, max_steps=1)
    aparams = rg.train(data, rr.model, rparams, batch_size=8, epochs=1)
    rc = RunnerAugCls(num_classes=2, hidden=16)
    acc = rc.train(data, rg.augmenter, aparams, batch_size=8, epochs=3)
    assert 0.0 <= acc <= 1.0


def test_augmenter_masks_consistent():
    data = synthetic_graph_dataset(8, seed=1)
    from dig_tpu.datasets.graphs import GraphClsLoader
    g = next(iter(GraphClsLoader(data, 4)))
    aug = Augmenter(hidden=16, max_steps=2)
    key = jax.random.PRNGKey(0)
    params = aug.init(key, key, g)
    g2, logp = aug.apply(params, key, g)
    em, nm = np.asarray(g2.edge_mask), np.asarray(g2.node_mask)
    s, r = np.asarray(g2.senders), np.asarray(g2.receivers)
    assert np.all(nm[s[em]]) and np.all(nm[r[em]])
    assert np.isfinite(float(logp))


def test_sinkhorn_doubly_stochastic():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))
    p = np.asarray(sinkhorn(scores, n_iters=30))
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-3)
    np.testing.assert_allclose(p.sum(0), 1.0, atol=1e-3)


def test_smixup():
    data = synthetic_graph_dataset(30, seed=2)
    sm = SMixup(num_classes=2, hidden=16)
    sm.train(data, batch_size=10, epochs=3)
    acc = sm.evaluate(data, batch_size=10)
    assert 0.0 <= acc <= 1.0


def test_steps_from_molecule_geometry():
    """Placement targets reconstruct the true positions."""
    from dig_tpu.ggraph3d.gspherenet import place_atom
    rng = np.random.default_rng(0)
    z = np.array([6, 6, 8, 7, 6])
    pos = rng.normal(size=(5, 3)) * 1.2
    steps = steps_from_molecule(z, pos, [6, 7, 8, 9])
    assert len(steps) == 4
    for s in steps:
        assert 0 <= s["focus_local"] < len(s["z_placed"])
        assert s["new_dist"] > 0
        if s["has_torsion"]:
            placed = s["pos_placed"]
            rec = place_atom(placed[s["focus_local"]],
                             placed[s["c1_local"]],
                             placed[s["c2_local"]],
                             s["new_dist"], s["new_angle"],
                             s["new_torsion"])
            # the reconstruction matches the true next position
            k = len(s["z_placed"])
            true_next_idx = None  # recover by distance match
            d = np.linalg.norm(pos - rec, axis=1)
            assert d.min() < 0.2


def test_gspherenet_train_generate():
    ds = QM93DGEN(num_steps_per_batch=8)
    gs = GSphereNet(num_node_types=4, hidden=24, num_flow_layers=2)
    hist = gs.train(ds.loader(), lr=1e-3, max_epochs=2, verbose=False)
    assert np.isfinite(hist).all()
    samples = gs.generate([6, 7, 8, 9], num_gen=3, max_atoms=6)
    assert all(1 <= len(s["z"]) <= 6 for s in samples)
    res = RandGenEvaluator3D().eval_validity({"mol_dicts": samples})
    assert 0.0 <= res["valid_ratio"] <= 100.0


def test_compute_mmd():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 200)
    b = rng.normal(0, 1, 200)
    c = rng.normal(3, 1, 200)
    assert compute_mmd(a, b) < compute_mmd(a, c)


def test_config_system(tmp_path):
    from dig_tpu import Config
    p = tmp_path / "conf.yaml"
    p.write_text("""
model:
  hidden: 128
  layers: 4
train:
  lr: 5e-4
  use_force: true
  names: [a, b]
""")
    cfg = Config.load(str(p), overrides=["train.lr=1e-3", "model.extra=7"])
    assert cfg.model.hidden == 128
    assert cfg.train.lr == 1e-3
    assert cfg.train.use_force is True
    assert cfg.model.extra == 7
    assert cfg.train.names == ["a", "b"]
    out = tmp_path / "out.yaml"
    cfg.save(str(out))
    cfg2 = Config.load(str(out))
    assert cfg2.to_dict() == cfg.to_dict()


def test_graphdf_const_prop_opt():
    from dig_tpu.chem import mol_from_smiles
    from dig_tpu.ggraph import (DenseMolLoader, GraphDF,
                                ConstPropOptEvaluator,
                                synthetic_smiles_dataset)
    ds = synthetic_smiles_dataset(repeat=1)
    loader = DenseMolLoader(ds, 16, shuffle=True)
    conf = dict(max_size=9, edge_unroll=4, node_dim=4, bond_dim=4,
                num_flow_layer=2, num_rgcn_layer=2, nhid=24, nout=24)
    df = GraphDF()
    df.train_rand_gen(loader, 1e-3, 0, 1, conf, verbose=False)
    seeds = [mol_from_smiles(s) for s in ("CCO", "CCC")]
    df.train_const_prop_opt(seeds, n_iters=1)
    mods = df.run_const_prop_opt(seeds, n_extra_atoms=2)
    assert len(mods) == 2
    res = ConstPropOptEvaluator().eval(
        {"inp_smiles": ["CCO", "CCC"], "mols_0": mods})
    assert 0 in res


def test_xgraph_model_manager():
    from dig_tpu.datasets import synthetic_graph_dataset
    from dig_tpu.xgraph.model_manager import load_model, train_gnn
    data = synthetic_graph_dataset(30, seed=0)
    model = load_model("GIN_2l", dim_hidden=16, num_classes=2)
    params, acc = train_gnn(model, data, epochs=5, batch_size=10)
    assert 0.0 <= acc <= 1.0
