"""Batched coalition scoring == the sequential shapley scorers.

``score_coalitions`` (one vmapped forward per expansion) must reproduce
the per-coalition sequential path exactly — same masks (fresh
``default_rng(seed)`` per coalition), same margins, same weighting.
"""
import jax
import numpy as np
import pytest

from dig_tpu.datasets.graphs import GraphClsLoader, synthetic_graph_dataset
from dig_tpu.xgraph import GCN_2l, SubgraphX
from dig_tpu.xgraph.shapley import (gnn_score, l_shapley, mc_l_shapley,
                                    mc_shapley, make_batched_value_func,
                                    make_value_func, score_coalitions)


@pytest.fixture(scope="module")
def setup():
    data = synthetic_graph_dataset(4, seed=0, feat_dim=8)
    g = next(iter(GraphClsLoader([data[0]], 1)))
    model = GCN_2l(model_level="graph", dim_hidden=16, num_classes=2)
    params = model.init(jax.random.PRNGKey(0), g)
    return model, params, g


@pytest.mark.parametrize("method", ["mc_l_shapley", "mc_shapley",
                                    "l_shapley", "gnn_score"])
def test_batched_matches_sequential(setup, method):
    model, params, g = setup
    vf = make_value_func(model, params, target_class=1)
    vfb = make_batched_value_func(model, params, target_class=1)
    real = np.flatnonzero(np.asarray(g.node_mask))
    coalitions = [real[:4].tolist(), real[2:7].tolist(), real[5:8].tolist()]
    batched = score_coalitions(coalitions, g, vfb, method,
                               local_radius=2, sample_num=6)
    for c, got in zip(coalitions, batched):
        if method == "gnn_score":
            want = gnn_score(c, g, vf)
        elif method == "l_shapley":
            want = l_shapley(c, g, 2, vf)
        elif method == "mc_shapley":
            want = mc_shapley(c, g, vf, sample_num=6)
        else:
            want = mc_l_shapley(c, g, 2, vf, sample_num=6)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batched_split_building(setup):
    model, params, g = setup
    vf = make_value_func(model, params, target_class=0)
    vfb = make_batched_value_func(model, params, target_class=0,
                                  subgraph_building_method="split")
    real = np.flatnonzero(np.asarray(g.node_mask))
    c = real[:5].tolist()
    got = score_coalitions([c], g, vfb, "mc_l_shapley",
                           local_radius=2, sample_num=5)[0]
    want = mc_l_shapley(c, g, 2, vf, "split", sample_num=5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_subgraphx_uses_batched_path(setup):
    model, params, g = setup
    sx = SubgraphX(model, params, num_classes=2, rollout=2, min_atoms=3,
                   sample_num=4)
    best, related = sx.explain(g, label=1, max_nodes=5)
    assert len(best.coalition) >= 1
    assert 0.0 <= related["sparsity"] <= 1.0
