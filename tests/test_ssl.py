"""sslgraph tests: encoders, views (mask semantics), objectives, and the
end-to-end GraphCL/GRACE/InfoGraph/MVGRL pretrain + probe paths, mirroring
the reference's test shape (test/sslgraph/*: micro pretrain then assert
0 <= acc <= 1) plus the mask-correctness tests the reference lacks."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dig_tpu.datasets.graphs import (GraphClsLoader, degree_onehot,
                                     synthetic_graph_dataset)
from dig_tpu.ssl import (Encoder, EdgePerturbation, GraphCL, GraphUnsupervised,
                         GraphSemisupervised, GRACE, InfoGraph, MVGRL,
                         NodeAttrMask, RWSample, UniformSample, nt_xent,
                         intra_node_nce)
from dig_tpu.ssl.views import Diffusion


@pytest.fixture(scope="module")
def batch():
    data = synthetic_graph_dataset(16, seed=0)
    return next(iter(GraphClsLoader(data, 8)))


def test_encoder_shapes_and_padding(batch):
    g = batch
    enc = Encoder(feat_dim=8, hidden_dim=16, n_layers=3, gnn="gin",
                  node_level=True, graph_level=True)
    params = enc.init(jax.random.PRNGKey(0), g)
    zg, zn = enc.apply(params, g)
    assert zg.shape == (8, 48)      # hidden * n_layers concat
    assert zn.shape == (g.num_nodes, 16)
    # padded nodes embed to zero
    nm = np.asarray(g.node_mask)
    assert np.allclose(np.asarray(zn)[~nm], 0.0)


@pytest.mark.parametrize("gnn", ["gcn", "resgcn"])
def test_encoder_variants(batch, gnn):
    g = batch
    enc = Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn=gnn)
    params = enc.init(jax.random.PRNGKey(0), g)
    zg = enc.apply(params, g)
    assert np.all(np.isfinite(np.asarray(zg)))


def test_uniform_sample_ratio(batch):
    g = batch
    v = UniformSample(ratio=0.25)
    g2 = v(jax.random.PRNGKey(1), g)
    n_before = np.asarray(g.n_node)
    kept = np.asarray(
        jax.ops.segment_sum(g2.node_mask.astype(jnp.int32), g.node_graph,
                            num_segments=g.num_graphs))
    want = np.floor(n_before * 0.75).astype(int)
    np.testing.assert_array_equal(kept, want)
    # no edge touches a dropped node
    em, nm = np.asarray(g2.edge_mask), np.asarray(g2.node_mask)
    s, r = np.asarray(g2.senders), np.asarray(g2.receivers)
    assert np.all(nm[s[em]]) and np.all(nm[r[em]])


def test_rw_sample_connected(batch):
    g = batch
    g2 = RWSample(ratio=0.5)(jax.random.PRNGKey(2), g)
    kept = np.asarray(
        jax.ops.segment_sum(g2.node_mask.astype(jnp.int32), g.node_graph,
                            num_segments=g.num_graphs))
    assert np.all(kept >= 1)
    assert np.all(kept <= np.asarray(g.n_node))


def test_edge_perturbation(batch):
    g = batch
    g2 = EdgePerturbation(add=True, drop=True, ratio=0.3)(
        jax.random.PRNGKey(3), g)
    em = np.asarray(g2.edge_mask)
    s, r = np.asarray(g2.senders)[em], np.asarray(g2.receivers)[em]
    ng = np.asarray(g2.node_graph)
    # every active edge connects nodes of the same graph
    np.testing.assert_array_equal(ng[s], ng[r])
    nm = np.asarray(g2.node_mask)
    assert np.all(nm[s]) and np.all(nm[r])


def test_node_attr_mask(batch):
    g = batch
    g2 = NodeAttrMask(mask_ratio=0.5, mask_std=0.0, mask_mean=7.0)(
        jax.random.PRNGKey(4), g)
    x2 = np.asarray(g2.nodes["x"])
    nm = np.asarray(g.node_mask)
    n_masked = np.sum(np.all(x2 == 7.0, axis=1) & nm)
    want = np.sum(np.floor(np.asarray(g.n_node) * 0.5))
    assert n_masked == want


def test_diffusion_block_structure(batch):
    g = batch
    _, S = Diffusion("ppr", alpha=0.2)(None, g)
    S = np.asarray(S)
    ng = np.asarray(g.node_graph)
    nm = np.asarray(g.node_mask)
    cross = (ng[:, None] != ng[None, :]) | ~nm[:, None] | ~nm[None, :]
    assert np.allclose(S[cross], 0.0)
    assert np.all(np.isfinite(S))
    # heat mode too
    _, Sh = Diffusion("heat", t=5.0)(None, g)
    assert np.all(np.isfinite(np.asarray(Sh)))


def test_nt_xent_identical_views_low_loss():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    aligned = float(nt_xent(z, z, tau=0.5))
    shuffled = float(nt_xent(z, z[::-1], tau=0.5))
    assert aligned < shuffled


def test_intra_node_nce_mask_invariance():
    rng = np.random.default_rng(1)
    z1 = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    full = float(intra_node_nce(z1, z2))
    # adding masked-out garbage rows must not change the loss
    pad = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32)) * 100
    z1p = jnp.concatenate([z1, pad])
    z2p = jnp.concatenate([z2, pad])
    mask = jnp.concatenate([jnp.ones(10, bool), jnp.zeros(6, bool)])
    masked = float(intra_node_nce(z1p, z2p, mask=mask))
    np.testing.assert_allclose(full, masked, rtol=1e-5)


def test_graphcl_end_to_end():
    data = synthetic_graph_dataset(60, seed=0)
    enc = Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn="gin")
    gcl = GraphCL(dim=32, aug_1="dropN", aug_2="maskN", aug_ratio=0.2)
    ev = GraphUnsupervised(data, classifier="LogReg", n_folds=3,
                           batch_size=30)
    ev.setup_train_config(batch_size=30, p_lr=0.01, p_epoch=2)
    acc, std = ev.evaluate(gcl, enc)
    assert 0.0 <= acc <= 1.0


def test_infograph_and_mvgrl_train():
    data = synthetic_graph_dataset(24, seed=1)
    loader = GraphClsLoader(data, 12, shuffle=True)
    enc = Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn="gin",
                  node_level=True, graph_level=True)
    res = list(InfoGraph(g_dim=32, n_dim=16).train(
        enc, loader, optax.adam(0.01), 2))[-1]
    assert np.isfinite(res["loss"])

    mv = MVGRL(g_dim=32, n_dim=16)
    encs = [Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn="gcn",
                    node_level=True, graph_level=True),
            mv.make_diffusion_encoder(hidden_dim=16, n_layers=2)]
    res = list(mv.train(encs, loader, optax.adam(0.01), 2))[-1]
    assert np.isfinite(res["loss"])


def test_grace_node_level():
    data = synthetic_graph_dataset(24, seed=2)
    loader = GraphClsLoader(data, 12, shuffle=True)
    enc = Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn="gcn",
                  node_level=True, graph_level=False)
    grace = GRACE(dim=16, dropE_rate_1=0.2, dropE_rate_2=0.2,
                  maskN_rate_1=0.2, maskN_rate_2=0.2)
    losses = [r["loss"] for r in grace.train(enc, loader, optax.adam(0.01),
                                             3, per_epoch_out=True)]
    assert all(np.isfinite(l) for l in losses)


def test_semisupervised():
    data = synthetic_graph_dataset(40, seed=3)
    enc = Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn="gin")
    gcl = GraphCL(dim=32, aug_1=None, aug_2="dropN", aug_ratio=0.2)
    ev = GraphSemisupervised(data, label_rate=1.0, n_folds=2, batch_size=20)
    ev.setup_train_config(batch_size=20, p_epoch=1, f_epoch=2)
    acc, std = ev.evaluate(gcl, enc)
    assert 0.0 <= acc <= 1.0


def test_degree_onehot():
    data = synthetic_graph_dataset(4, seed=4)
    for g in data:
        g.pop("x")
    data = degree_onehot(data)
    for g in data:
        assert g["x"].shape[0] == g["num_nodes"]
        np.testing.assert_allclose(g["x"].sum(1), 1.0)


def test_node_mvgrl_and_diffusion_sample():
    from dig_tpu.ssl import DiffusionWithSample, NodeMVGRL
    data = synthetic_graph_dataset(8, seed=5)
    g = next(iter(GraphClsLoader(data, 4)))
    # subgraph-sampled diffusion view
    dws = DiffusionWithSample(sample_size=5)
    g2, S = dws(jax.random.PRNGKey(0), g)
    kept = np.asarray(
        jax.ops.segment_sum(g2.node_mask.astype(jnp.int32), g.node_graph,
                            num_segments=g.num_graphs))
    assert np.all(kept <= 5)
    assert np.all(np.isfinite(np.asarray(S)))
    # NodeMVGRL trains with corruption negatives
    import optax
    mv = NodeMVGRL(g_dim=32, n_dim=16)
    encs = [Encoder(feat_dim=8, hidden_dim=16, n_layers=2, gnn="gcn",
                    node_level=True, graph_level=True),
            mv.make_diffusion_encoder(hidden_dim=16, n_layers=2)]
    loader = GraphClsLoader(data, 4, shuffle=True)
    res = list(mv.train(encs, loader, optax.adam(0.01), 2))[-1]
    assert np.isfinite(res["loss"])
