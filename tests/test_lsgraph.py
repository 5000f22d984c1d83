"""lsgraph tests: native partitioner/relabel, subgraph loader contract,
history semantics, and end-to-end scalable training (GCN/GCN2/PNA) with
mini_inference accuracy on a learnable synthetic graph."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dig_tpu.lsgraph import (EvalSubgraphLoader, FeatureMomentum, History,
                             ScalableGCN, ScalableGCN2, ScalablePNA,
                             SubgraphLoader, metis_permute,
                             synthetic_large_graph)
from dig_tpu import native


@pytest.fixture(scope="module")
def graph():
    return synthetic_large_graph(300, seed=0, avg_deg=8)


def test_native_available_and_partition(graph):
    # the .so is committed-built in CI via `python -m dig_tpu.native.build`;
    # if missing, numpy fallbacks cover the same contract
    s, r = graph["senders"], graph["receivers"]
    N = len(graph["y"])
    perm, ptr, part = metis_permute(s, r, N, 4)
    assert len(ptr) == 5
    sizes = np.diff(ptr)
    assert sizes.sum() == N
    assert sizes.max() - sizes.min() <= N // 4 + 2
    # perm maps new->old consistently with part_of
    assert np.all(np.diff(part[perm]) >= 0)


def test_native_relabel_contract():
    if not native.available():
        pytest.skip("native lib not built")
    # path graph 0-1-2-3-4
    s = np.array([0, 1, 1, 2, 2, 3, 3, 4])
    r = np.array([1, 0, 2, 1, 3, 2, 4, 3])
    out = native.relabel_one_hop(s, r, np.array([1, 2]), 5,
                                 max_out_edges=16, max_out_nodes=8)
    rowptr, col, n_id = out
    # batch nodes first, halo appended
    assert list(n_id[:2]) == [1, 2]
    assert set(n_id) == {0, 1, 2, 3}
    assert rowptr[-1] == 4  # edges into nodes 1 and 2


def test_subgraph_loader_halo(graph):
    s, r = graph["senders"], graph["receivers"]
    N = len(graph["y"])
    perm, ptr, _ = metis_permute(s, r, N, 4)
    loader = SubgraphLoader(s, r, N, ptr, perm, batch_parts=1)
    covered = set()
    for sub in loader:
        B = sub.batch_size
        em = sub.edge_mask
        # receivers always in-batch
        assert np.all(sub.receivers[em] < B)
        # every edge's sender is a valid row
        nm = sub.node_mask
        assert np.all(nm[sub.senders[em]])
        covered |= set(sub.n_id[:B].tolist())
    assert covered == set(range(N))


def test_history_and_momentum():
    h = History.create(10, 4)
    x = jnp.ones((3, 4))
    h = h.push(x, jnp.asarray([1, 5, 7]))
    np.testing.assert_allclose(np.asarray(h.pull(jnp.asarray([5]))), 1.0)
    np.testing.assert_allclose(np.asarray(h.pull(jnp.asarray([0]))), 0.0)

    fm = FeatureMomentum.create(10, 4, gamma=0.5)
    fm = fm.push(jnp.ones((2, 4)), jnp.asarray([1, 2]))
    fm = fm.push_momentum(jnp.zeros((2, 4)) + 3.0, jnp.asarray([1, 2]))
    # 0.5*3 + 0.5*1 = 2.0
    np.testing.assert_allclose(np.asarray(fm.pull(jnp.asarray([1]))), 2.0)


def _train(model_ctor, graph, epochs=12, lr=1e-2, **kw):
    s, r, x, y = (graph["senders"], graph["receivers"], graph["x"],
                  graph["y"])
    N = len(y)
    perm, ptr, _ = metis_permute(s, r, N, 4)
    loader = SubgraphLoader(s, r, N, ptr, perm, batch_parts=2, shuffle=True)
    x_new, y_new = x[perm], y[perm]
    tm = graph["train_mask"][perm]
    model = model_ctor(N, x.shape[1], 32, 4, 2, **kw)
    sub0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), x_new, sub0)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    xg, yg, tg = jnp.asarray(x_new), jnp.asarray(y_new), jnp.asarray(tm)
    histories = model.histories

    @jax.jit
    def step(params, opt_state, histories, sub):
        def loss_fn(p):
            out, new_h = model.forward(p, histories, xg, sub)
            n_id = jnp.asarray(sub.n_id)
            mask = jnp.asarray(sub.in_batch_mask) & tg[n_id]
            ls = optax.softmax_cross_entropy_with_integer_labels(
                out, yg[n_id])
            return (jnp.sum(jnp.where(mask, ls, 0.0))
                    / jnp.maximum(jnp.sum(mask), 1), new_h)
        (loss, new_h), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, new_h, loss

    for _ in range(epochs):
        for sub in loader:
            params, opt_state, histories, loss = step(
                params, opt_state, histories, sub)

    ev = EvalSubgraphLoader(s, r, N, ptr, perm)
    out = model.mini_inference(params, xg, ev)
    pred = np.argmax(np.asarray(out), -1)
    test = graph["test_mask"][perm]
    return float((pred[test] == y_new[test]).mean())


def test_scalable_gcn(graph):
    acc = _train(ScalableGCN, graph)
    assert acc > 0.6


def test_scalable_gcn_momentum(graph):
    acc = _train(ScalableGCN, graph, use_momentum=True)
    assert acc > 0.6


def test_scalable_gcn2(graph):
    acc = _train(ScalableGCN2, graph)
    assert acc > 0.6


def test_scalable_pna(graph):
    acc = _train(ScalablePNA, graph, epochs=25, avg_deg=8.0)
    assert acc > 0.6
