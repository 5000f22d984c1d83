"""GraphFMIB (in-batch feature momentum, dig_tpu/lsgraph/fm_ib.py) —
sampler invariants, alpha=0 oracle vs full inference, momentum history
updates, and a training-improves smoke (VERDICT r2 'missing' item 5;
reference examples/lsgraph/GraphFMIB/reddit_example.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dig_tpu.lsgraph import synthetic_large_graph
from dig_tpu.lsgraph.fm_ib import (GraphFMIB, NeighborSampledLoader)


def _data(n=120, seed=0):
    d = synthetic_large_graph(n, seed=seed, avg_deg=4)
    return d["senders"], d["receivers"], d["x"], d["y"], d["train_mask"]


def test_sampler_invariants():
    s, r, x, y, tm = _data()
    N = len(y)
    ld = NeighborSampledLoader(s, r, N, tm, sizes=[3, 3], batch_size=8,
                               seed=1)
    b = next(iter(ld))
    assert b.n_id.shape == (ld.caps[0],)
    # targets first, all valid
    assert b.node_mask[:8].all()
    # prefix nesting: every dst index at layer l lies inside caps[l+1]
    for l in range(2):
        assert (b.dst_idx[l][b.edge_mask[l]] < ld.caps[l + 1]).all()
        assert (b.src_idx[l][b.edge_mask[l]] < ld.caps[l]).all()
        # every edge is a real graph edge
        eset = set(zip(s.tolist(), r.tolist()))
        for si, di in zip(b.src_idx[l][b.edge_mask[l]],
                          b.dst_idx[l][b.edge_mask[l]]):
            assert (int(b.n_id[si]), int(b.n_id[di])) in eset


def test_alpha0_matches_full_inference():
    """With alpha=0, B=N and fanout >= max in-degree the sampled batch
    covers every neighborhood exactly, so the batch forward must equal
    the layer-wise full-graph inference."""
    s, r, x, y, tm = _data(n=40)
    N = len(y)
    deg = np.bincount(r, minlength=N).max()
    ld = NeighborSampledLoader(s, r, N, np.ones(N, bool),
                               sizes=[int(deg), int(deg)], batch_size=N,
                               shuffle=False, seed=0)
    model = GraphFMIB(N, x.shape[1], 16, 4, 2, alpha=0.0).bind(ld)
    b = next(iter(ld))
    params = model.init(jax.random.PRNGKey(0), x, b)
    out, _ = model.forward(params, model.histories, x, b)
    full = model.full_inference(params, x, jnp.asarray(s), jnp.asarray(r))
    # batch rows are in b.n_id[:N] order
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(full)[b.n_id[:N]],
                               rtol=1e-4, atol=1e-5)


def test_momentum_updates_and_training_improves():
    s, r, x, y, tm = _data(n=120, seed=2)
    N = len(y)
    ld = NeighborSampledLoader(s, r, N, tm, sizes=[3, 3], batch_size=16,
                               seed=3)
    model = GraphFMIB(N, x.shape[1], 32, 4, 2, alpha=0.1).bind(ld)
    b0 = next(iter(ld))
    params = model.init(jax.random.PRNGKey(0), x, b0)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    hists = model.histories
    yj = jnp.asarray(y)
    xj = jnp.asarray(x)

    B = ld.B

    @jax.jit
    def step(params, opt_state, hists, b):
        def loss_fn(p):
            out, nh = model.forward(p, hists, xj, b)
            tgt = yj[b.n_id[:B]]
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                out, tgt)), nh
        (loss, nh), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, up), opt_state, nh, loss

    losses = []
    for ep in range(8):
        for b in ld:
            params, opt_state, hists, loss = step(
                params, opt_state, hists, model._jb(b))
        losses.append(float(loss))
    # per-layer histories were written at the sampling boundary
    assert any(float(jnp.abs(h).sum()) > 0 for h in hists)
    assert losses[-1] < losses[0]
