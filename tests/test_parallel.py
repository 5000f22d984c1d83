"""Multi-device tests on the 8-virtual-CPU mesh: DP training parity and
partitioned halo-exchange aggregation correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
from dig_tpu.models import SchNet
from dig_tpu.parallel import (build_exchange_plan, build_partitions,
                              concat_local_shards, halo_exchange_sum,
                              make_dp_train_step, make_mesh, make_dp_eval_step,
                              partition_graph, replicate, shard_graph_batch)
from dig_tpu.parallel.partition import edge_cut
from dig_tpu.train.trainer import make_step_fns, make_train_state

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV
    return make_mesh((N_DEV,), ("data",))


def _shards(n, seed0=0, mols_per=2, pad=32):
    return [next(iter(MoleculeLoader(
        synthetic_molecules(mols_per, seed=seed0 + i, max_atoms=12),
        batch_size=mols_per, n_node_pad=pad))) for i in range(n)]


def test_dp_matches_single_device(mesh):
    """One DP step over 8 shards == one single-device step over the same
    16 molecules (same global masked-mean loss, same updated params)."""
    model = SchNet(cutoff=3.0, num_layers=2, hidden_channels=32,
                   num_filters=32, num_gaussians=16, max_edges=256)
    opt = optax.sgd(1e-2)
    shards = _shards(N_DEV)
    g_dp = shard_graph_batch(concat_local_shards(shards), mesh, "data")

    state0 = make_train_state(model, opt, shards[0], seed=0)
    dp_step = make_dp_train_step(model, opt, mesh)
    state_dp = replicate(state0, mesh)
    state_dp, aux_dp = dp_step(state_dp, g_dp)

    # single-device reference: average the per-shard losses via global batch
    # with globally-offset indices (equivalent since graphs are independent)
    from dig_tpu.graph import batch_np
    all_mols = []
    for i in range(N_DEV):
        all_mols += synthetic_molecules(2, seed=i, max_atoms=12)
    big = next(iter(MoleculeLoader(all_mols, batch_size=16, n_node_pad=256)))
    # same net, but the edge cap must scale with the 8x bigger batch
    model_big = model.clone(max_edges=256 * N_DEV)
    state1 = make_train_state(model_big, opt, shards[0], seed=0)
    step1, _ = make_step_fns(model_big, opt, loss="l1", donate=False)
    state1, aux1 = step1(state1, big)

    np.testing.assert_allclose(float(aux_dp["loss"]), float(aux1["loss"]),
                               rtol=1e-5)
    p_dp = jax.device_get(state_dp.params)
    p_1 = jax.device_get(state1.params)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_1 = jax.tree_util.tree_leaves(p_1)
    for a, b in zip(flat_dp, flat_1):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_dp_eval(mesh):
    model = SchNet(cutoff=3.0, num_layers=1, hidden_channels=16,
                   num_filters=16, num_gaussians=8, max_edges=128)
    shards = _shards(N_DEV, seed0=5)
    g_dp = shard_graph_batch(concat_local_shards(shards), mesh, "data")
    params = model.init(jax.random.PRNGKey(0), shards[0])
    params = replicate(params, mesh)
    eval_step = make_dp_eval_step(model, mesh)
    preds, gm = eval_step(params, g_dp)
    assert preds.shape == (N_DEV * 2, 1)
    # shard i's predictions equal single-device forward on shard i
    for i in range(N_DEV):
        solo = model.apply(jax.device_get(params), shards[i])
        np.testing.assert_allclose(np.asarray(preds)[2 * i:2 * i + 2],
                                   np.asarray(solo), rtol=1e-4, atol=1e-5)


def _random_graph(rng, n, avg_deg):
    e = n * avg_deg
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    keep = senders != receivers
    return senders[keep], receivers[keep]


def test_partition_balanced_and_complete():
    rng = np.random.default_rng(0)
    s, r = _random_graph(rng, 200, 8)
    part = partition_graph(s, r, 200, 4)
    assert part.min() >= 0 and part.max() <= 3
    counts = np.bincount(part, minlength=4)
    assert counts.max() <= 200 // 4 + 1
    # partitioner should beat random cut on a locality-free graph at least
    # marginally; just sanity-check it returns a valid cut
    assert 0 <= edge_cut(part, s, r) <= len(s)


def test_partition_locality_graph():
    """On a ring-of-cliques graph the BFS-grow partitioner should find a
    near-perfect cut."""
    k, m = 8, 25  # 8 cliques of 25 nodes
    senders, receivers = [], []
    for c in range(k):
        base = c * m
        for i in range(m):
            for j in range(m):
                if i != j:
                    senders.append(base + i)
                    receivers.append(base + j)
        nxt = ((c + 1) % k) * m
        senders += [base, nxt]
        receivers += [nxt, base]
    s = np.array(senders)
    r = np.array(receivers)
    part = partition_graph(s, r, k * m, 4)
    cut = edge_cut(part, s, r)
    assert cut <= 4 * k  # only inter-clique bridges cut

def test_halo_exchange_matches_dense(mesh):
    """Partitioned shard_map aggregation == plain global segment_sum."""
    rng = np.random.default_rng(1)
    n = 160
    s, r = _random_graph(rng, n, 6)
    pg = build_partitions(s, r, n, N_DEV)
    plan = build_exchange_plan(pg)

    F = 16
    x = rng.normal(size=(n, F)).astype(np.float32)
    # dense reference
    want = np.zeros((n, F), np.float32)
    np.add.at(want, r, x[s])

    # lay out x into part slabs
    C = pg.nodes_per_part
    x_parts = np.zeros((N_DEV, C, F), np.float32)
    new_id = pg.perm
    for v in range(n):
        p, c = divmod(int(new_id[v]), C)
        x_parts[p, c] = x[v]

    out = halo_exchange_sum(jnp.asarray(x_parts), pg, mesh, "data", plan)
    out = np.asarray(out)
    got = np.zeros((n, F), np.float32)
    for v in range(n):
        p, c = divmod(int(new_id[v]), C)
        got[v] = out[p, c]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_graph_parallel_training(mesh):
    """Partitioned GCN with halo all-to-all learns on the 8-device mesh."""
    from dig_tpu.lsgraph import synthetic_large_graph
    from dig_tpu.parallel import (make_gp_train_step, prepare_gp_graph,
                                  slab_layout)
    data = synthetic_large_graph(400, seed=0)
    s, r, x, y = data["senders"], data["receivers"], data["x"], data["y"]
    N = len(y)
    gp, perm, H, C = prepare_gp_graph(s, r, N, N_DEV)
    xs = jnp.asarray(slab_layout(x, perm, N_DEV, C))
    ys = jnp.asarray(slab_layout(y, perm, N_DEV, C))
    tm = jnp.asarray(slab_layout(data["train_mask"], perm, N_DEV, C))
    te = slab_layout(data["test_mask"], perm, N_DEV, C)
    init_fn, step, predict = make_gp_train_step(
        mesh, 2, 32, 4, x.shape[1], H, C, lr=1e-2)
    params, opt_state = init_fn(jax.random.PRNGKey(0), xs, gp)
    for _ in range(50):
        params, opt_state, loss, logits = step(params, opt_state, gp, xs,
                                               ys, tm)
    pred = np.argmax(np.asarray(logits), -1)
    acc = float((pred[te] == np.asarray(ys)[te]).mean())
    assert acc > 0.7
    # forward-only predict path matches the training logits
    out = np.asarray(predict(params, gp, xs))
    np.testing.assert_allclose(np.argmax(out, -1), pred)


def test_partitioner_cut_quality():
    """Edge-cut quality of the GGGP+FM partitioner (native/partition.cpp)
    vs the known-optimal cut of a planted 4-cluster graph and vs a random
    partition (VERDICT r1: cut quality was unmeasured)."""
    from dig_tpu.parallel.partition import partition_graph
    rng = np.random.default_rng(0)
    k, size = 4, 50
    N = k * size
    s_list, r_list = [], []
    # dense clusters
    for c in range(k):
        base = c * size
        for _ in range(size * 6):
            a, b = rng.integers(0, size, 2)
            if a != b:
                s_list.append(base + a)
                r_list.append(base + b)
    # planted sparse inter-cluster bridges: the optimal 4-way cut
    bridges = 12
    for c in range(k):
        for _ in range(bridges // 2):
            a = c * size + int(rng.integers(size))
            b = ((c + 1) % k) * size + int(rng.integers(size))
            s_list.append(a)
            r_list.append(b)
    s = np.array(s_list)
    r = np.array(r_list)

    def cut(part_of):
        return int(np.sum(part_of[s] != part_of[r]))

    part = partition_graph(s, r, N, k, seed=0)
    # balanced
    counts = np.bincount(part, minlength=k)
    assert counts.max() <= int(1.35 * N / k), counts
    our_cut = cut(part)
    rand_cut = cut(rng.integers(0, k, N))
    # a good partitioner roughly recovers the planted clusters: the cut
    # stays within a small factor of the planted bridges and far below
    # the random-assignment cut
    assert our_cut <= 4 * (k * bridges), (our_cut, rand_cut)
    assert our_cut < 0.25 * rand_cut, (our_cut, rand_cut)


def test_gp_dp_2d_mesh():
    """DP x GP on Mesh(('data','graph')) (SURVEY §7): two data rows with
    DISJOINT node minibatches of the same partitioned graph compute
    exactly the 1-D full-batch update (global count-normalized psum over
    both axes), and identical replicated data is also invariant."""
    from jax.sharding import Mesh
    from dig_tpu.lsgraph import synthetic_large_graph
    from dig_tpu.parallel import make_gp_engine, prepare_gp_graph, slab_layout
    from dig_tpu.parallel.gp_models import GPGCN

    data = synthetic_large_graph(200, seed=1)
    s, r, x, y = data["senders"], data["receivers"], data["x"], data["y"]
    N = len(y)
    P_, D_ = 4, 2
    gp, perm, H, C = prepare_gp_graph(s, r, N, P_)
    xs = jnp.asarray(slab_layout(x, perm, P_, C))
    ys = jnp.asarray(slab_layout(y, perm, P_, C))
    tm_np = slab_layout(data["train_mask"], perm, P_, C)
    tm = jnp.asarray(tm_np)

    module = GPGCN(features=(16, 4))
    opt = optax.adam(1e-2)

    mesh1 = Mesh(np.array(jax.devices()[:P_]).reshape(P_), ("graph",))
    init1, step1, _ = make_gp_engine(mesh1, module, opt, H, C, axis="graph")
    params0 = init1(jax.random.PRNGKey(0), xs, gp)
    p1, os1, loss1, out1 = step1(jax.tree.map(jnp.copy, params0),
                                 opt.init(params0), gp, xs, ys, tm)

    mesh2 = Mesh(np.array(jax.devices()[:D_ * P_]).reshape(D_, P_),
                 ("data", "graph"))
    init2, step2, predict2 = make_gp_engine(mesh2, module, opt, H, C,
                                            axis="graph", data_axis="data")
    stack2 = lambda a: jnp.stack([a, a])
    gp2 = jax.tree.map(stack2, gp)
    # disjoint halves of the train mask across the two data rows
    rng = np.random.default_rng(0)
    half = rng.uniform(size=tm_np.shape) < 0.5
    m0 = jnp.asarray(tm_np & half)
    m1 = jnp.asarray(tm_np & ~half)
    p2, os2, loss2, out2 = step2(jax.tree.map(jnp.copy, params0),
                                 opt.init(params0), gp2,
                                 stack2(xs), stack2(ys),
                                 jnp.stack([m0, m1]))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # per-row outputs equal each other (same params, same graph)
    out2 = np.asarray(out2)
    np.testing.assert_allclose(out2[0], out2[1], rtol=1e-5, atol=1e-5)
    # forward path on the 2-D mesh
    pr = np.asarray(predict2(p2, gp2, stack2(xs)))
    np.testing.assert_allclose(pr[0], pr[1], rtol=1e-5, atol=1e-5)
