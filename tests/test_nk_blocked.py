"""Slot-aligned blocked NK radius graph + block-gather triplet path
(ops/radius.radius_graph_nk_blocked, ops/triplets.expand_kj NK branch).

Replacement target: torch_cluster.radius_graph at
dig/threedgraph/method/spherenet/spherenet.py:304 — the blocked builder is
the O(G * B^2) fast path for slot-aligned batches."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
from dig_tpu.models import SphereNet
from dig_tpu.ops.radius import radius_graph_nk, radius_graph_nk_blocked
from dig_tpu.ops.triplets import (_expand_kj, build_triplets_nk, expand_kj)


def _slot_batch(num=8, slot=12, seed=3, box=6.0):
    mols = synthetic_molecules(num, seed=seed, min_atoms=5, max_atoms=slot,
                               box=box)
    return next(iter(MoleculeLoader(mols, num, slot_size=slot)))


def _edge_set(nk):
    m = np.asarray(nk.nbr_mask)
    i = np.broadcast_to(np.arange(m.shape[0])[:, None], m.shape)
    j = np.asarray(nk.nbr_idx)
    return set(zip(i[m].tolist(), j[m].tolist()))


@pytest.mark.parametrize("slot,k", [(12, 16), (29, 16), (8, 4)])
def test_blocked_matches_flat_nk(slot, k):
    g = _slot_batch(8, slot)
    a = radius_graph_nk(g.nodes["pos"], g.node_graph, g.node_mask, 5.0, k)
    b = radius_graph_nk_blocked(g.nodes["pos"], g.node_mask, 5.0, k, slot)
    ea, eb = _edge_set(a), _edge_set(b)
    assert ea == eb and len(ea) > 0


def test_blocked_rev_edge_involution():
    g = _slot_batch(8, 12)
    b = radius_graph_nk_blocked(g.nodes["pos"], g.node_mask, 5.0, 16, 12)
    m = np.asarray(b.nbr_mask)
    re = np.asarray(b.rev_edge)
    s = np.asarray(b.senders)
    r = np.asarray(b.receivers)
    em = np.asarray(b.edge_mask)
    nj = np.asarray(b.nbr_idx)
    K = m.shape[1]
    ii, dd = np.nonzero(m)
    assert len(ii) > 0
    for i, d in zip(ii, dd):
        e = re[i, d]
        assert em[e] and s[e] == i and r[e] == nj[i, d]
        assert re.reshape(-1)[e] == i * K + d  # reverse of reverse is self


def test_expand_kj_nk_block_gather_parity():
    """NK block-gather expand matches the row-gather version and plain
    autodiff, forward and VJP."""
    g = _slot_batch(6, 12, seed=7)
    nkg = radius_graph_nk_blocked(g.nodes["pos"], g.node_mask, 5.0, 8, 12)
    trip = build_triplets_nk(nkg)
    E = nkg.edge_mask.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(0), (E, 16))
    out_nk = expand_kj(x, trip)
    out_row = _expand_kj(x, trip.mask, trip.idx_kj, trip.kj_bwd_idx,
                         trip.kj_bwd_mask)
    np.testing.assert_allclose(np.asarray(out_nk), np.asarray(out_row),
                               atol=1e-6)
    ct = jax.random.normal(jax.random.PRNGKey(1), out_nk.shape)
    g_nk = jax.vjp(lambda x_: expand_kj(x_, trip), x)[1](ct)[0]
    g_ref = jax.vjp(lambda x_: jnp.where(trip.mask[:, None],
                                         x_[trip.idx_kj], 0), x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_nk), np.asarray(g_ref),
                               atol=1e-5)


def test_spherenet_blocked_matches_unblocked():
    """Full model: block_size path == flat nk path on slot-aligned input."""
    g = _slot_batch(6, 12, seed=9)
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8)
    m_flat = SphereNet(**kw)
    m_blk = SphereNet(**kw, block_size=12)
    params = m_flat.init(jax.random.PRNGKey(0), g)
    e_flat = m_flat.apply(params, g)
    e_blk = m_blk.apply(params, g)
    np.testing.assert_allclose(np.asarray(e_flat), np.asarray(e_blk),
                               rtol=1e-4, atol=1e-5)


def test_spherenet_remat_matches():
    g = _slot_batch(6, 12, seed=11)
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8, block_size=12)
    m0 = SphereNet(**kw)
    m1 = SphereNet(**kw, remat=True)
    params = m0.init(jax.random.PRNGKey(0), g)

    def loss(mod, p):
        return jnp.sum(jnp.where(g.graph_mask[:, None], mod.apply(p, g), 0))

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_blocked_dropped_accounting():
    """radius_blocked_dropped: 0 on slot-aligned batches, >0 (and equal to
    the pairs the blocked builder actually loses) when a molecule
    straddles a block boundary."""
    from dig_tpu.ops.radius import radius_blocked_dropped
    g = _slot_batch(6, 12, seed=5)
    n0 = int(radius_blocked_dropped(g.nodes["pos"], g.node_graph,
                                    g.node_mask, 5.0, 12))
    assert n0 == 0
    # break alignment: shift everything by half a block
    pos = jnp.roll(g.nodes["pos"], 6, axis=0)
    ng = jnp.roll(g.node_graph, 6, axis=0)
    nm = jnp.roll(g.node_mask, 6, axis=0)
    n1 = int(radius_blocked_dropped(pos, ng, nm, 5.0, 12))
    assert n1 > 0
    full = radius_graph_nk(pos, ng, nm, 5.0, 16)
    blk = radius_graph_nk_blocked(pos, nm, 5.0, 16, 12, node_graph=ng)
    lost = _edge_set(full) - _edge_set(blk)
    assert n1 == len(lost)


def test_comenet_nk_matches_flat():
    """ComENet NK fast path == flat path: forward AND force-style grads
    (the frame selection via per-row argmin + one-hot contraction must
    reproduce segment_argmin + gather selection exactly)."""
    from dig_tpu.models.comenet import ComENet
    g = _slot_batch(6, 12, seed=21)
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              middle_channels=16, num_radial=3, num_spherical=2)
    m_flat = ComENet(**kw, max_edges=2048)
    m_nk = ComENet(**kw, nk_degree=16, block_size=12)
    params = m_flat.init(jax.random.PRNGKey(0), g)
    e_flat = m_flat.apply(params, g)
    e_nk = m_nk.apply(params, g)
    np.testing.assert_allclose(np.asarray(e_flat), np.asarray(e_nk),
                               rtol=2e-4, atol=2e-4)

    def loss(mod, p):
        def esum(pos):
            g_ = g.replace(nodes={**g.nodes, "pos": pos})
            e = mod.apply(p, g_)
            return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0))
        gp = jax.grad(esum)(g.nodes["pos"])
        return esum(g.nodes["pos"]) + jnp.sum(gp ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m_flat, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m_nk, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3,
            atol=5e-3 * max(1e-6, float(jnp.abs(b).max())))


@pytest.mark.parametrize("level", ["aminoacid", "backbone"])
def test_pronet_nk_matches_flat(level):
    """ProNet NK fast path == flat path on the same slot-aligned batch
    (sequential i±1 references are layout-global in both paths, so the
    batch layout must match for parity): forward and force-style grads."""
    from dig_tpu.datasets import ProteinLoader, synthetic_proteins
    from dig_tpu.models import ProNet
    prots = synthetic_proteins(4, seed=5, max_res=12)
    g = next(iter(ProteinLoader(prots, 4, slot_size=12)))
    kw = dict(level=level, num_blocks=2, hidden_channels=32, mid_emb=16,
              cutoff=8.0, num_radial=3, num_spherical=2)
    m_flat = ProNet(**kw, max_edges=4096, max_num_neighbors=16)
    m_nk = ProNet(**kw, nk_degree=12, block_size=12)
    params = m_flat.init(jax.random.PRNGKey(0), g)
    e_flat = m_flat.apply(params, g)
    e_nk = m_nk.apply(params, g)
    np.testing.assert_allclose(np.asarray(e_flat), np.asarray(e_nk),
                               rtol=2e-4, atol=2e-4)

    def loss(mod, p):
        def esum(pos):
            g_ = g.replace(nodes={**g.nodes, "pos": pos})
            e = mod.apply(p, g_)
            return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0))
        gp = jax.grad(esum)(g.nodes["pos"])
        return esum(g.nodes["pos"]) + jnp.sum(gp ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m_flat, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m_nk, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3,
            atol=5e-3 * max(1e-6, float(jnp.abs(b).max())))


def test_slot_loader_layout():
    mols = synthetic_molecules(4, seed=0, min_atoms=3, max_atoms=7)
    g = next(iter(MoleculeLoader(mols, 4, slot_size=8)))
    nm = np.asarray(g.node_mask)
    ng = np.asarray(g.node_graph)
    assert g.num_nodes == 32
    for gi, m in enumerate(mols):
        n = len(m["z"])
        assert nm[gi * 8: gi * 8 + n].all()
        assert not nm[gi * 8 + n: (gi + 1) * 8].any()
        assert (ng[gi * 8: gi * 8 + n] == gi).all()
        np.testing.assert_allclose(
            np.asarray(g.nodes["pos"][gi * 8: gi * 8 + n]), m["pos"])


def test_slot_loader_overflow_raises():
    mols = synthetic_molecules(4, seed=0, min_atoms=9, max_atoms=12)
    with pytest.raises(ValueError):
        next(iter(MoleculeLoader(mols, 4, slot_size=8)))


def test_bucketed_molecule_loader_energy_parity():
    """Bucketed slot batches == the single-slot loader: the same molecule
    must get the same energy whether it rides a 16-, 24- or 29-atom slot
    (slot padding is fully masked)."""
    import jax
    import numpy as np
    from dig_tpu.datasets import (BucketedMoleculeLoader, MoleculeLoader,
                                  synthetic_molecules)
    from dig_tpu.models import SphereNet

    mols = synthetic_molecules(12, seed=0, min_atoms=12, max_atoms=29,
                               box=6.0)
    model = SphereNet(cutoff=5.0, num_layers=2, hidden_channels=32,
                      num_spherical=2, num_radial=3, nk_degree=8,
                      block_size=29)
    g29 = next(iter(MoleculeLoader(mols, 12, slot_size=29)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g29)
    e_ref = np.asarray(model.apply(params, g29))[:, 0]

    bl = BucketedMoleculeLoader(mols, {16: 4, 24: 6, 29: 2})
    e_by_y = {}
    for batch in bl:
        for s, g in batch.items():
            sub = SphereNet(cutoff=5.0, num_layers=2, hidden_channels=32,
                            num_spherical=2, num_radial=3, nk_degree=8,
                            block_size=s)
            e = np.asarray(sub.apply(params, g))[:, 0]
            y = np.asarray(g.globals["y"])[:, 0]
            gm = np.asarray(g.graph_mask)
            for yi, ei in zip(y[gm], e[gm]):
                e_by_y[round(float(yi), 6)] = ei
    y_ref = np.asarray(g29.globals["y"])[:, 0]
    got = np.array([e_by_y[round(float(v), 6)] for v in y_ref])
    np.testing.assert_allclose(got, e_ref, rtol=5e-4, atol=5e-4)


def test_bucketed_molecule_loader_edge_cases():
    import numpy as np
    import pytest
    from dig_tpu.datasets import BucketedMoleculeLoader, synthetic_molecules

    mols = synthetic_molecules(10, seed=1, min_atoms=12, max_atoms=29)
    with pytest.raises(ValueError):
        BucketedMoleculeLoader(mols, {16: 4})   # 29-atom mol > 16
    # eval mode (no shuffle) drains everything, padding short buckets
    bl = BucketedMoleculeLoader(mols, {16: 2, 29: 2})
    seen = 0
    for batch in bl:
        for s, g in batch.items():
            assert g.num_graphs == 2            # static per-bucket count
            seen += int(np.asarray(g.graph_mask).sum())
    assert seen == 10                           # nothing dropped or lost
    # shuffle mode drops the ragged tail but keeps full batches only
    bl2 = BucketedMoleculeLoader(mols, {16: 2, 29: 2}, shuffle=True)
    for batch in bl2:
        for s, g in batch.items():
            assert int(np.asarray(g.graph_mask).sum()) == 2
