"""Periodic-boundary radius graph + ComENet-OCP variant
(reference: dig/threedgraph/method/comenet/ocp/comenet-ocp.py:274-358,
radius_graph_pbc/get_pbc_distances from the optional ocpmodels dep)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.datasets import MoleculeLoader, synthetic_crystals
from dig_tpu.models import ComENet, ComENetOCP
from dig_tpu.ops.pbc import pbc_offsets, pbc_overflow, radius_graph_pbc_flat
from dig_tpu.ops.radius import radius_graph_flat


def _batch(num=4, seed=0, **kw):
    mols = synthetic_crystals(num, seed=seed, **kw)
    return next(iter(MoleculeLoader(mols, num, n_node_pad=num * 12)))


def test_pbc_offsets_zero_first():
    offs = pbc_offsets(1)
    assert offs.shape == (27, 3)
    assert np.all(offs[0] == 0)
    offs2 = pbc_offsets(2)
    assert offs2.shape == (125, 3)


def test_pbc_matches_open_boundary_for_huge_cell():
    """With the cell ≫ cutoff only the zero image contributes, so the PBC
    graph must equal radius_graph_flat exactly."""
    g = _batch(4, seed=1, a_min=40.0, a_max=45.0)
    cutoff, E = 5.0, 512
    pg = radius_graph_pbc_flat(g.nodes["pos"], g.globals["cell"],
                               g.node_graph, g.node_mask, cutoff, E)
    s, r, m = radius_graph_flat(g.nodes["pos"], g.node_graph, g.node_mask,
                                cutoff, E)
    ref = {(int(a), int(b)) for a, b, k in
           zip(np.asarray(s), np.asarray(r), np.asarray(m)) if k}
    got = {(int(a), int(b)) for a, b, k in
           zip(np.asarray(pg.senders), np.asarray(pg.receivers),
               np.asarray(pg.edge_mask)) if k}
    assert got == ref and len(ref) > 0


def test_pbc_brute_force_parity():
    """Edge multiset (receiver, sender, rounded distance) matches a numpy
    triple-loop over explicit images."""
    g = _batch(2, seed=2, min_atoms=4, max_atoms=6)
    cutoff, E = 6.0, 2048
    pg = radius_graph_pbc_flat(g.nodes["pos"], g.globals["cell"],
                               g.node_graph, g.node_mask, cutoff, E)
    got = sorted(
        (int(i), int(j), round(float(d), 4))
        for j, i, k, d in zip(np.asarray(pg.senders), np.asarray(pg.receivers),
                              np.asarray(pg.edge_mask),
                              np.asarray(pg.edge_dist)) if k)
    pos = np.asarray(g.nodes["pos"])
    cell = np.asarray(g.globals["cell"])
    ngr = np.asarray(g.node_graph)
    nm = np.asarray(g.node_mask)
    want = []
    offs = pbc_offsets(1)
    for i in range(len(pos)):
        for j in range(len(pos)):
            if not (nm[i] and nm[j] and ngr[i] == ngr[j]):
                continue
            for m, o in enumerate(offs):
                if i == j and m == 0:
                    continue
                d = np.linalg.norm(pos[j] + o @ cell[ngr[j]] - pos[i])
                if d < cutoff:
                    want.append((i, j, round(float(d), 4)))
    assert got == sorted(want) and len(want) > 0


def test_pbc_lattice_translation_invariance():
    """Shifting an atom by a whole lattice vector leaves the edge-distance
    multiset (and hence any model output) unchanged."""
    g = _batch(2, seed=3)
    cutoff, E = 6.0, 2048
    pos2 = np.asarray(g.nodes["pos"]).copy()
    cell = np.asarray(g.globals["cell"])
    pos2[0] += cell[0, 1]  # + one lattice vector of its own graph
    g2 = g.replace(nodes={**g.nodes, "pos": jnp.asarray(pos2)})

    def dmultiset(gb):
        pg = radius_graph_pbc_flat(gb.nodes["pos"], gb.globals["cell"],
                                   gb.node_graph, gb.node_mask, cutoff, E)
        d = np.asarray(pg.edge_dist)[np.asarray(pg.edge_mask)]
        return np.sort(np.round(d, 4))

    np.testing.assert_array_equal(dmultiset(g), dmultiset(g2))


def test_pbc_overflow_counts():
    g = _batch(2, seed=4)
    n_total = int(pbc_overflow(g.nodes["pos"], g.globals["cell"],
                               g.node_graph, g.node_mask, 6.0, 0))
    dropped = int(pbc_overflow(g.nodes["pos"], g.globals["cell"],
                               g.node_graph, g.node_mask, 6.0,
                               n_total - 3))
    assert dropped == 3


def test_comenet_ocp_forward_and_rotation_invariance():
    g = _batch(3, seed=5)
    model = ComENetOCP(cutoff=6.0, num_layers=2, hidden_channels=32,
                       middle_channels=16, max_edges=2048)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    e1 = np.asarray(jax.jit(model.apply)(params, g))
    assert np.all(np.isfinite(e1))

    # rigid rotation of positions AND cell -> identical energies
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]], np.float32)
    g2 = g.replace(
        nodes={**g.nodes, "pos": g.nodes["pos"] @ R.T},
        globals={**g.globals, "cell": g.globals["cell"] @ R.T})
    e2 = np.asarray(jax.jit(model.apply)(params, g2))
    np.testing.assert_allclose(e1, e2, rtol=2e-3, atol=2e-3)


def test_comenet_ocp_forces_finite():
    """S2EF: forces via dE/dpos through the periodic displacements."""
    g = _batch(2, seed=6)
    model = ComENetOCP(cutoff=6.0, num_layers=1, hidden_channels=16,
                       middle_channels=8, max_edges=1024)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)

    def esum(pos):
        g_ = g.replace(nodes={**g.nodes, "pos": pos})
        return jnp.sum(model.apply(params, g_))

    f = np.asarray(jax.grad(esum)(g.nodes["pos"]))
    assert np.all(np.isfinite(f)) and np.any(f != 0)
