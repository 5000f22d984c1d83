"""DimeNet++ faithfulness vs the reference architecture
(``dig/threedgraph/method/dimenetpp/dimenetpp.py:55-160``).

``DimeNetPP`` here is the shared spherical block with ``use_torsion=False``
— these tests demonstrate that the alias reproduces the reference
DimeNet++ architecture exactly, not just "SphereNet minus torsion":

* class defaults == the reference ctor defaults (dimenetpp.py:232-238);
* per-layer parameter inventory == the reference ``update_e``'s ten
  linears (rbf/sbf two-stage down-projections through ``basis_emb_size``,
  the down/up projection pair around the triplet aggregation, the skip
  linear) + 3 residual layers, with NO torsion projections anywhere;
* the block's forward == an independent straight-line NumPy
  implementation of the reference equations with transplanted weights.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.models import DimeNetPP
from dig_tpu.models.spherenet import UpdateE
from dig_tpu.ops.radius import radius_graph_flat
from dig_tpu.ops.triplets import build_triplets


def test_dimenetpp_defaults_match_reference():
    # dimenetpp.py:232-238 ctor defaults
    m = DimeNetPP()
    assert m.use_torsion is False
    assert m.cutoff == 5.0
    assert m.num_layers == 4
    assert m.hidden_channels == 128
    assert m.out_channels == 1
    assert m.int_emb_size == 64
    assert m.basis_emb_size_dist == 8       # reference basis_emb_size=8
    assert m.basis_emb_size_angle == 8
    assert m.out_emb_channels == 256
    assert m.num_spherical == 7
    assert m.num_radial == 6
    assert m.envelope_exponent == 5
    assert m.num_before_skip == 1
    assert m.num_after_skip == 2
    assert m.num_output_layers == 3
    assert m.output_init == "GlorotOrthogonal"


def _tiny_problem(h=16, ie=8, be=4, ns=3, nr=4, seed=0):
    rng = np.random.default_rng(seed)
    N, E_cap, D = 10, 64, 6
    pos = rng.normal(size=(N, 3)).astype(np.float32) * 1.2
    node_graph = jnp.zeros(N, jnp.int32)
    node_mask = jnp.ones(N, bool)
    senders, receivers, edge_mask = radius_graph_flat(
        jnp.asarray(pos), node_graph, node_mask, 2.5, E_cap)
    trip = build_triplets(senders, receivers, edge_mask, N, D)
    E = senders.shape[0]
    e1 = rng.normal(size=(E, h)).astype(np.float32)
    rbf0 = rng.normal(size=(E, nr)).astype(np.float32)
    T = trip.idx_kj.shape[0]
    sbf = rng.normal(size=(T, ns * nr)).astype(np.float32)
    return trip, jnp.asarray(e1), jnp.asarray(rbf0), jnp.asarray(sbf)


def _sw(x):
    return x / (1.0 + np.exp(-x))


def _np_dimenetpp_update_e(p, e1, rbf0, sbf, trip):
    """Straight-line reference equations (dimenetpp.py:136-160)."""
    W = lambda n: np.asarray(p[n]["kernel"])
    B = lambda n: np.asarray(p[n]["bias"])
    x_ji = _sw(e1 @ W("Dense_0") + B("Dense_0"))
    x_kj = _sw(e1 @ W("Dense_1") + B("Dense_1"))
    rbf = (rbf0 @ W("Dense_2")) @ W("Dense_3")           # lin_rbf1, lin_rbf2
    x_kj = x_kj * rbf
    x_kj = _sw(x_kj @ W("Dense_4"))                      # lin_down
    s = (sbf @ W("Dense_5")) @ W("Dense_6")              # lin_sbf1, lin_sbf2
    idx_kj = np.asarray(trip.idx_kj)
    idx_ji = np.asarray(trip.idx_ji)
    tmask = np.asarray(trip.mask)
    m = x_kj[idx_kj] * s                                 # triplet messages
    m[~tmask] = 0.0
    agg = np.zeros_like(x_kj)
    np.add.at(agg, idx_ji[tmask], m[tmask])
    x2 = _sw(agg @ W("Dense_7"))                         # lin_up
    e1n = x_ji + x2
    res = lambda n, x: x + _sw(_sw(x @ W(f"{n}/Dense_0")
                                   + B(f"{n}/Dense_0")) @ W(f"{n}/Dense_1")
                               + B(f"{n}/Dense_1"))
    e1n = res("ResidualLayer_0", e1n)                    # num_before_skip=1
    e1n = _sw(e1n @ W("Dense_8") + B("Dense_8")) + e1    # skip
    e1n = res("ResidualLayer_1", e1n)                    # num_after_skip=2
    e1n = res("ResidualLayer_2", e1n)
    e2 = (rbf0 @ W("Dense_9")) * e1n                     # lin_rbf
    return e1n, e2


def test_dimenetpp_update_e_matches_numpy_reference():
    h, ie, be, ns, nr = 16, 8, 4, 3, 4
    trip, e1, rbf0, sbf = _tiny_problem(h, ie, be, ns, nr)
    ue = UpdateE(hidden_channels=h, int_emb_size=ie, basis_emb_size_dist=be,
                 basis_emb_size_angle=be, basis_emb_size_torsion=be,
                 use_torsion=False)
    params = ue.init(jax.random.PRNGKey(0), e1, rbf0, sbf, None, trip)
    out1, out2 = ue.apply(params, e1, rbf0, sbf, None, trip)

    flat = {}
    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict) and "kernel" not in v and "bias" not in v:
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = v
    walk(params["params"])
    ref1, ref2 = _np_dimenetpp_update_e(flat, np.asarray(e1),
                                        np.asarray(rbf0), np.asarray(sbf),
                                        trip)
    em = np.asarray(trip.edge_mask)
    np.testing.assert_allclose(np.asarray(out1)[em], ref1[em],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out2)[em], ref2[em],
                               rtol=2e-5, atol=2e-5)


def test_dimenetpp_param_inventory():
    """Every UpdateE layer carries exactly the reference update_e's
    parameter set (dimenetpp.py:86-106) at DimeNet++ default sizes — and
    no torsion projection exists anywhere in the tree."""
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    mols = synthetic_molecules(2, seed=0, max_atoms=8)
    g = next(iter(MoleculeLoader(mols, 2, n_node_pad=16)))
    m = DimeNetPP(num_layers=2, hidden_channels=32, int_emb_size=16,
                  out_emb_channels=24, num_spherical=3, num_radial=4,
                  max_edges=256, max_in_degree=8)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), g)["params"]
    blk = params["UpdateE_0"]
    shp = {k: jax.tree.map(lambda a: a.shape, dict(v))
           for k, v in blk.items()}
    h, ie, be, ns, nr = 32, 16, 8, 3, 4
    assert shp["Dense_0"]["kernel"] == (h, h) and "bias" in shp["Dense_0"]
    assert shp["Dense_1"]["kernel"] == (h, h) and "bias" in shp["Dense_1"]
    assert shp["Dense_2"] == {"kernel": (nr, be)}        # lin_rbf1, no bias
    assert shp["Dense_3"] == {"kernel": (be, h)}         # lin_rbf2
    assert shp["Dense_4"] == {"kernel": (h, ie)}         # lin_down
    assert shp["Dense_5"] == {"kernel": (ns * nr, be)}   # lin_sbf1
    assert shp["Dense_6"] == {"kernel": (be, ie)}        # lin_sbf2
    assert shp["Dense_7"] == {"kernel": (ie, h)}         # lin_up
    assert shp["Dense_8"]["kernel"] == (h, h)            # skip lin, bias
    assert shp["Dense_9"] == {"kernel": (nr, h)}         # lin_rbf (e2)
    # exactly 10 linears + 3 residual layers, nothing else
    assert sorted(k for k in blk if k.startswith("Dense")) == [
        f"Dense_{i}" for i in range(10)]
    assert sorted(k for k in blk if k.startswith("Residual")) == [
        "ResidualLayer_0", "ResidualLayer_1", "ResidualLayer_2"]
    # no torsion basis projection anywhere (ns*ns*nr-shaped input)
    leaves = jax.tree.leaves_with_path(params)
    for path, leaf in leaves:
        assert leaf.shape[:1] != (ns * ns * nr,), path
