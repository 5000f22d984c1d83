"""Core-op tests: segment reductions, radius graph, triplets, torsion, basis.

Brute-force numpy oracles mirror the reference semantics
(``dig/threedgraph/utils/geometric_computing.py``) so these are parity tests
in disguise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dig_tpu.ops import (
    segment_sum, segment_mean, segment_max, segment_softmax,
    radius_graph_flat, build_triplets, triplet_geometry, torsion_angles,
)
from dig_tpu.ops.triplets import edge_distances
from dig_tpu.ops import basis


def test_segment_ops_masked():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(10, 4)).astype(np.float32)
    seg = np.array([0, 0, 1, 1, 1, 2, 2, 0, 0, 0], np.int32)
    mask = np.array([1, 1, 1, 1, 0, 1, 1, 0, 0, 0], bool)

    s = segment_sum(jnp.asarray(data), jnp.asarray(seg), 3, jnp.asarray(mask))
    want = np.zeros((3, 4), np.float32)
    for i in range(10):
        if mask[i]:
            want[seg[i]] += data[i]
    np.testing.assert_allclose(np.asarray(s), want, rtol=1e-6)

    m = segment_mean(jnp.asarray(data), jnp.asarray(seg), 3, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(m)[0], want[0] / 2, rtol=1e-6)

    mx = segment_max(jnp.asarray(data), jnp.asarray(seg), 3, jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(mx)[1], np.max(data[2:4], axis=0), rtol=1e-6)

    sm = segment_softmax(jnp.asarray(data[:, 0]), jnp.asarray(seg), 3,
                         jnp.asarray(mask))
    sums = segment_sum(sm, jnp.asarray(seg), 3, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(sums), [1, 1, 1], atol=1e-6)


def _brute_radius_edges(pos, graph_id, mask, cutoff):
    """All ordered pairs (j sender, i receiver) with dist < cutoff."""
    n = len(pos)
    out = set()
    for i in range(n):
        for j in range(n):
            if i == j or not (mask[i] and mask[j]):
                continue
            if graph_id[i] != graph_id[j]:
                continue
            if np.linalg.norm(pos[i] - pos[j]) < cutoff:
                out.add((j, i))
    return out


def _make_batch(rng, n=14, g=3):
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 1.5
    graph_id = np.sort(rng.integers(0, g, size=n)).astype(np.int32)
    mask = np.ones(n, bool)
    mask[-2:] = False
    return pos, graph_id, mask


def test_radius_graph_matches_bruteforce():
    rng = np.random.default_rng(1)
    pos, graph_id, mask = _make_batch(rng)
    cutoff = 2.0
    senders, receivers, emask = radius_graph_flat(
        jnp.asarray(pos), jnp.asarray(graph_id), jnp.asarray(mask),
        cutoff, max_edges=256)
    got = {(int(s), int(r)) for s, r, m in
           zip(np.asarray(senders), np.asarray(receivers), np.asarray(emask)) if m}
    want = _brute_radius_edges(pos, graph_id, mask, cutoff)
    assert got == want
    assert len(want) > 0


def test_triplets_match_bruteforce():
    rng = np.random.default_rng(2)
    pos, graph_id, mask = _make_batch(rng)
    cutoff = 2.5
    senders, receivers, emask = radius_graph_flat(
        jnp.asarray(pos), jnp.asarray(graph_id), jnp.asarray(mask),
        cutoff, max_edges=256)
    trip = build_triplets(senders, receivers, emask, num_nodes=len(pos),
                          max_in_degree=16)
    s, r, em = np.asarray(senders), np.asarray(receivers), np.asarray(emask)
    edges = [(int(s[e]), int(r[e])) for e in range(len(s))]
    # oracle: for each edge e=(j,i), for each edge e'=(k,j), k != i
    want = set()
    for e, (j, i) in enumerate(edges):
        if not em[e]:
            continue
        for e2, (k, j2) in enumerate(edges):
            if em[e2] and j2 == j and k != i:
                want.add((e2, e))  # (idx_kj, idx_ji)
    got = {(int(a), int(b)) for a, b, m in
           zip(np.asarray(trip.idx_kj), np.asarray(trip.idx_ji),
               np.asarray(trip.mask)) if m}
    assert got == want
    assert len(want) > 10

    # angles
    angle = np.asarray(triplet_geometry(jnp.asarray(pos), trip))
    tm = np.asarray(trip.mask)
    ii, jj, kk = (np.asarray(trip.idx_i), np.asarray(trip.idx_j),
                  np.asarray(trip.idx_k))
    for t in np.nonzero(tm)[0][:50]:
        v1 = pos[ii[t]] - pos[jj[t]]
        v2 = pos[kk[t]] - pos[jj[t]]
        cosang = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
        np.testing.assert_allclose(angle[t], np.arccos(np.clip(cosang, -1, 1)),
                                   atol=1e-4)


def _brute_torsion(pos, edges, em, idx_kj, idx_ji, tmask):
    """Reference semantics: min over k_n in N(j) \\ {i} of dihedral."""
    out = {}
    for t in np.nonzero(tmask)[0]:
        e_kj, e_ji = int(idx_kj[t]), int(idx_ji[t])
        j, i = edges[e_ji]
        k = edges[e_kj][0]
        best = None
        for e2, (kn, j2) in enumerate(edges):
            if not em[e2] or j2 != j or kn == i:
                continue
            pj = pos[j]
            ji = pos[i] - pj
            j0 = pos[k] - pj
            jn = pos[kn] - pj
            p1 = np.cross(ji, j0)
            p2 = np.cross(ji, jn)
            a = p1 @ p2
            b = np.cross(p1, p2) @ ji / np.linalg.norm(ji)
            tor = np.arctan2(b, a)
            if tor <= 0:
                tor += 2 * np.pi
            best = tor if best is None else min(best, tor)
        out[t] = best
    return out


def test_torsion_matches_bruteforce():
    rng = np.random.default_rng(3)
    pos, graph_id, mask = _make_batch(rng)
    cutoff = 2.5
    senders, receivers, emask = radius_graph_flat(
        jnp.asarray(pos), jnp.asarray(graph_id), jnp.asarray(mask),
        cutoff, max_edges=256)
    trip = build_triplets(senders, receivers, emask, num_nodes=len(pos),
                          max_in_degree=16)
    tors = np.asarray(torsion_angles(jnp.asarray(pos), trip))
    s, r, em = np.asarray(senders), np.asarray(receivers), np.asarray(emask)
    edges = [(int(s[e]), int(r[e])) for e in range(len(s))]
    want = _brute_torsion(pos, edges, em, np.asarray(trip.idx_kj),
                          np.asarray(trip.idx_ji), np.asarray(trip.mask))
    for t, val in list(want.items())[:80]:
        assert val is not None
        # Compare circularly: torsion 0 and 2*pi are the same angle, and the
        # (0, 2*pi] remap is a branch point where fp noise flips the side.
        diff = abs(float(tors[t]) - float(val))
        diff = min(diff, 2 * np.pi - diff)
        assert diff < 1e-4, (t, float(tors[t]), float(val))


def test_bessel_basis_orthonormalish():
    x = jnp.linspace(1e-3, 1.0, 2001)
    tab = basis.bessel_table(3, 4, x)  # [2001, 3, 4]
    assert tab.shape == (2001, 3, 4)
    # l=0 basis is sqrt(2) sin(k pi x)/x normalized on [0, 1] with weight x^2
    f = np.asarray(tab[:, 0, 0])
    xs = np.asarray(x)
    norm = np.trapezoid(f * f * xs * xs, xs)
    np.testing.assert_allclose(norm, 1.0, atol=1e-2)


def test_sph_harm_values():
    theta = jnp.asarray([0.3, 1.2, 2.0])
    t0 = basis.sph_m0_table(3, theta)
    np.testing.assert_allclose(np.asarray(t0[:, 0]),
                               np.full(3, 0.5 / np.sqrt(np.pi)), atol=1e-6)
    # Y_1^0 = sqrt(3/(4pi)) cos(theta)
    np.testing.assert_allclose(
        np.asarray(t0[:, 1]),
        np.sqrt(3 / (4 * np.pi)) * np.cos(np.asarray(theta)), atol=1e-6)
    full = basis.sph_full_table(3, theta, jnp.asarray([0.1, 0.4, 0.9]))
    assert full.shape == (3, 9)


def test_edge_distance_grads_finite():
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)),
                      dtype=jnp.float32)
    senders = jnp.asarray([0, 1, 0, 0], jnp.int32)
    receivers = jnp.asarray([1, 2, 0, 0], jnp.int32)
    emask = jnp.asarray([True, True, False, False])

    def f(p):
        return jnp.sum(edge_distances(p, senders, receivers, emask))

    g = jax.grad(f)(pos)
    assert np.all(np.isfinite(np.asarray(g)))

def test_expand_kj_and_triplets_to_edges_match_gather_scatter():
    """expand_kj fwd == masked gather; its custom VJP and the reshape-sum
    triplets_to_edges must match the plain gather/segment_sum formulation
    exactly (same terms, dense order)."""
    from dig_tpu.ops.triplets import expand_kj, triplets_to_edges

    rng = np.random.default_rng(7)
    pos, graph_id, mask = _make_batch(rng, n=20, g=2)
    senders, receivers, emask = radius_graph_flat(
        jnp.asarray(pos), jnp.asarray(graph_id), jnp.asarray(mask),
        2.5, max_edges=128)
    E = senders.shape[0]
    trip = build_triplets(senders, receivers, emask, num_nodes=len(pos),
                          max_in_degree=16)
    x = jnp.asarray(rng.normal(size=(E, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(trip.mask.shape[0], 6)).astype(np.float32))

    def via_custom(x):
        return jnp.sum(triplets_to_edges(expand_kj(x, trip) * w, E) ** 2)

    def via_scatter(x):
        t = jnp.where(trip.mask[:, None], x[trip.idx_kj], 0) * w
        return jnp.sum(segment_sum(t, trip.idx_ji, E, mask=trip.mask) ** 2)

    np.testing.assert_allclose(float(via_custom(x)), float(via_scatter(x)),
                               rtol=1e-5)
    g1 = jax.grad(via_custom)(x)
    g2 = jax.grad(via_scatter)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(g1).sum()) > 0


def test_expand_kj_vjp_exact_under_edge_cap_truncation():
    """With the edge list truncated by max_edges, the reverse table still
    enumerates exactly the surviving triplets (out-deg <= in-deg cap)."""
    from dig_tpu.ops.triplets import expand_kj, triplets_to_edges

    rng = np.random.default_rng(8)
    pos = rng.normal(size=(12, 3)).astype(np.float32) * 0.8  # dense clump
    graph_id = np.zeros(12, np.int32)
    mask = np.ones(12, bool)
    senders, receivers, emask = radius_graph_flat(
        jnp.asarray(pos), jnp.asarray(graph_id), jnp.asarray(mask),
        3.0, max_edges=64)  # truncates: full clump would need 132
    E = senders.shape[0]
    trip = build_triplets(senders, receivers, emask, num_nodes=12,
                          max_in_degree=12)
    x = jnp.asarray(rng.normal(size=(E, 4)).astype(np.float32))

    def via_custom(x):
        return jnp.sum(triplets_to_edges(expand_kj(x, trip), E))

    def via_scatter(x):
        t = jnp.where(trip.mask[:, None], x[trip.idx_kj], 0)
        return jnp.sum(segment_sum(t, trip.idx_ji, E, mask=trip.mask))

    g1 = jax.grad(via_custom)(x)
    g2 = jax.grad(via_scatter)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def _random_conformation(rng, n_graphs=3, n_pad=24, box=4.0):
    node_graph = np.zeros(n_pad, np.int32)
    node_mask = np.zeros(n_pad, bool)
    sizes = rng.integers(4, n_pad // n_graphs, n_graphs)
    off = 0
    for g, s in enumerate(sizes):
        node_graph[off:off + s] = g
        node_mask[off:off + s] = True
        off += s
    pos = rng.normal(size=(n_pad, 3)).astype(np.float32) * box / 3
    return (jnp.asarray(pos), jnp.asarray(node_graph), jnp.asarray(node_mask))


def test_radius_graph_nk_matches_flat():
    """At K >= max degree, the NK layout holds exactly the radius graph."""
    from dig_tpu.ops.radius import radius_graph_flat, radius_graph_nk
    rng = np.random.default_rng(7)
    pos, node_graph, node_mask = _random_conformation(rng)
    cutoff = 2.5
    s, r, em = radius_graph_flat(pos, node_graph, node_mask, cutoff, 600)
    want = {(int(a), int(b)) for a, b, m in
            zip(np.asarray(s), np.asarray(r), np.asarray(em)) if m}

    g = radius_graph_nk(pos, node_graph, node_mask, cutoff, k=24)
    got = {(int(a), int(b)) for a, b, m in
           zip(np.asarray(g.senders), np.asarray(g.receivers),
               np.asarray(g.edge_mask)) if m}
    assert got == want and len(want) > 20

    # rev_edge really points at the reverse edge.
    sa, ra, ma = (np.asarray(g.senders), np.asarray(g.receivers),
                  np.asarray(g.edge_mask))
    rev = np.asarray(g.rev_edge).reshape(-1)
    for e in np.nonzero(ma)[0]:
        f = rev[e]
        assert ma[f] and sa[f] == ra[e] and ra[f] == sa[e]


def test_radius_graph_nk_symmetric_under_truncation():
    from dig_tpu.ops.radius import radius_graph_nk
    rng = np.random.default_rng(3)
    pos, node_graph, node_mask = _random_conformation(rng, box=2.0)
    g = radius_graph_nk(pos, node_graph, node_mask, cutoff=4.0, k=5)
    edges = {(int(a), int(b)) for a, b, m in
             zip(np.asarray(g.senders), np.asarray(g.receivers),
                 np.asarray(g.edge_mask)) if m}
    assert len(edges) > 10
    for a, b in edges:
        assert (b, a) in edges
    rev = np.asarray(g.rev_edge).reshape(-1)
    ma = np.asarray(g.edge_mask)
    sa, ra = np.asarray(g.senders), np.asarray(g.receivers)
    for e in np.nonzero(ma)[0]:
        f = rev[e]
        assert ma[f] and sa[f] == ra[e] and ra[f] == sa[e]


def test_build_triplets_nk_matches_general():
    """NK triplets == general build_triplets on the same edge set."""
    from dig_tpu.ops.radius import radius_graph_nk
    from dig_tpu.ops.triplets import build_triplets_nk, edges_to_nodes_nk
    rng = np.random.default_rng(11)
    pos, node_graph, node_mask = _random_conformation(rng)
    K = 24
    g = radius_graph_nk(pos, node_graph, node_mask, cutoff=2.5, k=K)
    trip = build_triplets_nk(g)

    # Oracle: triplet set {(k, j, i)} with k != i over the masked edges.
    sa, ra, ma = (np.asarray(g.senders), np.asarray(g.receivers),
                  np.asarray(g.edge_mask))
    want = set()
    for e in np.nonzero(ma)[0]:
        j, i = sa[e], ra[e]
        for f in np.nonzero(ma)[0]:
            if ra[f] == j and sa[f] != i:
                want.add((int(sa[f]), int(j), int(i)))
    got = {(int(k), int(j), int(i)) for k, j, i, m in
           zip(np.asarray(trip.idx_k), np.asarray(trip.idx_j),
               np.asarray(trip.idx_i), np.asarray(trip.mask)) if m}
    assert got == want and len(want) > 20

    # idx_kj / idx_ji consistency with the flat edge list.
    tk = np.asarray(trip.idx_kj); tj = np.asarray(trip.idx_ji)
    tm = np.asarray(trip.mask)
    for t in np.nonzero(tm)[0]:
        assert ma[tk[t]] and ma[tj[t]]
        assert ra[tk[t]] == sa[tj[t]]      # k->j feeds j->i

    # expand_kj VJP exactness in the NK layout.
    from dig_tpu.ops.triplets import expand_kj
    E = len(sa)
    x = jnp.asarray(rng.normal(size=(E, 8)).astype(np.float32))

    def f_custom(x):
        return jnp.sum(jnp.sin(expand_kj(x, trip)))

    def f_plain(x):
        gathered = jnp.where(trip.mask[:, None], x[trip.idx_kj], 0)
        return jnp.sum(jnp.sin(gathered))

    g1 = jax.grad(f_custom)(x)
    g2 = jax.grad(f_plain)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)

    # edges_to_nodes_nk == segment_sum over receivers.
    from dig_tpu.ops.segment import segment_sum
    data = jnp.asarray(rng.normal(size=(E, 8)).astype(np.float32))
    a = edges_to_nodes_nk(data, pos.shape[0], mask=g.edge_mask)
    b = segment_sum(data, g.receivers, pos.shape[0], mask=g.edge_mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_coalesce_mean_vs_numpy_oracle():
    """coalesce_mean: duplicate (s, r) groups carry the group mean, one
    representative per group, masked rows zeroed/excluded (PyG coalesce
    analog, static-shape contract)."""
    import jax.numpy as jnp
    from dig_tpu.ops import coalesce_mean

    rng = np.random.default_rng(0)
    E, N, F = 64, 7, 3
    s = rng.integers(0, N, E).astype(np.int32)
    r = rng.integers(0, N, E).astype(np.int32)
    vals = rng.normal(size=(E, F)).astype(np.float32)
    mask = rng.random(E) > 0.25

    mean_vals, rep = jax.jit(
        lambda v, a, b, m: coalesce_mean(v, a, b, N, m))(
            jnp.asarray(vals), jnp.asarray(s), jnp.asarray(r),
            jnp.asarray(mask))
    mean_vals, rep = np.asarray(mean_vals), np.asarray(rep)

    groups = {}
    for i in range(E):
        if mask[i]:
            groups.setdefault((int(s[i]), int(r[i])), []).append(i)
    # exactly one representative per distinct live pair
    assert rep.sum() == len(groups)
    assert not rep[~mask].any()
    for key, idxs in groups.items():
        want = vals[idxs].mean(axis=0)
        for i in idxs:
            np.testing.assert_allclose(mean_vals[i], want, rtol=1e-5,
                                       atol=1e-6)
        assert rep[idxs].sum() == 1
    np.testing.assert_allclose(mean_vals[~mask], 0.0)
