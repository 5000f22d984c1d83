"""Ring-pipelined halo exchange (parallel/halo.halo_exchange_sum_ring) vs
the a2a path and a dense oracle — 8-device CPU mesh."""
import jax.numpy as jnp
import numpy as np

from dig_tpu.parallel import make_mesh
from dig_tpu.parallel.halo import (build_ring_plan, halo_exchange_sum,
                                   halo_exchange_sum_ring)
from dig_tpu.parallel.partition import build_partitions


def _graph(N=64, deg=6, seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, N, N * deg)
    receivers = rng.integers(0, N, N * deg)
    keep = senders != receivers
    return senders[keep], receivers[keep], N


def test_ring_matches_a2a_and_dense():
    senders, receivers, N = _graph()
    mesh = make_mesh((8,), ("graph",))
    pg = build_partitions(senders, receivers, N, 8)
    F = 16
    rng = np.random.default_rng(1)
    x_parts = np.zeros((8, pg.nodes_per_part, F), np.float32)
    x_full = rng.normal(size=(N, F)).astype(np.float32)
    C = pg.nodes_per_part
    for n in range(N):
        new = pg.perm[n]
        x_parts[new // C, new % C] = x_full[n]

    xj = jnp.asarray(x_parts)
    out_a2a = np.asarray(halo_exchange_sum(xj, pg, mesh))
    out_ring = np.asarray(halo_exchange_sum_ring(xj, pg, mesh))
    np.testing.assert_allclose(out_ring, out_a2a, atol=1e-5)

    # dense oracle: out[r] = sum of x[s] over edges s->r
    dense = np.zeros((N, F), np.float32)
    for s, r in zip(senders, receivers):
        dense[r] += x_full[s]
    for n in range(N):
        new = pg.perm[n]
        np.testing.assert_allclose(out_ring[new // C, new % C], dense[n],
                                   atol=1e-4)


def test_ring_plan_covers_all_edges():
    senders, receivers, N = _graph(seed=3)
    pg = build_partitions(senders, receivers, N, 8)
    plan = build_ring_plan(pg)
    assert int(plan.e_mask.sum()) == int(pg.edge_mask.sum())
