"""Headline benchmark: edges/s/chip through the sparse aggregation hot path.

Runs the flagship 3D-GNN training step (SchNet config from BASELINE.json:
batch 32, 4 interactions, 128 hidden — the SpMM/segment-sum skeleton shared
by DimeNet++/SphereNet) on synthetic QM9-shaped molecules and reports
sustained edges/s/chip. ``vs_baseline`` is edges/s relative to the v5e HBM
roofline for this op mix (see _roofline_edges_per_s) — the BASELINE.json
target is >= 0.70 of roofline for the SpMM aggregation.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _roofline_edges_per_s(num_filters: int, num_layers: int,
                          hbm_gbps: float = 819.0) -> float:
    """HBM-bound roofline for the per-edge message+aggregate path.

    Per edge per interaction layer the mandatory HBM traffic (assuming
    weights/activations resident and perfect fusion) is the gathered source
    row + scattered accumulation: ~2 * F * 4 bytes (f32). v5e HBM BW ~819
    GB/s. This is deliberately optimistic — an upper bound to measure
    against, not a soft target.
    """
    bytes_per_edge = 2 * num_filters * 4 * num_layers
    return hbm_gbps * 1e9 / bytes_per_edge


def main():
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SchNet
    from dig_tpu.train.trainer import make_step_fns, make_train_state
    from dig_tpu.ops.radius import _pairwise_same_graph

    batch_size = 32
    num_layers = 4
    hidden = 128
    cutoff = 5.0
    n_node_pad = batch_size * 29
    max_edges = 16384

    mols = synthetic_molecules(4096, seed=0, min_atoms=12, max_atoms=29,
                               box=6.0)
    loader = MoleculeLoader(mols, batch_size, n_node_pad=n_node_pad,
                            shuffle=True, seed=0)
    model = SchNet(cutoff=cutoff, num_layers=num_layers,
                   hidden_channels=hidden, num_filters=hidden,
                   num_gaussians=50, max_edges=max_edges)
    opt = optax.adam(5e-4)
    it = iter(loader)
    g0 = next(it)
    state = make_train_state(model, opt, g0)
    train_step, _ = make_step_fns(model, opt, loss="l1")

    @jax.jit
    def count_edges(g):
        d2, valid = _pairwise_same_graph(g.nodes["pos"], g.node_graph,
                                         g.node_mask)
        return jnp.sum(valid & (d2 < cutoff * cutoff))

    # Warmup / compile.
    state, _ = train_step(state, g0)
    jax.block_until_ready(state.params)

    batches = [g0] + [next(it) for _ in range(19)]
    edges = int(sum(int(count_edges(g)) for g in batches))

    t0 = time.perf_counter()
    for g in batches:
        state, aux = train_step(state, g)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    edges_per_s = edges / dt
    roofline = _roofline_edges_per_s(hidden, num_layers)
    print(json.dumps({
        "metric": "schnet_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / roofline, 4),
    }))


if __name__ == "__main__":
    main()
