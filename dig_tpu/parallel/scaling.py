"""Weak-scaling measurement for the graph-parallel path.

Real multi-chip hardware is not reachable from this environment, so the
scaling argument is made from its two measurable preconditions, on the
virtual CPU mesh (``--xla_force_host_platform_device_count``):

1. **Constant per-device communication volume.**  At fixed per-device
   graph size, the halo rows each device exchanges per step must not
   grow with the number of parts P.  With constant per-device compute
   this keeps the comm/compute ratio flat — the precondition for the
   >=80% weak-scaling-efficiency target (BASELINE.json, 1 chip -> 2
   hosts; reference analog: the boundary volume of
   ``dig/lsgraph/method/GraphFMOB`` METIS parts).
2. **P-independent collective count.**  One fused all-to-all per halo
   exchange (not P point-to-point sends), so the step's collective
   *count* is a property of the model depth, not of the mesh size.

Both are measured by :func:`measure_gp_scaling` on a ring-lattice graph
(every node linked to its k nearest neighbours per side), whose optimal
partition has an exactly constant boundary of k rows per cut — so the
numbers also regression-test the GGGP+FM partitioner's cut quality.
"""
from __future__ import annotations

import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import make_mesh
from .gp import make_gp_train_step, prepare_gp_graph, slab_layout


def ring_lattice(n: int, k: int):
    """Directed ring lattice: each node sends to its k nearest neighbours
    on each side. Returns (senders, receivers), each [n * 2k]."""
    offs = np.concatenate([np.arange(1, k + 1), -np.arange(1, k + 1)])
    senders = np.repeat(np.arange(n), 2 * k)
    receivers = (senders.reshape(n, 2 * k) + offs[None, :]).ravel() % n
    return senders.astype(np.int64), receivers.astype(np.int64)


def count_collectives(hlo_text: str) -> Dict[str, int]:
    """Count collective *ops* in HLO/StableHLO text. Works on lowered
    StableHLO (``stablehlo.all_to_all``) and on compiled HLO
    (``all-to-all`` / async ``all-to-all-start`` pairs, counted once)."""
    counts = {}
    for name in ("all-to-all", "all-reduce", "collective-permute",
                 "all-gather", "reduce-scatter"):
        us = name.replace("-", "_")
        stable = len(re.findall(rf"stablehlo\.{us}", hlo_text))
        starts = len(re.findall(rf"{name}-start", hlo_text))
        plain = len(re.findall(
            rf"{name}(?!-start|-done)[.(\s]", hlo_text))
        counts[us] = stable if stable else (starts if starts else plain)
    return counts


def measure_gp_scaling(P: int, n_local: int = 256, k: int = 4,
                       in_dim: int = 32, hidden: int = 16,
                       num_classes: int = 4,
                       compile_step: bool = True) -> Dict:
    """Weak-scaling probe at P parts with ``n_local`` nodes per device.

    Returns per-device halo-exchange volume (real rows and padded-buffer
    rows, bytes at fp32 x ``hidden``) and the collective counts of one
    compiled train step on a P-device mesh.
    """
    N = P * n_local
    senders, receivers = ring_lattice(N, k)
    g, perm, H, C = prepare_gp_graph(senders, receivers, N, P)

    send_mask = np.asarray(g.send_mask)          # [P, P, K]
    send_rows = send_mask.sum(axis=(1, 2))       # real rows sent per device
    halo_rows = np.asarray(
        jnp.sum(g.send_mask, axis=(0, 2)))       # rows received per device

    out = {
        "P": P, "n_local": n_local, "k": k,
        "nodes_per_part": int(C),
        "halo_pad_rows": int(H),                 # padded halo buffer
        "send_rows_max": int(send_rows.max()),
        "send_rows_mean": float(send_rows.mean()),
        "recv_rows_max": int(halo_rows.max()),
        "halo_bytes_per_device": int(send_rows.max()) * hidden * 4,
        "edges_per_device": int(np.asarray(g.edge_mask).sum(1).max()),
    }

    if compile_step:
        if len(jax.devices()) < P:
            raise RuntimeError(f"need {P} devices, have {len(jax.devices())}")
        mesh = make_mesh((P,), ("data",), devices=jax.devices()[:P])
        init_fn, step, _ = make_gp_train_step(
            mesh, num_layers=2, hidden=hidden, num_classes=num_classes,
            in_dim=in_dim, halo_size=H, nodes_per_part=C)
        rng = np.random.RandomState(0)
        x = rng.randn(N, in_dim).astype(np.float32)
        y = rng.randint(0, num_classes, N)
        m = np.ones(N, bool)
        xs = jnp.asarray(slab_layout(x, perm, P, C))
        ys = jnp.asarray(slab_layout(y, perm, P, C))
        ms = jnp.asarray(slab_layout(m, perm, P, C))
        params, opt_state = init_fn(jax.random.PRNGKey(0), xs, g)
        lowered = step.lower(params, opt_state, g, xs, ys, ms)
        # count on the LOGICAL (StableHLO) program: this is the design
        # property — one fused collective per exchange. Backends may
        # legally decompose an all-to-all into per-pair transfers.
        out["collectives"] = count_collectives(lowered.as_text())
    return out
