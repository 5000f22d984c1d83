"""Expert parallelism: Switch-style top-1 MoE layer over an ``expert``
mesh axis.

The reference has no mixture-of-experts anywhere (SURVEY §2.10 — no
model parallelism of any kind); this is a new TPU-native capability for
scaling *readout/head capacity* (e.g. multi-task molecular property
heads) past what fits replicated. Each device owns ``num_experts / P``
expert MLPs; tokens (graph embeddings) are gated top-1 and shipped to
their expert's device with ONE ``all_to_all`` over ICI, processed, and
shipped back — the canonical Switch-transformer dispatch, with a static
per-device capacity bound instead of dynamic shapes:

* dispatch buffers are ``[P, capacity, F]`` (static); tokens beyond an
  expert's capacity are DROPPED and pass through the residual path, with
  the drop count reported (the repo-wide overflow-accounting convention —
  never silently wrong).
* position-in-buffer is a cumulative-sum rank over the one-hot
  destination matrix — sort-free, MXU/VPU-friendly.
* the combine step is the exact transpose of dispatch, so autodiff
  through the layer is a second all_to_all (XLA derives it from the
  scan-free primitive chain; no custom VJP needed).

``moe_dense_reference`` computes the identical function without the mesh
(every expert applied to every token, one-hot gated) — the parity oracle.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(key, num_experts: int, d_in: int, d_hidden: int,
                    d_out: int):
    """Expert MLPs (2-layer, gelu) + gating matrix, stacked on a leading
    expert axis so the expert dim shards over the mesh."""
    k1, k2, k3, kg = jax.random.split(key, 4)
    s1 = (2.0 / (d_in + d_hidden)) ** 0.5
    s2 = (2.0 / (d_hidden + d_out)) ** 0.5
    return {
        "w1": s1 * jax.random.normal(k1, (num_experts, d_in, d_hidden)),
        "b1": jnp.zeros((num_experts, d_hidden)),
        "w2": s2 * jax.random.normal(k2, (num_experts, d_hidden, d_out)),
        "b2": jnp.zeros((num_experts, d_out)),
        "wg": 0.02 * jax.random.normal(kg, (d_in, num_experts)),
    }


def _expert_mlp(p_local, x):
    """x [E_local, C*, F_in] -> [E_local, C*, F_out] (batched over the
    local expert axis)."""
    h = jax.nn.gelu(jnp.einsum("ecf,efh->ech", x, p_local["w1"])
                    + p_local["b1"][:, None, :])
    return (jnp.einsum("ech,eho->eco", h, p_local["w2"])
            + p_local["b2"][:, None, :])


def moe_dense_reference(params, x):
    """Oracle: every expert on every token, one-hot top-1 gated, no
    capacity bound."""
    logits = x @ params["wg"]                        # [B, E]
    exp = jnp.argmax(logits, axis=-1)
    gate = jax.nn.softmax(logits, axis=-1)
    gval = jnp.take_along_axis(gate, exp[:, None], axis=1)[:, 0]
    h = jax.nn.gelu(jnp.einsum("bf,efh->ebh", x, params["w1"])
                    + params["b1"][:, None, :])
    y = (jnp.einsum("ebh,eho->ebo", h, params["w2"])
         + params["b2"][:, None, :])                 # [E, B, O]
    sel = y[exp, jnp.arange(x.shape[0])]             # [B, O]
    return sel * gval[:, None]


def make_ep_moe(mesh: Mesh, num_experts: int, capacity: int, *,
                axis: str = "expert") -> Callable:
    """Returns ``apply(params, x) -> (y, dropped)``.

    ``params`` placed with :func:`ep_shard_params`; ``x [B, F]`` sharded
    along ``axis`` (the same devices host both token shards and expert
    shards — the standard EP layout). ``capacity``: max tokens a single
    expert accepts *from one source device* per step. ``dropped`` is the
    global number of capacity-overflow tokens (their output rows are 0 —
    combine them with a residual connection upstream).
    """
    nd = mesh.shape[axis]
    assert num_experts % nd == 0, (num_experts, nd)
    e_local = num_experts // nd

    def shard_fn(params, x):
        b = x.shape[0]                               # local tokens
        logits = x @ params["wg"]                    # wg replicated [F, E]
        exp = jnp.argmax(logits, axis=-1)            # [b] global expert id
        gate = jax.nn.softmax(logits, axis=-1)
        gval = jnp.take_along_axis(gate, exp[:, None], axis=1)[:, 0]

        # rank of each token within its expert's queue (sort-free)
        onehot = jax.nn.one_hot(exp, num_experts, dtype=jnp.int32)  # [b, E]
        rank = jnp.cumsum(onehot, axis=0) - 1        # [b, E]
        pos = jnp.take_along_axis(rank, exp[:, None], axis=1)[:, 0]  # [b]
        keep = pos < capacity
        dropped_local = jnp.sum(~keep)

        # dispatch buffer: [E, capacity, F], destination-major so a
        # reshape to [P, e_local * capacity, F] all_to_alls cleanly
        buf = jnp.zeros((num_experts, capacity, x.shape[1]), x.dtype)
        e_idx = jnp.where(keep, exp, 0)
        p_idx = jnp.where(keep, pos, 0)
        val = jnp.where(keep[:, None], x, 0)
        buf = buf.at[e_idx, p_idx].add(val)          # unique slots: add==set
        buf = buf.reshape(nd, e_local * capacity, x.shape[1])
        recv = jax.lax.all_to_all(buf, axis, 0, 0, tiled=False)
        # recv [P_src, e_local * capacity, F]: tokens sent TO my experts
        recv = recv.reshape(nd, e_local, capacity, -1)
        recv = recv.transpose(1, 0, 2, 3).reshape(
            e_local, nd * capacity, -1)              # per local expert

        out = _expert_mlp(params, recv)              # [e_local, P*C, O]

        # exact inverse of the dispatch reshuffle
        out = out.reshape(e_local, nd, capacity, -1).transpose(1, 0, 2, 3)
        out = out.reshape(nd, e_local * capacity, -1)
        back = jax.lax.all_to_all(out, axis, 0, 0, tiled=False)
        back = back.reshape(num_experts, capacity, -1)  # my tokens' rows
        y = back[e_idx, p_idx]                       # [b, O]
        y = jnp.where(keep[:, None], y, 0) * gval[:, None]
        return y, jax.lax.psum(dropped_local, axis)

    param_specs = {"w1": P(axis), "b1": P(axis), "w2": P(axis),
                   "b2": P(axis), "wg": P()}
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(param_specs, P(axis)),
        out_specs=(P(axis), P()),
        axis_names=frozenset({axis}),
        check_vma=False,
    )


def ep_shard_params(params, mesh: Mesh, axis: str = "expert"):
    """Experts sharded on their leading axis; the gating matrix
    replicated."""
    def put(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = P() if name == "wg" else P(axis)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, params)
