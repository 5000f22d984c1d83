"""GraphFMIB — in-batch feature momentum over neighbor-sampled batches.

Parity with the reference's IB variant
(``examples/lsgraph/GraphFMIB/reddit_example.py:15-200``): a
NeighborSampler-style k-hop minibatch (per-layer bipartite blocks,
target nodes placed first), mean aggregation, and per-layer historical
embeddings blended at the sampling boundary —

    agg = (1 - alpha) * agg + alpha * hist[i][targets]     (:141-143)
    hist[i][targets] <- stop_gradient(agg)

followed by ``lin_l(agg) + lin_r(x_target)`` (:146). Inference is the
layer-wise full-graph pass (:153-180), which ignores the histories.

TPU redesign: the sampler runs host-side (numpy) and emits STATIC-SHAPE
:class:`NeighborBatch` pytrees — per-layer node caps ``B * (fanout+1)^d``
and edge caps ``cap * fanout`` with validity masks, nested so every
layer's node set is a prefix of the previous one (static prefix slices
instead of the reference's dynamic ``size[1]``). Histories are explicit
jnp tables threaded through the jitted step (the ScalableGNN
convention, models.py); boundary pushes use out-of-range-drop scatters
so padded rows never touch the table.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import segment_sum

xavier = jax.nn.initializers.glorot_uniform()


class NeighborBatch(NamedTuple):
    """One k-hop sampled minibatch. L layers; caps[d] nodes at depth d
    (depth 0 = innermost/largest set, depth L = the B target nodes).
    ``n_id[:caps[d]]`` is the depth-d node set (prefix nesting)."""
    n_id: np.ndarray                 # [caps[0]] global node ids
    node_mask: np.ndarray            # [caps[0]] valid rows
    src_idx: tuple                   # per layer: [E_l] local src (depth l)
    dst_idx: tuple                   # per layer: [E_l] local dst (depth l+1)
    edge_mask: tuple                 # per layer: [E_l]
    batch_size: int


class NeighborSampledLoader:
    """Static-shape neighbor sampler (reference
    ``torch_geometric.data.NeighborSampler`` role, reddit_example.py:63).

    ``sizes[l]`` = fanout of layer l (applied innermost-first like the
    reference); every batch ships identical shapes so one jitted step
    serves the whole epoch.
    """

    def __init__(self, senders, receivers, num_nodes: int,
                 node_idx, sizes: Sequence[int], batch_size: int,
                 shuffle: bool = True, seed: int = 0):
        order = np.argsort(receivers, kind="stable")
        self.col = np.asarray(senders)[order]
        rp = np.zeros(num_nodes + 1, np.int64)
        np.add.at(rp, np.asarray(receivers) + 1, 1)
        self.rowptr = np.cumsum(rp)
        self.nodes = np.flatnonzero(node_idx) if node_idx.dtype == bool \
            else np.asarray(node_idx)
        self.sizes = list(sizes)
        self.L = len(self.sizes)
        self.B = batch_size
        self.N = num_nodes
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        # caps[d]: max nodes at depth d (depth L = targets)
        self.caps = [batch_size]
        for f in self.sizes:        # innermost fanout first, like reference
            self.caps.insert(0, self.caps[0] * (f + 1))

    def __iter__(self):
        ids = self.nodes.copy()
        if self.shuffle:
            self.rng.shuffle(ids)
        for lo in range(0, len(ids) - self.B + 1, self.B):
            yield self._sample(ids[lo:lo + self.B])

    def _sample(self, batch_ids):
        L, caps = self.L, self.caps
        cur = list(batch_ids)
        pos = {int(g): i for i, g in enumerate(cur)}
        src_idx, dst_idx, edge_mask = [None] * L, [None] * L, [None] * L
        # depth L (targets) down to depth 0: layer l bipartite block is
        # (src at depth l, dst at depth l+1); reference applies adjs
        # outermost-first, so sizes[0] is the innermost fanout
        for l in range(L - 1, -1, -1):
            f = self.sizes[L - 1 - l]
            n_dst = len(cur)
            cap_src, e_cap = caps[l], caps[l + 1] * f
            s_loc, d_loc = [], []
            for d in range(n_dst):
                g = int(cur[d])
                nbrs = self.col[self.rowptr[g]:self.rowptr[g + 1]]
                if len(nbrs) > f:
                    nbrs = self.rng.choice(nbrs, size=f, replace=False)
                for nb in nbrs:
                    nb = int(nb)
                    if nb not in pos:
                        if len(cur) >= cap_src:
                            continue          # cap hit: drop the sample
                        pos[nb] = len(cur)
                        cur.append(nb)
                    s_loc.append(pos[nb])
                    d_loc.append(d)
            si = np.zeros(e_cap, np.int32)
            di = np.zeros(e_cap, np.int32)
            em = np.zeros(e_cap, bool)
            k = len(s_loc)
            si[:k] = s_loc
            di[:k] = d_loc
            em[:k] = True
            src_idx[l], dst_idx[l], edge_mask[l] = si, di, em
        n_id = np.zeros(caps[0], np.int64)
        nm = np.zeros(caps[0], bool)
        n_id[:len(cur)] = cur
        nm[:len(cur)] = True
        return NeighborBatch(n_id=n_id, node_mask=nm,
                             src_idx=tuple(src_idx), dst_idx=tuple(dst_idx),
                             edge_mask=tuple(edge_mask), batch_size=self.B)


class GraphFMIB:
    """In-batch feature-momentum GNN (reference GNN class,
    reddit_example.py:97-180). Functional: histories are explicit jnp
    tables, ``forward`` returns the updated tuple."""

    def __init__(self, num_nodes: int, in_channels: int, hidden: int,
                 out_channels: int, num_layers: int, alpha: float = 0.1):
        self.N = num_nodes
        self.dims = ([in_channels] + [hidden] * (num_layers - 1)
                     + [out_channels])
        self.L = num_layers
        self.alpha = alpha
        # hist[i] holds the PRE-MLP aggregated embedding of layer i, so
        # its width is layer i's input dim (layer_emb_sizes, :195-200)
        self.histories = tuple(
            jnp.zeros((num_nodes, self.dims[i])) for i in range(num_layers))

        class _Net(nn.Module):
            dims: tuple
            caps: tuple
            alpha_: float

            @nn.compact
            def __call__(self, x, batch: NeighborBatch, hists, n_id):
                L = len(self.dims) - 1
                new_h = list(hists)
                alpha = self.alpha_
                for i in range(L):
                    cap_dst = self.caps[i + 1]
                    x_t = x[:cap_dst]
                    msg = jnp.where(batch.edge_mask[i][:, None],
                                    x[batch.src_idx[i]], 0.0)
                    ssum = segment_sum(msg, batch.dst_idx[i], cap_dst)
                    cnt = segment_sum(
                        batch.edge_mask[i].astype(x.dtype),
                        batch.dst_idx[i], cap_dst)
                    agg = ssum / jnp.maximum(cnt, 1.0)[:, None]
                    if alpha > 0:
                        tid = n_id[:cap_dst]
                        h_t = hists[i][tid]
                        agg = (1.0 - alpha) * agg + alpha * h_t
                        safe = jnp.where(batch.node_mask_j[:cap_dst],
                                         tid, hists[i].shape[0])
                        new_h[i] = hists[i].at[safe].set(
                            jax.lax.stop_gradient(agg), mode="drop")
                    x = (nn.Dense(self.dims[i + 1], use_bias=True,
                                  kernel_init=xavier,
                                  name=f"lin_l_{i}")(agg)
                         + nn.Dense(self.dims[i + 1], use_bias=False,
                                    kernel_init=xavier,
                                    name=f"lin_r_{i}")(x_t))
                    if i != L - 1:
                        x = jax.nn.relu(x)
                # caps[-1] == batch_size (static; the pytree leaf would
                # be traced under jit)
                return (jax.nn.log_softmax(x[:self.caps[-1]], axis=-1),
                        tuple(new_h))

        self._net_cls = _Net

    def bind(self, loader: NeighborSampledLoader):
        self.caps = tuple(loader.caps)
        self.net = self._net_cls(dims=tuple(self.dims), caps=self.caps,
                                 alpha_=self.alpha)
        return self

    def _jb(self, batch: NeighborBatch):
        return NeighborBatch(
            n_id=jnp.asarray(batch.n_id),
            node_mask=jnp.asarray(batch.node_mask),
            src_idx=tuple(jnp.asarray(a) for a in batch.src_idx),
            dst_idx=tuple(jnp.asarray(a) for a in batch.dst_idx),
            edge_mask=tuple(jnp.asarray(a) for a in batch.edge_mask),
            batch_size=batch.batch_size)

    def init(self, key, x_full, batch: NeighborBatch):
        b = self._jb(batch)
        x = jnp.asarray(x_full)[b.n_id]
        return self.net.init(key, x, _with_mask(b), self.histories, b.n_id)

    def forward(self, params, hists, x_full, batch: NeighborBatch):
        b = self._jb(batch)
        x = jnp.asarray(x_full)[b.n_id]
        return self.net.apply(params, x, _with_mask(b), hists, b.n_id)

    def full_inference(self, params, x_full, senders, receivers,
                       edge_mask=None):
        """Layer-wise full-graph inference (reddit_example.py:153-180);
        histories are NOT consulted, matching the reference."""
        x = jnp.asarray(x_full)
        E = senders.shape[0]
        em = (jnp.ones(E, bool) if edge_mask is None
              else jnp.asarray(edge_mask))
        for i in range(self.L):
            msg = jnp.where(em[:, None], x[senders], 0.0)
            ssum = segment_sum(msg, receivers, self.N)
            cnt = segment_sum(em.astype(x.dtype), receivers, self.N)
            agg = ssum / jnp.maximum(cnt, 1.0)[:, None]
            p = params["params"]
            x_new = (agg @ p[f"lin_l_{i}"]["kernel"]
                     + p[f"lin_l_{i}"]["bias"]
                     + x @ p[f"lin_r_{i}"]["kernel"])
            x = jax.nn.relu(x_new) if i != self.L - 1 else x_new
        return jax.nn.log_softmax(x, axis=-1)


class _MaskedBatch(NamedTuple):
    n_id: jnp.ndarray
    node_mask_j: jnp.ndarray
    src_idx: tuple
    dst_idx: tuple
    edge_mask: tuple
    batch_size: int


def _with_mask(b: NeighborBatch) -> _MaskedBatch:
    return _MaskedBatch(n_id=b.n_id, node_mask_j=b.node_mask,
                        src_idx=b.src_idx, dst_idx=b.dst_idx,
                        edge_mask=b.edge_mask, batch_size=b.batch_size)
