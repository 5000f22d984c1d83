"""Host-side minibatch loader: molecule dicts -> flat padded GraphBatch.

Replaces PyG's DataLoader+collate (reference ``run.py:53``). TPU-first
differences: static shapes (fixed graph count per batch, fixed node pad,
drop-last), deterministic shuffling from a seed, and edges are built *on
device* inside the jitted step (radius graph), so the host only ships
z/pos/targets.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..graph import GraphBatch, batch_np


class MoleculeLoader:
    """Iterates GraphBatches over a list of molecule dicts
    ({z, pos, y[, force]}).

    Args:
      data: sequence of molecule dicts.
      batch_size: graphs per batch (static).
      n_node_pad: node cap per batch; default batch_size * max atoms in data.
      shuffle: reshuffle each epoch (epoch counter advances the rng).
      seed: shuffle seed.
      drop_last: keep static shapes by dropping the ragged tail (training);
        when False the final batch is padded with empty graphs (eval).
    """

    def __init__(self, data: Sequence[Dict[str, np.ndarray]], batch_size: int,
                 n_node_pad: Optional[int] = None, shuffle: bool = False,
                 seed: int = 0, drop_last: Optional[bool] = None,
                 slot_size: Optional[int] = None):
        self.data = list(data)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = shuffle if drop_last is None else drop_last
        self.slot_size = slot_size
        if slot_size is not None:
            if (n_node_pad is not None
                    and n_node_pad != batch_size * slot_size):
                raise ValueError(
                    f"n_node_pad={n_node_pad} conflicts with slot_size="
                    f"{slot_size} (slot layout requires n_node_pad = "
                    f"batch_size * slot_size = {batch_size * slot_size})")
            n_node_pad = batch_size * slot_size
        elif n_node_pad is None:
            max_atoms = max(len(m["z"]) for m in self.data)
            n_node_pad = batch_size * max_atoms
        self.n_node_pad = n_node_pad

    def __len__(self) -> int:
        n = len(self.data)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.data))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            mols = [self.data[i] for i in idx]
            graphs = []
            for m in mols:
                nodes = {"z": m["z"], "pos": m["pos"]}
                if "force" in m:
                    nodes["force"] = m["force"]
                glb = {"y": np.atleast_1d(m["y"])}
                if "cell" in m:          # periodic structures (ops/pbc.py)
                    glb["cell"] = m["cell"]
                graphs.append({
                    "nodes": nodes,
                    "globals": glb,
                    "senders": np.zeros(0, np.int32),
                    "receivers": np.zeros(0, np.int32),
                })
            yield batch_np(graphs, self.n_node_pad, n_edge_pad=1,
                           num_graphs=self.batch_size,
                           slot_size=self.slot_size)


class DenseMoleculeLoader:
    """Dense per-graph minibatches ([G, n_max, ...]) — the MXU-native
    molecular layout consumed by the *Dense models (no edge extraction)."""

    def __init__(self, data, batch_size: int, n_max: Optional[int] = None,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: Optional[bool] = None):
        from ..graph_dense import dense_batch_np
        self._dense_batch_np = dense_batch_np
        self.data = list(data)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = shuffle if drop_last is None else drop_last
        self.n_max = n_max or max(len(m["z"]) for m in self.data)

    def __len__(self):
        n = len(self.data)
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self):
        order = np.arange(len(self.data))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        for b in range(len(self)):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            mols = [self.data[i] for i in idx]
            globals_list = {"y": [np.atleast_1d(m["y"]) for m in mols]}
            nodes_list = {}
            if "force" in mols[0]:
                nodes_list["force"] = [m["force"] for m in mols]
            yield self._dense_batch_np(
                [m["z"] for m in mols], [m["pos"] for m in mols],
                self.n_max, num_graphs=self.batch_size,
                globals_list=globals_list,
                nodes_list=nodes_list or None)


class PackedDenseMoleculeLoader:
    """Dense minibatches where each [n_max] slot holds SEVERAL bin-packed
    molecules (cross-molecule pairs masked via ``nodes['mol']``).

    Dense-path compute is O(num_slots * n_max^2) regardless of how full the
    slots are, so packing small molecules together raises real-edge
    throughput for free (QM9's mean size is ~18 atoms vs the 29-atom max;
    see graph_dense.pack_molecules). Batches consume a *variable* number of
    molecules: iterate until exhausted rather than indexing.
    """

    def __init__(self, data, num_slots: int, n_max: int = 32,
                 max_per_slot: int = 4, shuffle: bool = False, seed: int = 0):
        from ..graph_dense import packed_dense_batch_np
        self._packed = packed_dense_batch_np
        self.data = list(data)
        self.num_slots = num_slots
        self.n_max = n_max
        self.max_per_slot = max_per_slot
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __iter__(self):
        order = np.arange(len(self.data))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        fills = []          # per-slot atom fill
        members = []        # per-slot list of chunk-local molecule indices
        chunk = []
        for i in order:
            m = self.data[i]
            n = len(m["z"])
            placed = False
            for s in range(len(fills)):
                if (fills[s] + n <= self.n_max
                        and len(members[s]) < self.max_per_slot):
                    fills[s] += n
                    members[s].append(len(chunk))
                    placed = True
                    break
            if not placed:
                if len(fills) == self.num_slots:
                    yield self._packed(chunk, self.num_slots, self.n_max,
                                       self.max_per_slot, slots=members)
                    fills, members, chunk = [], [], []
                fills.append(n)
                members.append([len(chunk)])
            chunk.append(m)
        # ragged tail dropped when shuffling (training), emitted otherwise
        if chunk and not self.shuffle:
            yield self._packed(chunk, self.num_slots, self.n_max,
                               self.max_per_slot, slots=members)


class BucketedDenseMoleculeLoader:
    """Dense minibatches bucketed by slot size: a batch is a dict
    ``{n_max: DenseGraphBatch}`` with a fixed slot count per bucket.

    Dense-path compute is quadratic in the slot size, so a 14-atom molecule
    in a 16-atom slot carries ~3.4x the real-pair occupancy it would in a
    32-atom slot — and the fused cfconv kernel's per-pair-row throughput is
    flat across n=16/24/32 (ops/pallas_cfconv.py). Each molecule is routed
    to the smallest bucket that fits it (several small molecules may share
    a slot, cross-molecule pairs masked via ``nodes['mol']``, exactly like
    :class:`PackedDenseMoleculeLoader`).

    Args:
      data: sequence of molecule dicts ({z, pos, y}).
      slot_counts: ``{n_max: num_slots}`` — static per-bucket batch shape.
        Size the proportions to the data's size distribution; a bucket that
        fills early simply blocks until the others catch up (batches are
        emitted only when every bucket is full, so with mismatched
        proportions throughput degrades but correctness doesn't).
      max_per_slot: molecule cap per slot (molecules smaller than half the
        smallest bucket still pack several-per-slot).
      shuffle/seed: deterministic epoch reshuffle; when shuffling, the
        ragged tail is dropped (training), otherwise emitted padded (eval).
    """

    def __init__(self, data, slot_counts: Dict[int, int],
                 max_per_slot: int = 2, shuffle: bool = False, seed: int = 0):
        from ..graph_dense import packed_dense_batch_np
        self._packed = packed_dense_batch_np
        self.data = list(data)
        self.slot_counts = dict(sorted(slot_counts.items()))
        self.sizes = list(self.slot_counts)
        if any(len(m["z"]) > self.sizes[-1] for m in self.data):
            raise ValueError(f"molecule larger than biggest bucket "
                             f"{self.sizes[-1]}")
        self.max_per_slot = max_per_slot
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def _emit(self, state):
        out = {}
        for n_max, G in self.slot_counts.items():
            fills, members, chunk = state[n_max]
            if not chunk:
                # eval-mode tail flushes can leave a bucket empty. Keep the
                # emitted pytree structure identical across batches
                # (consumers tree-stack batches, e.g. bench.py bench_force):
                # pack one truncated template molecule, then mask it out.
                tmpl = dict(self.data[0])
                n = min(len(tmpl["z"]), n_max)
                for k, v in list(tmpl.items()):
                    if (k != "y" and np.ndim(v) >= 1
                            and np.shape(v)[0] == len(self.data[0]["z"])):
                        tmpl[k] = np.asarray(v)[:n]
                b = self._packed([tmpl], G, n_max, self.max_per_slot,
                                 slots=[[0]])
                out[n_max] = b.replace(
                    node_mask=np.zeros_like(b.node_mask),
                    globals={**b.globals,
                             "mol_mask": np.zeros_like(b.globals["mol_mask"])})
                continue
            out[n_max] = self._packed(chunk, G, n_max, self.max_per_slot,
                                      slots=members)
        return out

    def _place(self, state, m) -> bool:
        n = len(m["z"])
        bucket = next(s for s in self.sizes if n <= s)
        fills, members, chunk = state[bucket]
        for s in range(len(fills)):
            if (fills[s] + n <= bucket
                    and len(members[s]) < self.max_per_slot):
                fills[s] += n
                members[s].append(len(chunk))
                chunk.append(m)
                return True
        if len(fills) < self.slot_counts[bucket]:
            fills.append(n)
            members.append([len(chunk)])
            chunk.append(m)
            return True
        return False

    def __iter__(self):
        order = np.arange(len(self.data))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        fresh = lambda: {s: ([], [], []) for s in self.sizes}
        full = lambda st: all(len(st[s][0]) == self.slot_counts[s]
                              for s in self.sizes)
        state = fresh()                 # bucket -> (fills, members, chunk)
        pending: List[int] = []         # indices waiting on a full bucket
        for i in order:
            if not self._place(state, self.data[i]):
                pending.append(i)
            while full(state):
                yield self._emit(state)
                state = fresh()
                pending = [j for j in pending
                           if not self._place(state, self.data[j])]
        if not self.shuffle:            # eval: flush everything, padded
            while pending:
                rest = [j for j in pending
                        if not self._place(state, self.data[j])]
                if len(rest) == len(pending):   # no progress: emit + reset
                    yield self._emit(state)
                    state = fresh()
                pending = rest
            if any(state[s][2] for s in self.sizes):
                yield self._emit(state)


class BucketedMoleculeLoader:
    """Slot-bucketed NK-path batches: each batch is a dict
    ``{slot_size: GraphBatch}`` with a fixed graph count per bucket.

    The slot/NK models' cost is ~linear in ``G * slot_size * K`` edge
    rows, so padding every molecule to the global max atom count wastes
    ~20% on the 12-29-atom flagship distribution; routing each molecule
    to the smallest bucket that fits it recovers that (the NK analog of
    :class:`BucketedDenseMoleculeLoader`; the consumer applies the model
    once per bucket and concatenates — e.g. bench.py's SphereNet
    sections). Bucket sizes must keep the slot kernels' layout legal —
    any size works, but ``size * K`` being a multiple of 128 gives S=1
    tiles (16/24 at K=16; the top bucket can stay ragged like 29).

    Args mirror :class:`MoleculeLoader`; ``slot_counts`` maps slot size
    to graphs per batch (size the proportions to the data distribution;
    with ``shuffle`` the ragged tail is dropped, otherwise emitted with
    under-filled buckets padded by empty masked graphs).
    """

    def __init__(self, data: Sequence[Dict[str, np.ndarray]],
                 slot_counts: Dict[int, int], shuffle: bool = False,
                 seed: int = 0):
        self.data = list(data)
        self.slot_counts = dict(sorted(slot_counts.items()))
        self.sizes = list(self.slot_counts)
        big = max(len(m["z"]) for m in self.data)
        if big > self.sizes[-1]:
            raise ValueError(f"molecule with {big} atoms exceeds largest "
                             f"bucket {self.sizes[-1]}")
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def _graph(self, m):
        nodes = {"z": m["z"], "pos": m["pos"]}
        if "force" in m:
            nodes["force"] = m["force"]
        glb = {"y": np.atleast_1d(m["y"])}
        if "cell" in m:
            glb["cell"] = m["cell"]
        return {"nodes": nodes, "globals": glb,
                "senders": np.zeros(0, np.int32),
                "receivers": np.zeros(0, np.int32)}

    def _emit(self, state):
        out = {}
        for s, G in self.slot_counts.items():
            chunk = state[s][:G]
            if not chunk:
                # keep the emitted pytree structure identical: pack one
                # truncated template molecule, then mask it out
                t = dict(self.data[0])
                n = min(len(t["z"]), s)
                for k, v in list(t.items()):
                    if (k != "y" and np.ndim(v) >= 1
                            and np.shape(v)[0] == len(self.data[0]["z"])):
                        t[k] = np.asarray(v)[:n]
                b = batch_np([self._graph(t)], G * s, n_edge_pad=1,
                             num_graphs=G, slot_size=s)
                out[s] = b.replace(
                    node_mask=np.zeros_like(b.node_mask),
                    graph_mask=np.zeros_like(b.graph_mask))
            else:
                out[s] = batch_np([self._graph(m) for m in chunk],
                                  G * s, n_edge_pad=1, num_graphs=G,
                                  slot_size=s)
            state[s] = state[s][G:]
        return out

    def __iter__(self):
        order = np.arange(len(self.data))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
            self.epoch += 1
        state = {s: [] for s in self.sizes}
        for i in order:
            m = self.data[i]
            s = next(t for t in self.sizes if len(m["z"]) <= t)
            state[s].append(m)
            if all(len(state[t]) >= self.slot_counts[t]
                   for t in self.sizes):
                yield self._emit(state)
        while not self.shuffle and any(len(v) for v in state.values()):
            yield self._emit(state)
