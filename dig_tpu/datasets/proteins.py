"""Protein datasets for ProNet: EC / FOLD.

Parity with ``dig/threedgraph/dataset/{ECdataset.py,FOLDdataset.py}``
(enzyme-commission and fold classification; atom-position reconstruction
into C-alpha/N/C backbone coords + side-chain embeddings). Real data loads
from a local npz cache; :func:`synthetic_proteins` generates batch-ready
random backbones for offline tests.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..graph import GraphBatch, batch_np


def load_protein_npz(root: str, name: str) -> List[Dict]:
    """{root}/{name}.npz with object arrays per protein: z, pos (C-alpha),
    pos_n, pos_c, bb_embs, side_chain_embs, y."""
    path = os.path.join(root, f"{name}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing (no egress; stage the processed cache or use "
            "synthetic_proteins)")
    raw = np.load(path, allow_pickle=True)
    n = len(raw["y"])
    return [{k: raw[k][i] for k in raw.files} for i in range(n)]


def ECdataset(root: str = "dataset/", split: str = "train") -> List[Dict]:
    return load_protein_npz(root, f"ec_{split}")


def FOLDdataset(root: str = "dataset/", split: str = "training") -> List[Dict]:
    return load_protein_npz(root, f"fold_{split}")


def synthetic_proteins(num: int = 16, min_res: int = 8, max_res: int = 24,
                       num_classes: int = 4, seed: int = 0) -> List[Dict]:
    """Random self-avoiding-ish backbones with class-correlated geometry."""
    rng = np.random.default_rng(seed)
    prots = []
    for _ in range(num):
        n = int(rng.integers(min_res, max_res + 1))
        cls = int(rng.integers(num_classes))
        # class controls local curliness of the backbone walk
        step = 3.8
        turn = 0.3 + 0.4 * cls / max(num_classes - 1, 1)
        pos = [np.zeros(3)]
        d = np.array([1.0, 0.0, 0.0])
        for _ in range(n - 1):
            d = d + turn * rng.normal(size=3)
            d = d / np.linalg.norm(d)
            pos.append(pos[-1] + step * d)
        pos = np.asarray(pos, np.float32)
        prots.append({
            "z": rng.integers(0, 20, n).astype(np.int32),
            "pos": pos,
            "pos_n": pos + rng.normal(0, 0.4, (n, 3)).astype(np.float32),
            "pos_c": pos + rng.normal(0, 0.4, (n, 3)).astype(np.float32),
            "bb_embs": rng.normal(size=(n, 6)).astype(np.float32),
            "side_chain_embs": rng.normal(size=(n, 8)).astype(np.float32),
            "y": cls,
        })
    return prots


class ProteinLoader:
    """Batches protein dicts into GraphBatches for ProNet."""

    def __init__(self, proteins, batch_size: int,
                 n_node_pad: Optional[int] = None, shuffle: bool = False,
                 seed: int = 0, drop_last: Optional[bool] = None):
        self.data = list(proteins)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = shuffle if drop_last is None else drop_last
        max_res = max(len(p["z"]) for p in self.data)
        self.n_node_pad = n_node_pad or batch_size * max_res

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
            graphs = []
            for i in idx:
                p = self.data[i]
                graphs.append({
                    "nodes": {k: p[k] for k in
                              ("z", "pos", "pos_n", "pos_c", "bb_embs",
                               "side_chain_embs")},
                    "senders": np.zeros(0, np.int32),
                    "receivers": np.zeros(0, np.int32),
                    "globals": {"y": np.atleast_1d(
                        np.asarray(p["y"], np.float32))},
                })
            yield batch_np(graphs, self.n_node_pad, 1,
                           num_graphs=self.batch_size)
