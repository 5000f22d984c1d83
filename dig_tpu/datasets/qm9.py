"""QM9-3D dataset: 130,831 molecules with 3D coordinates and 12 regression
targets (reference ``dig/threedgraph/dataset/PygQM93D.py:11-134``).

Loads the DimeNet-format ``qm9_eV.npz`` (fields ``R`` flat positions, ``Z``
flat atomic numbers, ``N`` atoms-per-molecule, and the 12 target columns) if
a cache exists under ``root``; otherwise raises — use
:func:`dig_tpu.datasets.synthetic.synthetic_molecules` for offline work.

Split semantics replicate the reference exactly
(``PygQM93D.py:117-121``): ``np.random.RandomState(seed).permutation(n)``
then slice train/valid/rest — the seed-42 determinism test from the
reference (first indices 112526/120798/107901) is in tests/test_datasets.py.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

TARGETS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
           "U0", "U", "H", "G", "Cv"]

_SEARCH_PATHS = [
    "{root}/qm9_eV.npz",
    "{root}/raw/qm9_eV.npz",
    "{root}/qm9/raw/qm9_eV.npz",
]


def get_idx_split(data_size: int, train_size: int, valid_size: int,
                  seed: int):
    """Reference-identical deterministic split (PygQM93D.py:117-121):
    ``np.random.RandomState(seed).permutation(data_size)`` sliced into
    train/valid/rest. Pure math — needs no data (the seed-42 determinism
    fixture lives in tests/test_datasets.py)."""
    ids = np.random.RandomState(seed).permutation(data_size)
    train_idx = ids[:train_size]
    val_idx = ids[train_size:train_size + valid_size]
    test_idx = ids[train_size + valid_size:]
    return {"train": train_idx, "valid": val_idx, "test": test_idx}


class QM93D:
    """In-memory QM9-3D. ``data[i]`` -> dict(z, pos, y[12])."""

    def __init__(self, root: str = "dataset/"):
        self.root = root
        path = None
        for pat in _SEARCH_PATHS:
            p = pat.format(root=root)
            if os.path.exists(p):
                path = p
                break
        if path is None:
            raise FileNotFoundError(
                f"qm9_eV.npz not found under {root}; this environment has no "
                "network egress — place the DimeNet qm9_eV.npz there or use "
                "synthetic_molecules() for smoke runs.")
        raw = np.load(path)
        self.N = raw["N"].astype(np.int64)
        split = np.cumsum(self.N)[:-1]
        self.R = np.split(raw["R"].astype(np.float32), split)
        self.Z = np.split(raw["Z"].astype(np.int32), split)
        self.y = np.stack([raw[t].astype(np.float32) for t in TARGETS], axis=1)

    def __len__(self) -> int:
        return len(self.N)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {"z": self.Z[i], "pos": self.R[i], "y": self.y[i]}

    def get_idx_split(self, data_size: int, train_size: int, valid_size: int,
                      seed: int):
        return get_idx_split(data_size, train_size, valid_size, seed)

    def select(self, idx) -> List[Dict[str, np.ndarray]]:
        return [self[int(i)] for i in idx]
