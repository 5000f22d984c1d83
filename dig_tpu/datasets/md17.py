"""MD17 molecular-dynamics trajectories: energies + forces per frame
(reference ``dig/threedgraph/dataset/PygMD17.py``).

Reads the public MD17 ``<name>_dft.npz`` format (fields ``E``, ``F``, ``R``,
``z``) from a local cache. Split semantics match the reference: random
permutation with seed, train/valid/test slices.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


class MD17:
    def __init__(self, root: str = "dataset/", name: str = "benzene_old"):
        path = None
        for p in (f"{root}/md17_{name}.npz", f"{root}/raw/md17_{name}.npz",
                  f"{root}/{name}_dft.npz"):
            if os.path.exists(p):
                path = p
                break
        if path is None:
            raise FileNotFoundError(
                f"MD17 cache for '{name}' not found under {root} (offline "
                "environment; place the npz there).")
        raw = np.load(path)
        self.E = raw["E"].astype(np.float32).reshape(-1)
        self.F = raw["F"].astype(np.float32)
        self.R = raw["R"].astype(np.float32)
        self.z = raw["z"].astype(np.int32)

    def __len__(self):
        return len(self.E)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {"z": self.z, "pos": self.R[i],
                "y": np.array([self.E[i]], np.float32),
                "force": self.F[i]}

    def get_idx_split(self, data_size: int, train_size: int, valid_size: int,
                      seed: int):
        ids = np.random.RandomState(seed).permutation(data_size)
        return {"train": ids[:train_size],
                "valid": ids[train_size:train_size + valid_size],
                "test": ids[train_size + valid_size:]}
