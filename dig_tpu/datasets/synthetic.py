"""Synthetic molecular data for tests/benchmarks when real downloads are
unavailable (this build environment has no network egress; real dataset
caches are picked up automatically when present on disk)."""
from __future__ import annotations

import numpy as np


def synthetic_molecules(num: int, seed: int = 0, min_atoms: int = 4,
                        max_atoms: int = 29, num_targets: int = 12,
                        with_forces: bool = False, box: float = 4.0):
    """Random QM9-shaped molecules: uniform positions in a box (rescaled so
    radius graphs at cutoff 5.0 are non-trivial), light-element Z."""
    rng = np.random.default_rng(seed)
    Z_CHOICES = np.array([1, 6, 7, 8, 9])  # H C N O F
    mols = []
    for _ in range(num):
        n = int(rng.integers(min_atoms, max_atoms + 1))
        z = rng.choice(Z_CHOICES, size=n)
        pos = rng.uniform(-box / 2, box / 2, size=(n, 3)).astype(np.float32)
        y = rng.normal(size=(num_targets,)).astype(np.float32)
        mol = {"z": z.astype(np.int32), "pos": pos, "y": y}
        if with_forces:
            mol["force"] = rng.normal(size=(n, 3)).astype(np.float32)
        mols.append(mol)
    return mols
