"""Chem kernel tests: SMILES round-trips, kekulization, valency rules,
canonical-hash invariance, fingerprints, descriptors."""
import numpy as np
import pytest

from dig_tpu.chem import (Mol, canonical_hash, check_valency, mol_from_dense,
                          mol_from_smiles, mol_to_dense, mol_to_smiles,
                          penalized_logp, qed_proxy)
from dig_tpu.chem.mol import bfs_order
from dig_tpu.ggraph.environment import (morgan_fingerprint,
                                        tanimoto_similarity,
                                        reward_target_molecule_similarity)

SMILES = ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1",
          "C1CCCCC1", "N#Cc1ccccc1", "c1cc[nH]c1", "c1ccncc1", "c1ccoc1",
          "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "CC(C)(C)c1ccc(O)cc1",
          "O=C(O)c1ccccc1", "FC(F)(F)c1ccccc1"]


@pytest.mark.parametrize("s", SMILES)
def test_roundtrip(s):
    m = mol_from_smiles(s)
    assert check_valency(m)
    m2 = mol_from_smiles(mol_to_smiles(m))
    assert canonical_hash(m) == canonical_hash(m2)


def test_kekulization_benzene():
    m = mol_from_smiles("c1ccccc1")
    orders = sorted(m.bonds.values())
    assert orders == [1.0, 1.0, 1.0, 2.0, 2.0, 2.0]


def test_valency_violation():
    m = mol_from_smiles("C")
    for _ in range(4):
        i = m.add_atom(6)
        m.add_bond(0, i, 1.0)
    assert check_valency(m)
    j = m.add_atom(6)
    m.add_bond(0, j, 1.0)  # 5th bond on carbon
    assert not check_valency(m)


def test_canonical_hash_permutation_invariant():
    m = mol_from_smiles("CC(=O)Oc1ccccc1C(=O)O")
    h = canonical_hash(m)
    # rebuild with atoms in a different order
    rng = np.random.default_rng(0)
    perm = rng.permutation(m.num_atoms)
    inv = {int(o): i for i, o in enumerate(perm)}
    m2 = Mol()
    for o in perm:
        a = m.atoms[int(o)]
        m2.add_atom(a.z, a.charge)
    for (a, b), o in m.bonds.items():
        m2.add_bond(inv[a], inv[b], o)
    assert canonical_hash(m2) == h
    # a different molecule hashes differently
    assert canonical_hash(mol_from_smiles("CCO")) != h


def test_dense_roundtrip():
    m = mol_from_smiles("CC(N)=O")
    x, adj = mol_to_dense(m, [6, 7, 8, 9], 9, bfs_order(m))
    assert x.shape == (9, 4) and adj.shape == (4, 9, 9)
    m2 = mol_from_dense(x, adj, [6, 7, 8, 9])
    assert canonical_hash(m2) == canonical_hash(m)


def test_fingerprint_similarity():
    a = mol_from_smiles("CCO")
    b = mol_from_smiles("CCO")
    c = mol_from_smiles("c1ccccc1")
    assert reward_target_molecule_similarity(a, b) == 1.0
    assert reward_target_molecule_similarity(a, c) < 0.5


def test_descriptors_finite():
    for s in SMILES:
        m = mol_from_smiles(s)
        assert np.isfinite(penalized_logp(m))
        assert 0.0 <= qed_proxy(m) <= 1.0
