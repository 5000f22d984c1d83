"""Dense-layout SchNet == flat-layout SchNet with transplanted weights.

This is the activation-parity test SURVEY.md §4 calls for (the dense model
is the perf path; the flat model is the reference semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.datasets import (DenseMoleculeLoader, MoleculeLoader,
                              synthetic_molecules)
from dig_tpu.models import SchNet, SchNetDense


def _transplant(flat_params, num_layers):
    """Map flat SchNet's param tree onto SchNetDense's naming."""
    fp = flat_params["params"]
    dp = {"Embed_0": fp["Embed_0"]}
    for i in range(num_layers):
        blk = fp[f"SchNetInteraction_{i}"]
        dp[f"MLP_{i}"] = blk["MLP_0"]
        dp[f"Dense_{3 * i}"] = blk["Dense_0"]
        dp[f"Dense_{3 * i + 1}"] = blk["Dense_1"]
        dp[f"Dense_{3 * i + 2}"] = blk["Dense_2"]
    dp[f"Dense_{3 * num_layers}"] = fp["Dense_0"]
    dp[f"Dense_{3 * num_layers + 1}"] = fp["Dense_1"]
    return {"params": dp}


def test_dense_flat_parity():
    L = 3
    mols = synthetic_molecules(8, seed=0, max_atoms=12)
    flat = next(iter(MoleculeLoader(mols, 8, n_node_pad=96)))
    dense = next(iter(DenseMoleculeLoader(mols, 8, n_max=12)))

    m_flat = SchNet(cutoff=3.0, num_layers=L, hidden_channels=32,
                    num_filters=32, num_gaussians=16, max_edges=512)
    m_dense = SchNetDense(cutoff=3.0, num_layers=L, hidden_channels=32,
                          num_filters=32, num_gaussians=16)
    p_flat = jax.jit(m_flat.init)(jax.random.PRNGKey(0), flat)
    p_dense = _transplant(p_flat, L)

    out_flat = np.asarray(m_flat.apply(p_flat, flat))
    out_dense = np.asarray(m_dense.apply(p_dense, dense))
    np.testing.assert_allclose(out_flat, out_dense, rtol=2e-4, atol=2e-4)


def test_dense_force_gradients():
    mols = synthetic_molecules(4, seed=1, max_atoms=10)
    dense = next(iter(DenseMoleculeLoader(mols, 4, n_max=10)))
    model = SchNetDense(cutoff=3.0, num_layers=2, hidden_channels=16,
                        num_filters=16, num_gaussians=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dense)

    def energy(pos):
        return jnp.sum(model.apply(params, dense.replace(pos=pos)))

    f = -jax.grad(energy)(dense.pos)
    f = np.asarray(f)
    assert np.all(np.isfinite(f))
    nm = np.asarray(dense.node_mask)
    assert np.allclose(f[~nm], 0.0, atol=1e-6)
