"""Fused cfconv Pallas kernel vs XLA reference (interpret mode on CPU):
forward and full custom-VJP gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops.pallas_cfconv import cfconv, cfconv_reference


def _args(seed=0, G=3, n=8, R=16, F=32):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(G, n, n, R)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (G, n, n)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(G, n, F)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(R, F)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1),
    )


def test_forward_matches_reference():
    args = _args()
    out_k = cfconv(*args)
    out_r = cfconv_reference(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference():
    args = _args(seed=1)

    def loss_k(*a):
        return jnp.sum(cfconv(*a) ** 2)

    def loss_r(*a):
        return jnp.sum(cfconv_reference(*a) ** 2)

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_schnet_dense_pallas_path():
    from dig_tpu.datasets import DenseMoleculeLoader, synthetic_molecules
    from dig_tpu.models import SchNetDense
    mols = synthetic_molecules(4, seed=0, max_atoms=8)
    b = next(iter(DenseMoleculeLoader(mols, 4, n_max=8)))
    m_p = SchNetDense(cutoff=3.0, num_layers=2, hidden_channels=16,
                      num_filters=16, num_gaussians=8, use_pallas=True)
    params = m_p.init(jax.random.PRNGKey(0), b)
    out = m_p.apply(params, b)
    assert np.all(np.isfinite(np.asarray(out)))
