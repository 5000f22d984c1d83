"""Fused cfconv Pallas kernel vs XLA reference (interpret mode on CPU):
forward and full custom-VJP gradients, including the geometry gradient
d(out)/d(dist) that force training relies on."""
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops.pallas_cfconv import (MASK_DIST, cfconv_fused,
                                       cfconv_reference)

CUTOFF = 4.0
R = 12


def _args(seed=0, G=3, n=9, F=32):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 3.0, (G, n, 3)).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.sqrt((diff ** 2).sum(-1) + 1e-12)
    # mask diagonal + a few random "padding" pairs with the sentinel
    eye = np.eye(n, dtype=bool)[None]
    drop = rng.uniform(size=dist.shape) < 0.1
    dist = np.where(eye | drop, MASK_DIST, dist).astype(np.float32)
    return (
        jnp.asarray(dist),
        jnp.asarray(rng.normal(size=(G, n, F)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(R, F)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1),
    )


def test_forward_matches_reference():
    args = _args()
    out_k = cfconv_fused(*args, CUTOFF, R, "f32")
    out_r = cfconv_reference(*args, cutoff=CUTOFF, num_gaussians=R)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference():
    args = _args(seed=1)

    def loss_k(*a):
        return jnp.sum(cfconv_fused(*a, CUTOFF, R, "f32") ** 2)

    def loss_r(*a):
        return jnp.sum(cfconv_reference(*a, cutoff=CUTOFF,
                                        num_gaussians=R) ** 2)

    gk = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    names = ["dist", "vj", "w1", "b1", "w2", "b2"]
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bf16_path_close():
    args = _args(seed=2)
    out_k = cfconv_fused(*args, CUTOFF, R, "bf16")
    out_r = cfconv_reference(*args, cutoff=CUTOFF, num_gaussians=R)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=0.05, atol=0.05)


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


def test_pallas_path_matches_dense_xla_path():
    """Same params -> pallas path reproduces the einsum path (f32)."""
    from dig_tpu.datasets import DenseMoleculeLoader, synthetic_molecules
    from dig_tpu.models import SchNetDense
    mols = synthetic_molecules(6, seed=3, max_atoms=10)
    b = next(iter(DenseMoleculeLoader(mols, 6, n_max=10)))
    kw = dict(cutoff=3.0, num_layers=2, hidden_channels=16,
              num_filters=16, num_gaussians=8)
    m_p = SchNetDense(use_pallas=True, **kw)
    m_x = SchNetDense(use_pallas=False, **kw)
    params = m_p.init(jax.random.PRNGKey(0), b)

    # transplant: shared leaves copy over; the pallas cf_* filter params map
    # onto the XLA path's MLP_{l} (Dense numbering is per-type in flax, so
    # the remaining Dense_* keys line up between the two paths)
    import flax
    params_x = m_x.init(jax.random.PRNGKey(0), b)
    fx = flax.traverse_util.flatten_dict(params_x["params"])
    fp = flax.traverse_util.flatten_dict(params["params"])
    for l in range(2):
        fx[(f"MLP_{l}", "Dense_0", "kernel")] = fp[(f"cf_w1_{l}",)]
        fx[(f"MLP_{l}", "Dense_0", "bias")] = fp[(f"cf_b1_{l}",)]
        fx[(f"MLP_{l}", "Dense_1", "kernel")] = fp[(f"cf_w2_{l}",)]
        fx[(f"MLP_{l}", "Dense_1", "bias")] = fp[(f"cf_b2_{l}",)]
    for k in list(fx):
        if k in fp:
            fx[k] = fp[k]
    params_x = {"params": flax.traverse_util.unflatten_dict(fx)}
    out_p = m_p.apply(params, b)
    out_x = m_x.apply(params_x, b)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_need_dist_grad_false_zeroes_only_ddist():
    """need_dist_grad=False: weight/vj grads stay exact, d_dist is zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dig_tpu.ops.pallas_cfconv import cfconv_fused

    key = jax.random.PRNGKey(0)
    G, n, F, R = 4, 16, 128, 50
    dist = jax.random.uniform(key, (G, n, n), jnp.float32, 0.5, 8.0)
    vj = jax.random.normal(key, (G, n, F), jnp.float32)
    w1 = jax.random.normal(key, (R, F)) * 0.1
    b1 = jnp.zeros(F)
    w2 = jax.random.normal(key, (F, F)) * 0.1
    b2 = jnp.zeros(F)

    def loss(flag, *a):
        return jnp.sum(jnp.sin(cfconv_fused(*a, 5.0, 50, "f32", flag)))

    g_on = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3, 4, 5))(
        dist, vj, w1, b1, w2, b2)
    g_off = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3, 4, 5))(
        dist, vj, w1, b1, w2, b2)
    assert float(jnp.max(jnp.abs(g_off[0]))) == 0.0       # d_dist zeroed
    assert float(jnp.max(jnp.abs(g_on[0]))) > 0.0
    for a, b in zip(g_on[1:], g_off[1:]):                 # rest identical
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
