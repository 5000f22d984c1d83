"""Fused triplet-interaction kernel (ops/pallas_triplet.py) vs the XLA
chain oracle — forward, full VJP, basis_grads elision, and the model-level
pallas_triplet path. Runs in interpret mode off-TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.ops.pallas_triplet import (fused_triplet_product,
                                        fused_triplet_product_ref)


def _inputs(E=100, K=8, C=32, S1=18, S2=54, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    m2d = (jax.random.uniform(ks[5], (E, K)) > 0.2).astype(jnp.float32)
    return (jax.random.normal(ks[0], (E * K, C)),
            jax.random.normal(ks[1], (E * K, S1)),
            jax.random.normal(ks[2], (E * K, S2)),
            0.1 * jax.random.normal(ks[3], (S1, C)),
            0.1 * jax.random.normal(ks[4], (S2, C)),
            m2d)


@pytest.mark.parametrize("tile_e", [16, 64])
def test_fwd_matches_oracle(tile_e):
    xg, sbf, tbf, ws, wt, m2d = _inputs()
    out = fused_triplet_product(xg, sbf, tbf, ws, wt, m2d, 8, tile_e)
    ref = fused_triplet_product_ref(xg, sbf, tbf, ws, wt, 8, m2d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fwd_ragged_tail():
    """E not divisible by tile_e — zero-padded tail must not leak."""
    xg, sbf, tbf, ws, wt, m2d = _inputs(E=37, K=4, C=16)
    out = fused_triplet_product(xg, sbf, tbf, ws, wt, m2d, 4, 16)
    ref = fused_triplet_product_ref(xg, sbf, tbf, ws, wt, 4, m2d)
    assert out.shape == (37, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_vjp_matches_oracle():
    xg, sbf, tbf, ws, wt, m2d = _inputs(seed=1)
    out = fused_triplet_product(xg, sbf, tbf, ws, wt, m2d, 8, 16)
    ct = jax.random.normal(jax.random.PRNGKey(9), out.shape)
    g_f = jax.vjp(lambda *a: fused_triplet_product(*a, m2d, 8, 16),
                  xg, sbf, tbf, ws, wt)[1](ct)
    g_r = jax.vjp(lambda *a: fused_triplet_product_ref(*a, 8, m2d),
                  xg, sbf, tbf, ws, wt)[1](ct)
    for name, a, b in zip(["dxg", "dsbf", "dtbf", "dws", "dwt"], g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   err_msg=name)


def test_basis_grads_elision():
    """basis_grads=False: weight/x grads still exact, basis grads zero."""
    xg, sbf, tbf, ws, wt, m2d = _inputs(E=37, K=4, C=16, seed=2)
    out = fused_triplet_product(xg, sbf, tbf, ws, wt, m2d, 4, 16, False)
    ct = jax.random.normal(jax.random.PRNGKey(3), out.shape)
    g_f = jax.vjp(lambda *a: fused_triplet_product(*a, m2d, 4, 16, False),
                  xg, sbf, tbf, ws, wt)[1](ct)
    g_r = jax.vjp(lambda *a: fused_triplet_product_ref(*a, 4, m2d),
                  xg, sbf, tbf, ws, wt)[1](ct)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_r[0]),
                               atol=1e-3)
    assert float(jnp.abs(g_f[1]).max()) == 0.0  # symbolic-zero basis grads
    assert float(jnp.abs(g_f[2]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(g_f[3]), np.asarray(g_r[3]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f[4]), np.asarray(g_r[4]),
                               atol=1e-3)


def test_spherenet_pallas_triplet_matches_unfused():
    """Model level: pallas_triplet energies + param grads match the unfused
    path with identical parameters (composed projections are the same
    linear map)."""
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet
    mols = synthetic_molecules(6, seed=9, min_atoms=5, max_atoms=12, box=6.0)
    g = next(iter(MoleculeLoader(mols, 6, slot_size=12)))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8, block_size=12)
    m0 = SphereNet(**kw)
    m1 = SphereNet(**kw, pallas_triplet=True)
    params = m0.init(jax.random.PRNGKey(0), g)

    def loss(mod, p):
        return jnp.sum(jnp.where(g.graph_mask[:, None], mod.apply(p, g), 0))

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, a in flat0:
        b = flat1[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_fused_angle_product_matches_oracle():
    from dig_tpu.ops.pallas_triplet import fused_angle_product
    xg, sbf, _, ws, _, m2d = _inputs(E=37, K=4, C=16, seed=4)
    out = fused_angle_product(xg, sbf, ws, m2d, 4, 16)
    ref = fused_triplet_product_ref(xg, sbf, None, ws, None, 4, m2d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    ct = jax.random.normal(jax.random.PRNGKey(5), out.shape)
    g_f = jax.vjp(lambda *a: fused_angle_product(*a, m2d, 4, 16),
                  xg, sbf, ws)[1](ct)
    g_r = jax.vjp(lambda *a: fused_triplet_product_ref(a[0], a[1], None,
                                                       a[2], None, 4, m2d),
                  xg, sbf, ws)[1](ct)
    for name, a, b in zip(["dxg", "dsbf", "dws"], g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   err_msg=name)


def test_dimenetpp_pallas_matches_unfused():
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import DimeNetPP
    mols = synthetic_molecules(6, seed=9, min_atoms=5, max_atoms=12, box=6.0)
    g = next(iter(MoleculeLoader(mols, 6, slot_size=12)))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8, block_size=12)
    m0 = DimeNetPP(**kw)
    m1 = DimeNetPP(**kw, pallas_triplet=True)
    params = m0.init(jax.random.PRNGKey(0), g)
    e0 = m0.apply(params, g)
    e1 = m1.apply(params, g)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-4,
                               atol=1e-5)


def _force_style_loss(E, K, C, S1, S2, seed, fused, tile_e=8):
    """Force-training-shaped loss: inner grad wrt a pos-like input that
    feeds the basis AND xg, outer grad wrt the weights (reference
    run.py:126 double-autograd semantics)."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    T = E * K
    xg0 = jax.random.normal(ks[0], (T, C))
    sbf0 = jax.random.normal(ks[1], (T, S1))
    tbf0 = jax.random.normal(ks[2], (T, S2))
    m2d = (jax.random.uniform(ks[3], (E, K)) > 0.3).astype(jnp.float32)
    wdown = jax.random.normal(ks[4], (C,))
    p_s = jax.random.normal(ks[5], (T, S1))
    p_t = jax.random.normal(ks[6], (T, S2))

    def energy(pos, ws, wt):
        sbf = sbf0 * jnp.sin(pos * p_s)
        tbf = tbf0 + 0.1 * jnp.cos(pos * p_t).sum(axis=1, keepdims=True)
        xg = xg0 * (1.0 + 0.01 * pos.sum())
        if fused:
            out = fused_triplet_product(xg, sbf, tbf, ws, wt, m2d, K,
                                        tile_e, True)
        else:
            out = fused_triplet_product_ref(xg, sbf, tbf, ws, wt, K, m2d)
        return jnp.sum(out * wdown)

    def loss(params, pos):
        ws, wt = params
        e = energy(pos, ws, wt)
        force = -jax.grad(energy)(pos, ws, wt)
        return 0.1 * e + jnp.sum(force ** 2)

    return loss


def test_second_order_force_training_grads():
    """grad-of-grad (energy+force training) through the fused kernel
    matches the XLA oracle for both the param and the position grads."""
    E, K, C, S1, S2 = 24, 4, 8, 6, 10
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    ws = 0.3 * jax.random.normal(ks[0], (S1, C))
    wt = 0.3 * jax.random.normal(ks[1], (S2, C))
    pos = jax.random.normal(ks[2], (E * K, 1))
    loss_f = _force_style_loss(E, K, C, S1, S2, 7, fused=True)
    loss_r = _force_style_loss(E, K, C, S1, S2, 7, fused=False)
    gf = jax.grad(loss_f, argnums=(0, 1))((ws, wt), pos)
    gr = jax.grad(loss_r, argnums=(0, 1))((ws, wt), pos)
    for a, b, name in [(gf[0][0], gr[0][0], "d_ws"),
                       (gf[0][1], gr[0][1], "d_wt"),
                       (gf[1], gr[1], "d_pos")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4 * float(jnp.abs(b).max()),
                                   err_msg=name)


def test_spherenet_force_training_pallas_matches_unfused():
    """Model level: one energy+force train-loss grad with pallas_triplet
    matches the unfused path (same params)."""
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet
    mols = synthetic_molecules(4, seed=3, min_atoms=5, max_atoms=10, box=6.0)
    for m in mols:
        m["force"] = np.random.default_rng(0).normal(
            size=m["pos"].shape).astype(np.float32)
    g = next(iter(MoleculeLoader(mols, 4, slot_size=10)))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8, block_size=10)
    m0 = SphereNet(**kw)
    m1 = SphereNet(**kw, pallas_triplet=True)
    params = m0.init(jax.random.PRNGKey(0), g)

    def loss(mod, p):
        def energy(pos):
            g_ = g.replace(nodes={**g.nodes, "pos": pos})
            e = mod.apply(p, g_)
            return jnp.sum(jnp.where(g.graph_mask[:, None], e, 0.0))
        force = -jax.grad(energy)(g.nodes["pos"])
        e = energy(g.nodes["pos"])
        f_err = jnp.where(g.node_mask[:, None],
                          force - g.nodes["force"], 0.0)
        return e + 10.0 * jnp.sum(f_err ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, a in flat0:
        b = flat1[path]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_trainer_rejects_force_with_elided_basis_grads():
    import optax
    from dig_tpu.models import SphereNet
    from dig_tpu.train.trainer import make_step_fns
    model = SphereNet(nk_degree=8, pallas_triplet=True,
                      pallas_basis_grads=False)
    with pytest.raises(ValueError, match="pallas_basis_grads"):
        make_step_fns(model, optax.adam(1e-3), energy_and_force=True)
