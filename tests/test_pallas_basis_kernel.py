"""Packed-transposed-basis fused kernel (ops/pallas_triplet_pt.py) vs two
oracles: (a) the same math staged through XLA (fused_triplet_pt_ref),
(b) the model's real AngleEmb/TorsionEmb chain — catching both kernel
harness bugs and basis-math drift. Covers forward, first-order VJP,
second-order (force-training) grad-of-grad, and the model-level
pallas_fuse_basis path. Runs in interpret mode off-TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.ops.basis import bessel_table, sph_full_table, sph_m0_table
from dig_tpu.ops.pallas_triplet_pt import (basis_pt, fused_triplet_pt,
                                           fused_triplet_pt_ref, pt_rows)

NS, NR = 3, 4  # small static basis config (n*k = 12, n*n*k = 36)


def _inputs(E=40, K=4, C=16, seed=0, has_t=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    T = E * K
    xg = jax.random.normal(ks[0], (T, C))
    th = jax.random.uniform(ks[1], (T,), minval=0.1, maxval=3.0)
    ph = jax.random.uniform(ks[2], (T,), minval=-3.0, maxval=3.0)
    dk = jax.random.uniform(ks[3], (T,), minval=0.1, maxval=0.95)
    ws = 0.3 * jax.random.normal(ks[4], (NS * NR, C))
    wt = (0.3 * jax.random.normal(ks[5], (NS * NS * NR, C)) if has_t
          else jnp.zeros((1, C)))
    m2d = (jax.random.uniform(ks[6], (E, K)) > 0.25).astype(jnp.float32)
    return xg, th, ph, dk, ws, wt, m2d


def _chain_oracle(xg, th, ph, dk, ws, wt, m2d, K, has_t):
    """The model's materialized basis chain (AngleEmb/TorsionEmb math)."""
    E = m2d.shape[0]
    rbf = bessel_table(NS, NR, dk)                        # [T, n, k]
    sbf = (rbf * sph_m0_table(NS, th)[:, :, None]).reshape(E * K, -1)
    prod = xg * (sbf @ ws)
    if has_t:
        cbf = sph_full_table(NS, th, ph).reshape(-1, NS, NS)
        tbf = (cbf[:, :, :, None] * rbf[:, None, :, :]).reshape(E * K, -1)
        prod = prod * (tbf @ wt)
    return jnp.sum(prod.reshape(E, K, -1) * m2d[:, :, None], axis=1)


@pytest.mark.parametrize("has_t", [True, False])
def test_fwd_matches_chain_oracle(has_t):
    xg, th, ph, dk, ws, wt, m2d = _inputs(has_t=has_t)
    cfg = (NS, NR, has_t)
    pt = basis_pt(NS, NR, th, ph, dk, has_t)
    assert pt.shape[0] == pt_rows(NS, NR, has_t)
    out = fused_triplet_pt(xg, pt, ws, wt, m2d, 4, 16, cfg)
    ref = _chain_oracle(xg, th, ph, dk, ws, wt, m2d, 4, has_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fwd_ragged_tail_matches_ref():
    xg, th, ph, dk, ws, wt, m2d = _inputs(E=37, seed=1)
    cfg = (NS, NR, True)
    pt = basis_pt(NS, NR, th, ph, dk, True)
    out = fused_triplet_pt(xg, pt, ws, wt, m2d, 4, 16, cfg)
    ref = fused_triplet_pt_ref(xg, pt, ws, wt, m2d, 4, cfg)
    assert out.shape == (37, xg.shape[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_masked_slots_ignored():
    """pt values at masked slots must not affect the output, and their
    cotangents must be zero (the kernel masks every contribution)."""
    xg, th, ph, dk, ws, wt, m2d = _inputs(seed=2)
    cfg = (NS, NR, True)
    pt = basis_pt(NS, NR, th, ph, dk, True)
    slot = ~(m2d.reshape(-1) > 0)
    pt_bad = jnp.where(slot[None, :], 1e6, pt)
    out = fused_triplet_pt(xg, pt, ws, wt, m2d, 4, 16, cfg)
    out_bad = fused_triplet_pt(xg, pt_bad, ws, wt, m2d, 4, 16, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_bad),
                               rtol=1e-5, atol=1e-5)
    ct = jax.random.normal(jax.random.PRNGKey(9), out.shape)
    dpt = jax.vjp(lambda p: fused_triplet_pt(xg, p, ws, wt, m2d, 4, 16,
                                             cfg), pt)[1](ct)[0]
    assert float(jnp.abs(dpt[:, slot]).max()) == 0.0


@pytest.mark.parametrize("has_t", [True, False])
def test_vjp_matches_chain_oracle(has_t):
    xg, th, ph, dk, ws, wt, m2d = _inputs(seed=3, has_t=has_t)
    cfg = (NS, NR, has_t)

    def fused(xg, th, ph, dk, ws, wt):
        pt = basis_pt(NS, NR, th, ph, dk, has_t)
        return fused_triplet_pt(xg, pt, ws, wt, m2d, 4, 16, cfg)

    out = fused(xg, th, ph, dk, ws, wt)
    ct = jax.random.normal(jax.random.PRNGKey(9), out.shape)
    g_f = jax.vjp(fused, xg, th, ph, dk, ws, wt)[1](ct)
    g_r = jax.vjp(lambda *a: _chain_oracle(*a, m2d, 4, has_t),
                  xg, th, ph, dk, ws, wt)[1](ct)
    names = ["dxg", "dth", "dph", "ddk", "dws", "dwt"]
    for name, a, b in zip(names, g_f, g_r):
        if name in ("dph", "dwt") and not has_t:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4,
            atol=2e-4 * max(1e-6, float(jnp.abs(b).max())), err_msg=name)


def test_second_order_force_training_grads():
    """grad-of-grad (energy+force training): inner grad wrt the scalar
    geometry (the pos-dependent inputs), outer grad wrt the weights."""
    xg, th, ph, dk, ws, wt, m2d = _inputs(E=24, K=4, C=8, seed=4)
    cfg = (NS, NR, True)
    wdown = jax.random.normal(jax.random.PRNGKey(5), (xg.shape[1],))

    def make_loss(fused):
        def energy(geom, weights):
            t, p, d = geom
            ws_, wt_ = weights
            if fused:
                pt = basis_pt(NS, NR, t, p, d, True)
                out = fused_triplet_pt(xg, pt, ws_, wt_, m2d, 4, 8, cfg)
            else:
                out = _chain_oracle(xg, t, p, d, ws_, wt_, m2d, 4, True)
            return jnp.sum(out * wdown)

        def loss(weights, geom):
            e = energy(geom, weights)
            force = jax.grad(energy)(geom, weights)
            return 0.1 * e + sum(jnp.sum(f ** 2) for f in force)

        return loss

    geom = (th, ph, dk)
    gf = jax.grad(make_loss(True), argnums=(0, 1))((ws, wt), geom)
    gr = jax.grad(make_loss(False), argnums=(0, 1))((ws, wt), geom)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    for i, (a, b) in enumerate(zip(flat_f, flat_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4,
            atol=5e-4 * max(1e-6, float(jnp.abs(b).max())),
            err_msg=f"leaf {i}")


def test_spherenet_fuse_basis_forward_matches_unfused():
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet
    mols = synthetic_molecules(4, seed=3, min_atoms=5, max_atoms=10,
                               box=6.0)
    g = next(iter(MoleculeLoader(mols, 4, slot_size=10)))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8, block_size=10)
    m0 = SphereNet(**kw)
    m1 = SphereNet(**kw, pallas_triplet=True, pallas_fuse_basis=True)
    params = m0.init(jax.random.PRNGKey(0), g)
    e0 = m0.apply(params, g)
    e1 = m1.apply(params, g)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-4,
                               atol=1e-5)


def test_spherenet_fuse_basis_force_training_matches_unfused():
    """Model level: one energy+force train-loss grad with the fully fused
    basis kernel matches the unfused XLA chain (same params)."""
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet
    mols = synthetic_molecules(4, seed=3, min_atoms=5, max_atoms=10,
                               box=6.0)
    for m in mols:
        m["force"] = np.random.default_rng(0).normal(
            size=m["pos"].shape).astype(np.float32)
    g = next(iter(MoleculeLoader(mols, 4, slot_size=10)))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
              num_spherical=2, num_radial=4, nk_degree=8, block_size=10)
    m0 = SphereNet(**kw)
    m1 = SphereNet(**kw, pallas_triplet=True, pallas_fuse_basis=True)
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
