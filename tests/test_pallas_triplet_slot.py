"""Slot-resident fused triplet kernel (ops/pallas_triplet_slot.py) vs the
v3 packed-basis oracle and the unfused XLA model chain — forward, full
VJP, second-order (force-training) grads. Interpret mode off-TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.ops.pallas_triplet_pt import fused_triplet_pt_ref
from dig_tpu.ops.pallas_triplet_slot import (fused_triplet_slot,
                                             fused_triplet_slot_ref)


def _inputs(A=5, K=4, G=3, C=8, ns=3, nr=2, has_t=True, seed=0):
    rng = np.random.default_rng(seed)
    N, E = G * A, G * A * K
    T = E * K
    R = ns * nr + ns + (ns * ns if has_t else 0)
    x = jnp.asarray(rng.normal(size=(E, C)).astype(np.float32))
    lj_loc = rng.integers(0, A, size=E).astype(np.int32)
    m2 = jnp.asarray((rng.random((E, K)) > 0.3).astype(np.float32))
    pt_e = jnp.asarray(rng.normal(size=(R, T)).astype(np.float32))
    pt_s = pt_e.reshape(R, E, K).transpose(2, 0, 1)      # [K, R, E]
    ws = jnp.asarray(rng.normal(size=(ns * nr, C)).astype(np.float32))
    wt = jnp.asarray(rng.normal(
        size=((ns * ns * nr) if has_t else 1, C)).astype(np.float32))
    return (x, jnp.asarray(lj_loc[None]), m2, pt_e, pt_s, ws, wt,
            (ns, nr, has_t), A, K, G, C)


@pytest.mark.parametrize("has_t", [False, True])
def test_fwd_matches_v3_oracle(has_t):
    (x, lj, m2, pt_e, pt_s, ws, wt, cfg, A, K, G, C) = _inputs(has_t=has_t)
    N = G * A
    # v3 oracle consumes the HBM-materialized xg [T, C]
    jg = (np.arange(N * K) // (A * K)) * A + np.asarray(lj[0])
    xg = x.reshape(N, K, C)[jnp.asarray(jg)].reshape(-1, C)
    ref3 = fused_triplet_pt_ref(xg, pt_e, ws, wt, m2, K, cfg)
    out = fused_triplet_slot(x, pt_s, ws, wt, m2.T, lj, A, K, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref3),
                               atol=1e-4)


def test_vjp_and_second_order_match_xla_oracle():
    (x, lj, m2, pt_e, pt_s, ws, wt, cfg, A, K, G, C) = _inputs(seed=1)
    m2T = m2.T
    w_out = jax.random.normal(jax.random.PRNGKey(9), (x.shape[0], C))

    def f_k(x, pt, ws, wt):
        return jnp.sum(fused_triplet_slot(x, pt, ws, wt, m2T, lj,
                                          A, K, cfg) * w_out)

    def f_r(x, pt, ws, wt):
        return jnp.sum(fused_triplet_slot_ref(x, pt, ws, wt, m2T, lj,
                                              A, K, cfg) * w_out)

    gk = jax.grad(f_k, argnums=(0, 1, 2, 3))(x, pt_s, ws, wt)
    gr = jax.grad(f_r, argnums=(0, 1, 2, 3))(x, pt_s, ws, wt)
    for a, b, nm in zip(gk, gr, ["dx", "dpt", "dws", "dwt"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, err_msg=nm)

    # reverse-over-reverse (the force-training structure)
    def gg(f):
        def h(x, pt):
            g = jax.grad(lambda p: f(x, p, ws, wt))(pt)
            return jnp.sum(g * g)
        return jax.grad(h, argnums=(0, 1))(x, pt_s)

    hk, hr = gg(f_k), gg(f_r)
    for a, b, nm in zip(hk, hr, ["ddx", "ddpt"]):
        err = float(jnp.max(jnp.abs(a - b)))
        den = float(jnp.max(jnp.abs(b))) + 1e-6
        assert err / den < 1e-3, (nm, err, den)


def _slot_batch():
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    mols = synthetic_molecules(4, seed=3, min_atoms=5, max_atoms=10,
                               box=6.0)
    for m in mols:
        m["force"] = np.random.default_rng(0).normal(
            size=m["pos"].shape).astype(np.float32)
    return next(iter(MoleculeLoader(mols, 4, slot_size=10)))


_KW = dict(cutoff=5.0, num_layers=2, hidden_channels=32,
           num_spherical=2, num_radial=4, nk_degree=8, block_size=10)


def test_spherenet_slot_forward_matches_unfused():
    from dig_tpu.models import SphereNet
    g = _slot_batch()
    m0 = SphereNet(**_KW)
    m1 = SphereNet(**_KW, pallas_triplet=True, pallas_fuse_basis=True,
                   pallas_slot=True)
    params = m0.init(jax.random.PRNGKey(0), g)
    e0 = m0.apply(params, g)
    e1 = m1.apply(params, g)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=1e-4,
                               atol=1e-5)


def test_spherenet_slot_force_training_matches_unfused():
    """Model level: energy+force train-loss grad with the slot-resident
    kernel matches the unfused XLA chain (same params)."""
    from dig_tpu.models import SphereNet
    g = _slot_batch()
    m0 = SphereNet(**_KW)
    m1 = SphereNet(**_KW, pallas_triplet=True, pallas_fuse_basis=True,
                   pallas_slot=True)
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


@pytest.mark.parametrize("has_t", [False, True])
def test_geom_kernel_matches_pt_chain(has_t):
    """Scalar-geometry kernel (round 5) == pt kernel fed by the XLA
    basis_pt_k chain from the SAME scalars: forward, full first-order
    grads (dgeo vs the chain rule through the closed forms), and
    reverse-over-reverse (the force-training structure)."""
    from dig_tpu.ops.pallas_triplet_slot import (basis_pt_k,
                                                 fused_triplet_slot_geom)
    A, K, G, C, ns, nr = 5, 4, 3, 8, 3, 2
    E = G * A * K
    rng = np.random.default_rng(7)
    cfg = (ns, nr, has_t)
    x = jnp.asarray(rng.normal(size=(E, C)).astype(np.float32))
    lj = jnp.asarray(rng.integers(0, A, size=E).astype(np.int32)[None])
    m2T = jnp.asarray((rng.random((K, E)) > 0.3).astype(np.float32))
    th = jnp.asarray(rng.uniform(0.1, 3.0, (K, E)).astype(np.float32))
    ph = jnp.asarray(rng.uniform(0.0, 6.2, (K, E)).astype(np.float32))
    dk = jnp.asarray(rng.uniform(0.1, 1.0, (K, E)).astype(np.float32))
    geo = (jnp.stack([th, ph, dk], axis=1) if has_t
           else jnp.stack([th, dk], axis=1))
    ws = jnp.asarray(rng.normal(size=(ns * nr, C)).astype(np.float32))
    wt = jnp.asarray(rng.normal(
        size=((ns * ns * nr) if has_t else 1, C)).astype(np.float32))
    w_out = jax.random.normal(jax.random.PRNGKey(3), (E, C))

    def f_g(x, geo, ws, wt):
        return jnp.sum(fused_triplet_slot_geom(
            x, geo, ws, wt, m2T, lj, A, K, cfg) * w_out)

    def f_p(x, geo, ws, wt):
        pt = basis_pt_k(ns, nr, geo[:, 0],
                        geo[:, 1] if has_t else None, geo[:, -1], has_t)
        return jnp.sum(fused_triplet_slot(
            x, pt, ws, wt, m2T, lj, A, K, cfg) * w_out)

    np.testing.assert_allclose(float(f_g(x, geo, ws, wt)),
                               float(f_p(x, geo, ws, wt)), rtol=1e-4)
    gk = jax.grad(f_g, argnums=(0, 1, 2, 3))(x, geo, ws, wt)
    gr = jax.grad(f_p, argnums=(0, 1, 2, 3))(x, geo, ws, wt)
    for a, b, nm in zip(gk, gr, ["dx", "dgeo", "dws", "dwt"]):
        err = float(jnp.max(jnp.abs(a - b)))
        den = float(jnp.max(jnp.abs(b))) + 1e-6
        assert err / den < 2e-4, (nm, err, den)

    def gg(f):
        def h(x, geo):
            g = jax.grad(lambda gg_: f(x, gg_, ws, wt))(geo)
            return jnp.sum(g * g)
        return jax.grad(h, argnums=(0, 1))(x, geo)

    hk, hr = gg(f_g), gg(f_p)
    for a, b, nm in zip(hk, hr, ["ddx", "ddgeo"]):
        err = float(jnp.max(jnp.abs(a - b)))
        den = float(jnp.max(jnp.abs(b))) + 1e-6
        assert err / den < 1e-3, (nm, err, den)
