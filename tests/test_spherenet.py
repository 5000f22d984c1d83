"""SphereNet / DimeNet++ correctness: basis functions vs scipy ground truth,
physical invariances (rotation/translation/permutation), padding invariance,
and force-path training. (The torch reference can't run here — no PyG — so
parity is checked at the math level: the basis construction is identical by
derivation, reference features.py:14-148.)"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from scipy import special as sp

from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
from dig_tpu.models import DimeNetPP, SphereNet
from dig_tpu.ops import basis
from dig_tpu.train.trainer import make_step_fns, make_train_state


def test_bessel_basis_vs_scipy():
    """b_{l,m}(x) = N * j_l(z_{l,m} x) with N = 1/sqrt(0.5*j_{l+1}(z)^2)."""
    n, k = 4, 5
    x = np.linspace(0.05, 1.0, 40)
    table = np.asarray(basis.bessel_table(n, k, jnp.asarray(x)))  # [40, n, k]
    zeros = np.array(basis._Jn_zeros(n, k))
    for l in range(n):
        for m in range(k):
            z = zeros[l, m]
            norm = 1.0 / np.sqrt(0.5 * basis._Jn(z, l + 1) ** 2)
            want = norm * sp.spherical_jn(l, z * x)
            # f32 closed-form Rayleigh recursion loses ~1e-4 rel near small x
            # (reference lambdifies the same sympy forms to f32 torch).
            np.testing.assert_allclose(table[:, l, m], want, rtol=1e-3,
                                       atol=5e-4)


def test_sph_m0_vs_scipy():
    """Y_l^0(theta) equals scipy's real sph_harm at m=0."""
    L = 5
    theta = np.linspace(0.01, np.pi - 0.01, 30)
    table = np.asarray(basis.sph_m0_table(L, jnp.asarray(theta)))
    for l in range(L):
        want = np.real(sp.sph_harm_y(l, 0, theta, 0.0))
        np.testing.assert_allclose(table[:, l], want, rtol=1e-4, atol=1e-5)


def test_sph_full_vs_scipy():
    """Real Y_l^m vs scipy complex harmonics (standard real combination)."""
    L = 4
    rng = np.random.default_rng(0)
    theta = rng.uniform(0.1, np.pi - 0.1, 20)
    phi = rng.uniform(0.1, 2 * np.pi - 0.1, 20)
    table = np.asarray(basis.sph_full_table(L, jnp.asarray(theta),
                                            jnp.asarray(phi)))
    # storage order per level l: [m=0, +1..+l, -l..-1]
    col = 0
    for l in range(L):
        order = ([0] + list(range(1, l + 1)) + list(range(-l, 0))
                 if l else [0])
        for m in order:
            y = sp.sph_harm_y(l, abs(m), theta, phi)
            if m == 0:
                want = np.real(y)
            elif m > 0:
                want = np.sqrt(2) * (-1) ** m * np.real(y)
            else:
                want = np.sqrt(2) * (-1) ** (-m) * np.imag(y)
            got = table[:, col]
            # sign convention may differ by Condon-Shortley handling:
            # accept either global sign per (l, m)
            if np.linalg.norm(got - want) > np.linalg.norm(got + want):
                want = -want
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
            col += 1


@pytest.fixture(scope="module")
def tiny_batch():
    mols = synthetic_molecules(4, seed=0, max_atoms=10, with_forces=True)
    return mols, next(iter(MoleculeLoader(mols, 4, n_node_pad=40)))


def _tiny(M):
    return M(cutoff=3.0, num_layers=2, hidden_channels=32, int_emb_size=16,
             out_emb_channels=32, num_spherical=3, num_radial=4,
             max_edges=256, max_in_degree=8)


@pytest.mark.parametrize("M", [SphereNet, DimeNetPP])
def test_rotation_translation_invariance(M, tiny_batch):
    mols, g = tiny_batch
    model = _tiny(M)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    out0 = np.asarray(model.apply(params, g))

    # random rotation + translation
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    t = rng.normal(size=(1, 3)).astype(np.float32)
    pos2 = np.asarray(g.nodes["pos"]) @ Q.astype(np.float32).T + t
    g2 = g.replace(nodes={**g.nodes, "pos": jnp.asarray(pos2)})
    out1 = np.asarray(model.apply(params, g2))
    np.testing.assert_allclose(out0, out1, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("M", [SphereNet, DimeNetPP])
def test_permutation_invariance(M, tiny_batch):
    mols, g = tiny_batch
    model = _tiny(M)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    out0 = np.asarray(model.apply(params, g))

    # permute atoms within each molecule, rebuild the batch
    rng = np.random.default_rng(2)
    mols_p = []
    for m in mols:
        p = rng.permutation(len(m["z"]))
        mols_p.append({"z": m["z"][p], "pos": m["pos"][p], "y": m["y"],
                       "force": m["force"][p]})
    g2 = next(iter(MoleculeLoader(mols_p, 4, n_node_pad=40)))
    out1 = np.asarray(model.apply(params, g2))
    np.testing.assert_allclose(out0, out1, rtol=1e-3, atol=1e-3)


def test_padding_invariance(tiny_batch):
    mols, g = tiny_batch
    model = _tiny(SphereNet)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    out0 = np.asarray(model.apply(params, g))
    g2 = next(iter(MoleculeLoader(mols, 4, n_node_pad=80)))
    out1 = np.asarray(model.apply(params, g2))
    np.testing.assert_allclose(out0, out1, rtol=2e-4, atol=2e-4)


def test_force_training_decreases(tiny_batch):
    mols, g = tiny_batch
    model = _tiny(SphereNet)
    opt = optax.adam(2e-3)
    state = make_train_state(model, opt, g)
    ts, _ = make_step_fns(model, opt, energy_and_force=True, p=1.0)
    losses = []
    for _ in range(12):
        state, aux = ts(state, g)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_comenet_forward_and_invariance(tiny_batch):
    from dig_tpu.models import ComENet
    mols, g = tiny_batch
    model = ComENet(cutoff=4.0, num_layers=2, hidden_channels=32,
                    middle_channels=16, max_edges=256)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    out0 = np.asarray(model.apply(params, g))
    assert out0.shape == (4, 1) and np.all(np.isfinite(out0))
    # rotation + translation invariance (proper rotation: det=+1 — the
    # phi/tau features are chirality-sensitive, as in the reference)
    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    pos2 = np.asarray(g.nodes["pos"]) @ Q.astype(np.float32).T + 1.5
    g2 = g.replace(nodes={**g.nodes, "pos": jnp.asarray(pos2)})
    out1 = np.asarray(model.apply(params, g2))
    np.testing.assert_allclose(out0, out1, rtol=1e-3, atol=1e-3)


def test_pronet_levels_and_training():
    from dig_tpu.datasets import ProteinLoader, synthetic_proteins
    from dig_tpu.models import ProNet
    prots = synthetic_proteins(8, seed=0, max_res=12)
    loader = ProteinLoader(prots, 4)
    g = next(iter(loader))
    for level in ("aminoacid", "backbone", "allatom"):
        model = ProNet(level=level, num_blocks=1, hidden_channels=24,
                       mid_emb=12, out_channels=4, max_edges=512)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
        out = model.apply(params, g)
        assert out.shape == (4, 4)
        assert np.all(np.isfinite(np.asarray(out)))
        # bf16 compute path: same params, close outputs
        m16 = ProNet(level=level, num_blocks=1, hidden_channels=24,
                     mid_emb=12, out_channels=4, max_edges=512,
                     compute_dtype=jnp.bfloat16)
        out16 = m16.apply(params, g)
        np.testing.assert_allclose(np.asarray(out16), np.asarray(out),
                                   rtol=0.1, atol=0.1)
    # gradient flows through the geometry
    model = ProNet(level="aminoacid", num_blocks=1, hidden_channels=24,
                   mid_emb=12, out_channels=4, max_edges=512)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g)
    grads = jax.grad(lambda p: jnp.sum(model.apply(p, g)))(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_spherenet_nk_layout_matches_flat():
    """nk_degree (the [N, K] neighbor-table layout) computes the same
    energies as the compacted edge list when neither layout truncates."""
    import jax
    import numpy as np
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet

    mols = synthetic_molecules(8, seed=0, min_atoms=8, max_atoms=14, box=6.0)
    loader = MoleculeLoader(mols, 8, n_node_pad=8 * 14, shuffle=False, seed=0)
    b = next(iter(loader))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32, num_spherical=3,
              num_radial=4, out_emb_channels=32, int_emb_size=16)
    m_flat = SphereNet(max_edges=2048, max_in_degree=16, **kw)
    m_nk = SphereNet(nk_degree=16, **kw)
    p = jax.jit(m_flat.init)(jax.random.PRNGKey(0), b)
    u1 = np.asarray(jax.jit(m_flat.apply)(p, b))
    u2 = np.asarray(jax.jit(m_nk.apply)(p, b))
    # f32 summation-order noise over ~1500 edges: ~3e-4 relative.
    np.testing.assert_allclose(u1, u2, rtol=1e-3, atol=1e-3)


def test_spherenet_bf16_close_to_f32():
    """compute_dtype=bf16 (the bench config) shares f32 params and stays
    within ~1% of the f32 energies; grads stay finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet

    mols = synthetic_molecules(8, seed=0, min_atoms=8, max_atoms=14, box=6.0)
    b = next(iter(MoleculeLoader(mols, 8, n_node_pad=8 * 14)))
    kw = dict(cutoff=5.0, num_layers=2, hidden_channels=32, num_spherical=3,
              num_radial=4, out_emb_channels=32, int_emb_size=16,
              nk_degree=16)
    m32 = SphereNet(**kw)
    m16 = SphereNet(compute_dtype=jnp.bfloat16, **kw)
    p = jax.jit(m32.init)(jax.random.PRNGKey(0), b)
    assert jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: a.dtype == b.dtype and a.shape == b.shape,
        p, jax.jit(m16.init)(jax.random.PRNGKey(0), b)))
    u32 = np.asarray(jax.jit(m32.apply)(p, b), np.float64)
    u16 = np.asarray(jax.jit(m16.apply)(p, b), np.float64)
    rel = np.abs(u32 - u16) / np.maximum(np.abs(u32), 1.0)
    assert rel.max() < 3e-2, rel.max()
    g = jax.grad(lambda p: jnp.sum(m16.apply(p, b)))(p)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_protein_dihedral_embeddings():
    """Golden-value dihedrals + the reference's padding/NaN semantics
    (ECdataset.py:109-157)."""
    import numpy as np
    from dig_tpu.datasets.proteins import (bb_embs, compute_dihedrals,
                                           side_chain_embs)

    # Known torsion: butane-like chain with a 90-degree dihedral.
    p0 = np.array([0.0, 1.0, 0.0])
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([1.0, 0.0, 0.0])
    p3 = np.array([1.0, 0.0, 1.0])
    v1, v2, v3 = p1 - p0, p2 - p1, p3 - p2
    tor = compute_dihedrals(v1[None], v2[None], v3[None])[0]
    np.testing.assert_allclose(abs(tor), np.pi / 2, atol=1e-6)
    # syn (cis, same side) -> 0; anti (trans, opposite side) -> pi
    tor = compute_dihedrals(v1[None], v2[None],
                            np.array([[0.0, 1.0, 0.0]]))[0]
    np.testing.assert_allclose(tor, 0.0, atol=1e-6)
    tor = compute_dihedrals(v1[None], v2[None],
                            np.array([[0.0, -1.0, 0.0]]))[0]
    np.testing.assert_allclose(abs(tor), np.pi, atol=1e-6)

    # bb_embs: phi[0], psi[-1], omega[-1] are zero-padded -> cos=1, sin=0.
    rng = np.random.default_rng(0)
    X = rng.normal(size=(5, 3, 3))
    e = bb_embs(X)
    assert e.shape == (5, 6)
    np.testing.assert_allclose(e[0, 0], 1.0, atol=1e-6)   # cos(phi[0]=0)
    np.testing.assert_allclose(e[0, 3], 0.0, atol=1e-6)   # sin(phi[0]=0)
    np.testing.assert_allclose(e[-1, [1, 2]], 1.0, atol=1e-6)
    np.testing.assert_allclose(e[-1, [4, 5]], 0.0, atol=1e-6)

    # missing atoms (NaN) produce zero embeddings, not NaN.
    n = 4
    args = [rng.normal(size=(n, 3)) for _ in range(9)]
    args[5][:] = np.nan                                   # no delta atoms
    s = side_chain_embs(*args)
    assert s.shape == (n, 8)
    assert np.isfinite(s).all()


def test_pronet_dropout_and_augment_flags():
    """dropout / euler_noise / data_augment_eachlayer run and only perturb
    outputs when deterministic=False (pronet.py:425-429,455-458)."""
    import jax
    import numpy as np
    from dig_tpu.datasets import ProteinLoader, synthetic_proteins
    from dig_tpu.models import ProNet

    prots = synthetic_proteins(4, seed=0, max_res=10)
    g = next(iter(ProteinLoader(prots, 4)))
    model = ProNet(level="allatom", num_blocks=1, hidden_channels=24,
                   mid_emb=12, out_channels=3, max_edges=512,
                   dropout=0.3, euler_noise=True,
                   data_augment_eachlayer=True)
    params = model.init(jax.random.PRNGKey(0), g)
    det = model.apply(params, g)                          # deterministic
    det2 = model.apply(params, g)
    np.testing.assert_allclose(np.asarray(det), np.asarray(det2))
    rngs = {"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}
    tr = model.apply(params, g, deterministic=False, rngs=rngs)
    assert np.isfinite(np.asarray(tr)).all()
    assert float(np.max(np.abs(np.asarray(tr) - np.asarray(det)))) > 1e-6
