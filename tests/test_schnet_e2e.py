"""End-to-end SchNet: init, forward, training-loss decrease, force path."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dig_tpu.datasets import synthetic_molecules, MoleculeLoader
from dig_tpu.models import SchNet
from dig_tpu.threed import ThreeDEvaluator
from dig_tpu.train.trainer import make_step_fns, make_train_state


@pytest.fixture(scope="module")
def tiny_model():
    return SchNet(cutoff=3.0, num_layers=2, hidden_channels=32,
                  num_filters=32, num_gaussians=16, max_edges=512)


def test_forward_shapes(tiny_model):
    mols = synthetic_molecules(8, seed=0, max_atoms=12)
    loader = MoleculeLoader(mols, batch_size=4)
    g = next(iter(loader))
    params = tiny_model.init(jax.random.PRNGKey(0), g)
    out = tiny_model.apply(params, g)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_padding_invariance(tiny_model):
    """Same molecules, different node padding -> identical outputs."""
    mols = synthetic_molecules(4, seed=1, max_atoms=10)
    g1 = next(iter(MoleculeLoader(mols, batch_size=4, n_node_pad=48)))
    g2 = next(iter(MoleculeLoader(mols, batch_size=4, n_node_pad=96)))
    params = tiny_model.init(jax.random.PRNGKey(0), g1)
    o1 = np.asarray(tiny_model.apply(params, g1))
    o2 = np.asarray(tiny_model.apply(params, g2))
    np.testing.assert_allclose(o1, o2, rtol=2e-5, atol=2e-5)


def test_train_loss_decreases(tiny_model):
    mols = synthetic_molecules(16, seed=2, max_atoms=10)
    # learnable target: number of atoms (a sum-pool readout can fit this)
    for m in mols:
        m["y"] = np.array([float(len(m["z"]))], np.float32)
    loader = MoleculeLoader(mols, batch_size=8, shuffle=True, seed=0,
                            n_node_pad=96)
    opt = optax.adam(5e-3)
    g0 = next(iter(loader))
    state = make_train_state(tiny_model, opt, g0)
    train_step, _ = make_step_fns(tiny_model, opt, loss="l1")
    losses = []
    for _ in range(30):
        for g in loader:
            state, aux = train_step(state, g)
            losses.append(float(aux["loss"]))
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5])


def test_energy_and_force(tiny_model):
    mols = synthetic_molecules(8, seed=3, max_atoms=10, with_forces=True)
    loader = MoleculeLoader(mols, batch_size=4, n_node_pad=48)
    opt = optax.adam(1e-3)
    g0 = next(iter(loader))
    state = make_train_state(tiny_model, opt, g0)
    train_step, eval_step = make_step_fns(
        tiny_model, opt, energy_and_force=True, p=1.0)
    state, aux = train_step(state, g0)
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["f_loss"]))
    out = eval_step(state, g0)
    f = np.asarray(out["force_pred"])
    assert f.shape == (48, 3)
    # padded atoms get zero force
    nm = np.asarray(g0.node_mask)
    assert np.allclose(f[~nm], 0.0, atol=1e-6)
    assert np.any(np.abs(f[nm]) > 0)


def test_evaluator():
    ev = ThreeDEvaluator()
    out = ev.eval({"y_true": np.zeros((5, 1)), "y_pred": np.ones((5, 1))})
    assert out["mae"] == 1.0
