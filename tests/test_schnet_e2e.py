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


def test_run3d_driver(tmp_path):
    """Full Run3D epoch driver: train/val/test loop, best-valid orbax
    checkpointing, metrics logging."""
    from dig_tpu.threed import Run3D
    mols = synthetic_molecules(24, seed=5, max_atoms=10, num_targets=1)
    model = SchNet(cutoff=3.0, num_layers=1, hidden_channels=16,
                   num_filters=16, num_gaussians=8, max_edges=256)
    res = Run3D().run(mols[:16], mols[16:20], mols[20:], model,
                      ThreeDEvaluator(), epochs=2, batch_size=8,
                      vt_batch_size=4, lr=1e-3, n_node_pad=80,
                      save_dir=str(tmp_path / "ckpt"),
                      log_dir=str(tmp_path / "logs"), quiet=True)
    assert np.isfinite(res["best_valid"])
    assert np.isfinite(res["best_test"])
    import os
    assert os.path.exists(tmp_path / "logs" / "metrics.jsonl")


def test_checkpointer_roundtrip(tmp_path):
    from dig_tpu.train.checkpoint import Checkpointer, partial_restore
    mols = synthetic_molecules(4, seed=6, max_atoms=8)
    loader = MoleculeLoader(mols, 4, n_node_pad=32)
    model = SchNet(cutoff=3.0, num_layers=1, hidden_channels=8,
                   num_filters=8, num_gaussians=4, max_edges=64)
    g = next(iter(loader))
    opt = optax.adam(1e-3)
    state = make_train_state(model, opt, g)
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(state, step=1)
    restored = ck.restore(template=state)
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y)
    # partial restore copies matching leaves
    merged = partial_restore(state.params, restored.params)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(state.params)
