"""Debug mode (NaN checks, donation asserts, collective self-checks) and
profiler integration — SURVEY.md §5 rows the reference has no analog of."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
from dig_tpu.models import SchNet
from dig_tpu.train import (StepProfiler, assert_donation_discipline,
                           collective_selfcheck, debug_mode, make_step_fns,
                           make_train_state)


def _tiny():
    mols = synthetic_molecules(4, seed=0, max_atoms=8)
    return next(iter(MoleculeLoader(mols, 4, n_node_pad=32)))


def _model_and_steps(donate=True):
    model = SchNet(cutoff=5.0, num_layers=1, hidden_channels=16,
                   num_filters=16, num_gaussians=8, max_edges=128)
    opt = optax.adam(1e-3)
    train_step, eval_step = make_step_fns(model, opt, donate=donate)
    return model, opt, train_step


def test_donation_discipline_passes_for_donated_step():
    g = _tiny()
    model, opt, train_step = _model_and_steps(donate=True)
    state = make_train_state(model, opt, g, seed=0)
    assert_donation_discipline(train_step, state, g)


def test_donation_discipline_flags_copying_step():
    g = _tiny()
    model, opt, train_step = _model_and_steps(donate=False)
    state = make_train_state(model, opt, g, seed=0)
    with pytest.raises(AssertionError, match="copied instead of donating"):
        assert_donation_discipline(train_step, state, g)


def test_debug_mode_raises_on_nan():
    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x))(
                jnp.float32(-1.0)).block_until_ready()
    # restored afterwards
    assert not jax.config.jax_debug_nans


def test_collective_selfcheck_8dev():
    from dig_tpu.parallel import make_mesh
    mesh = make_mesh((4, 2), ("data", "graph"))
    sizes = collective_selfcheck(mesh)
    assert sizes == {"data": 4, "graph": 2}


def test_step_profiler_writes_trace(tmp_path):
    log_dir = str(tmp_path / "prof")
    prof = StepProfiler(log_dir, start_step=1, num_steps=2)
    g = _tiny()
    model, opt, train_step = _model_and_steps(donate=False)
    state = make_train_state(model, opt, g, seed=0)
    for _ in range(4):
        with prof.step():
            state, _ = train_step(state, g)
    prof.stop()
    # XPlane protobufs land under plugins/profile/<run>/
    hits = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                     recursive=True)
    assert hits, f"no trace written under {log_dir}"


def test_run3d_debug_and_profile(tmp_path):
    from dig_tpu.threed import ThreeDEvaluator
    from dig_tpu.train import Run3D
    mols = synthetic_molecules(12, seed=0, max_atoms=8, num_targets=1)
    model = SchNet(cutoff=5.0, num_layers=1, hidden_channels=16,
                   num_filters=16, num_gaussians=8, max_edges=256)
    res = Run3D().run(mols[:8], mols[8:10], mols[10:], model,
                      ThreeDEvaluator(), epochs=1, batch_size=4,
                      vt_batch_size=2, n_node_pad=32, quiet=True,
                      debug=True, profile_dir=str(tmp_path / "p"))
    assert np.isfinite(res["best_valid"])
