"""Expert-parallel Switch-style MoE (parallel/ep.py): all_to_all dispatch
parity vs the dense oracle, capacity-drop accounting, gradient flow.
Runs on the 8-device CPU mesh. The reference has no MoE/model parallelism
(SURVEY §2.10)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dig_tpu.parallel import make_mesh
from dig_tpu.parallel.ep import (ep_shard_params, init_moe_params,
                                 make_ep_moe, moe_dense_reference)


def _setup(E=16, F=12, H=24, O=8, B=64, seed=0):
    mesh = make_mesh((8,), ("expert",))
    params = init_moe_params(jax.random.PRNGKey(seed), E, F, H, O)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, F))
    pp = ep_shard_params(params, mesh)
    xx = jax.device_put(x, NamedSharding(mesh, P("expert")))
    return mesh, params, x, pp, xx


def test_ep_matches_dense_oracle():
    mesh, params, x, pp, xx = _setup()
    y, dropped = jax.jit(make_ep_moe(mesh, 16, capacity=64))(pp, xx)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(moe_dense_reference(params, x)),
                               atol=1e-5)


def test_ep_capacity_drops_accounted():
    mesh, params, x, pp, xx = _setup(seed=2)
    y, dropped = jax.jit(make_ep_moe(mesh, 16, capacity=2))(pp, xx)
    ref = np.asarray(moe_dense_reference(params, x))
    y = np.asarray(y)
    nz = np.abs(y).sum(1) > 0
    assert int(dropped) == int((~nz).sum()) and int(dropped) > 0
    np.testing.assert_allclose(y[nz], ref[nz], atol=1e-5)


def test_ep_grads_flow_to_experts_and_gate():
    mesh, params, x, pp, xx = _setup(seed=3)
    apply = jax.jit(make_ep_moe(mesh, 16, capacity=64))

    def loss(p):
        y, _ = apply(p, xx)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(pp)
    for name, leaf in jax.tree_util.tree_leaves_with_path(g):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr)), name
    assert float(jnp.abs(g["wg"]).max()) > 0      # gate learns
    assert float(jnp.abs(g["w1"]).max()) > 0      # experts learn
