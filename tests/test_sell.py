"""SELL (sliced-ELLPACK) segment sum vs jax.ops.segment_sum: forward in
both row orders, VJP, SpMM wrapper, and skewed-degree plans."""
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops.sell import build_sell_plan, segment_sum_sell, spmm_sell


def _problem(seed=0, N=60, E=500, F=24):
    rng = np.random.default_rng(seed)
    seg = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    rowptr = np.zeros(N + 1, np.int32)
    np.add.at(rowptr[1:], seg, 1)
    rowptr = np.cumsum(rowptr).astype(np.int32)
    data = rng.normal(size=(E, F)).astype(np.float32)
    return jnp.asarray(data), jnp.asarray(seg), rowptr, N


def test_sell_forward_both_orders():
    data, seg, rowptr, N = _problem()
    plan = build_sell_plan(rowptr)
    ref = jax.ops.segment_sum(data, seg, num_segments=N)
    out_p = segment_sum_sell(data, plan)
    np.testing.assert_allclose(np.asarray(out_p),
                               np.asarray(ref)[np.asarray(plan.row_order)],
                               rtol=1e-5, atol=1e-5)
    out_o = segment_sum_sell(data, plan, original_order=True)
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sell_vjp():
    data, seg, rowptr, N = _problem(seed=1)
    plan = build_sell_plan(rowptr)

    def loss_k(d):
        return jnp.sum(
            segment_sum_sell(d, plan, original_order=True) ** 2)

    def loss_r(d):
        return jnp.sum(jax.ops.segment_sum(d, seg, num_segments=N) ** 2)

    gk = jax.grad(loss_k)(data)
    gr = jax.grad(loss_r)(data)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_sell_skewed_and_empty_rows():
    rng = np.random.default_rng(2)
    N = 50
    deg = np.where(np.arange(N) % 13 == 0, 150, np.arange(N) % 4)  # some 0
    seg = np.repeat(np.arange(N), deg).astype(np.int32)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    data = rng.normal(size=(len(seg), 16)).astype(np.float32)
    plan = build_sell_plan(rowptr)
    assert plan.pad_overhead < 0.6
    out = segment_sum_sell(jnp.asarray(data), plan, original_order=True)
    ref = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(seg),
                              num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spmm_sell_matches_dense():
    rng = np.random.default_rng(3)
    N, F = 40, 16
    dense = (rng.uniform(size=(N, N)) < 0.2).astype(np.float32)
    dense *= rng.normal(size=(N, N)).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    rowptr, col, val = [0], [], []
    for i in range(N):
        nz = np.nonzero(dense[i])[0]
        col.extend(nz)
        val.extend(dense[i, nz])
        rowptr.append(len(col))
    plan = build_sell_plan(np.asarray(rowptr, np.int32))
    out = spmm_sell(jnp.asarray(np.array(col, np.int32)),
                    jnp.asarray(np.array(val, np.float32)),
                    jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), dense @ x,
                               rtol=1e-4, atol=1e-4)


def test_sell_jit_closure():
    data, seg, rowptr, N = _problem(seed=4)
    plan = build_sell_plan(rowptr)

    @jax.jit
    def f(d):
        return segment_sum_sell(d, plan, original_order=True)

    ref = jax.ops.segment_sum(data, seg, num_segments=N)
    np.testing.assert_allclose(np.asarray(f(data)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
