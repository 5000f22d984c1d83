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


def test_spmm_bidir_sell_matches_plain():
    """spmm_bidir_sell == plain masked segment-sum formulation, forward
    and d/dh (the adjoint rides the reverse SELL plan)."""
    from dig_tpu.ops.segment import segment_sum, spmm_bidir_sell
    rng = np.random.default_rng(5)
    N, F = 40, 16
    E = 300
    senders = rng.integers(0, N, E).astype(np.int32)
    receivers = np.sort(rng.integers(0, N, E)).astype(np.int32)
    E_pad = 352
    em = np.zeros(E_pad, bool)
    em[:E] = True
    s_p = np.zeros(E_pad, np.int32); s_p[:E] = senders
    r_p = np.zeros(E_pad, np.int32); r_p[:E] = receivers
    rowptr = np.zeros(N + 1, np.int64)
    np.add.at(rowptr[1:], receivers, 1)
    rowptr = np.cumsum(rowptr)
    order = np.argsort(s_p[:E], kind="stable")
    rev_perm = np.concatenate([order, np.arange(E, E_pad)]).astype(np.int32)
    rowptr_rev = np.zeros(N + 1, np.int64)
    np.add.at(rowptr_rev[1:], senders, 1)
    rowptr_rev = np.cumsum(rowptr_rev)
    from dig_tpu.ops.sell import build_sell_plan
    plan_fwd = build_sell_plan(rowptr)
    plan_rev = build_sell_plan(rowptr_rev)
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    coef = jnp.asarray(np.where(em, rng.uniform(0.1, 1, E_pad), 0.0)
                       .astype(np.float32))
    recv_ids = jnp.asarray(np.where(em, r_p, -1).astype(np.int32))

    def f_sell(h):
        return spmm_bidir_sell(h, coef, jnp.asarray(s_p), recv_ids,
                               plan_fwd, jnp.asarray(rev_perm), plan_rev)

    def f_ref(h):
        msg = h[jnp.asarray(s_p)] * coef[:, None]
        return segment_sum(msg, jnp.asarray(r_p), N,
                           mask=jnp.asarray(em))

    np.testing.assert_allclose(np.asarray(f_sell(h)), np.asarray(f_ref(h)),
                               rtol=1e-5, atol=1e-5)
    w = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g1 = jax.grad(lambda h: jnp.sum(f_sell(h) * w))(h)
    g2 = jax.grad(lambda h: jnp.sum(f_ref(h) * w))(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
