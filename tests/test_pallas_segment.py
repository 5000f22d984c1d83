"""CSR segment-sum Pallas kernel vs jax.ops.segment_sum (interpret mode on
CPU): forward, VJP, overflow accounting, and the SpMM wrapper."""
import jax
import jax.numpy as jnp
import numpy as np

from dig_tpu.ops.pallas_segment import (csr_block_overflow,
                                        segment_sum_sorted_csr, spmm_csr)


def _sorted_problem(seed=0, N=50, E=400, F=24):
    rng = np.random.default_rng(seed)
    seg = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    rowptr = np.zeros(N + 1, np.int32)
    np.add.at(rowptr[1:], seg, 1)
    rowptr = np.cumsum(rowptr).astype(np.int32)
    data = rng.normal(size=(E, F)).astype(np.float32)
    return jnp.asarray(data), jnp.asarray(seg), jnp.asarray(rowptr), N


def test_forward_matches_segment_sum():
    data, seg, rowptr, N = _sorted_problem()
    out = segment_sum_sorted_csr(data, seg, rowptr, N, 8, 256)
    ref = jax.ops.segment_sum(data, seg, num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vjp_matches_segment_sum():
    data, seg, rowptr, N = _sorted_problem(seed=1)

    def loss_k(d):
        return jnp.sum(segment_sum_sorted_csr(d, seg, rowptr, N, 8, 256) ** 2)

    def loss_r(d):
        return jnp.sum(jax.ops.segment_sum(d, seg, num_segments=N) ** 2)

    gk = jax.grad(loss_k)(data)
    gr = jax.grad(loss_r)(data)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_block_overflow_accounting():
    data, seg, rowptr, N = _sorted_problem(seed=2)
    assert int(csr_block_overflow(rowptr, N, 8, 256)) == 0
    # a cap of 4 edges per 8-row block must overflow for E=400, N=50
    ov = int(csr_block_overflow(rowptr, N, 8, 4))
    assert ov > 0
    total = int(rowptr[-1])
    kept = total - ov
    out = segment_sum_sorted_csr(jnp.ones_like(data), seg, rowptr, N, 8, 4)
    assert abs(float(out.sum()) - kept * data.shape[1]) < 1e-3


def test_spmm_matches_dense():
    rng = np.random.default_rng(3)
    N, F = 40, 16
    dense = (rng.uniform(size=(N, N)) < 0.15).astype(np.float32)
    dense *= rng.normal(size=(N, N)).astype(np.float32)
    x = rng.normal(size=(N, F)).astype(np.float32)
    # CSR of dense
    rowptr = [0]
    col, val = [], []
    for i in range(N):
        nz = np.nonzero(dense[i])[0]
        col.extend(nz)
        val.extend(dense[i, nz])
        rowptr.append(len(col))
    rp = jnp.asarray(np.array(rowptr, np.int32))
    # the 128-aligned window start consumes up to 127 slots of the cap:
    # size the cap with that slack and assert nothing overflows
    assert int(csr_block_overflow(rp, N, 8, 256)) == 0
    out = spmm_csr(rp,
                   jnp.asarray(np.array(col, np.int32)),
                   jnp.asarray(np.array(val, np.float32)),
                   jnp.asarray(x), N, block_rows=8, max_edges_per_block=256)
    np.testing.assert_allclose(np.asarray(out), dense @ x,
                               rtol=1e-4, atol=1e-4)


def test_jit_composes():
    data, seg, rowptr, N = _sorted_problem(seed=4)

    @jax.jit
    def f(d):
        return segment_sum_sorted_csr(d, seg, rowptr, N, 8, 256)

    out = f(data)
    ref = jax.ops.segment_sum(data, seg, num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_segment_sum_sorted_fallback_matches():
    from dig_tpu.ops.segment import segment_sum, segment_sum_sorted
    data, seg, rowptr, N = _sorted_problem(seed=5)
    mask = jnp.asarray(np.arange(data.shape[0]) < 350)  # trailing padding
    a = segment_sum_sorted(data, seg, N, mask=mask, max_edges_per_block=256)
    b = segment_sum(data, seg, N, mask=mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_spmm_bidir_csr_fwd_and_grad():
    """Bidirectional CSR SpMM (ops/segment.spmm_bidir_csr): forward and
    d_h parity vs the plain gather/segment formulation (interpret mode
    off-TPU; the lsgraph layers gate on _on_tpu but the op itself runs
    anywhere)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dig_tpu.ops.segment import spmm_bidir_csr

    rng = np.random.default_rng(0)
    N, F = 48, 8
    deg = rng.poisson(4, N)
    E = int(deg.sum())
    E_pad = E + 7
    recv = np.repeat(np.arange(N), deg)
    send = rng.integers(0, N, E)
    rowptr = np.zeros(N + 1, np.int32)
    rowptr[1:] = np.cumsum(deg)
    senders = np.zeros(E_pad, np.int32)
    senders[:E] = send
    recv_ids = np.full(E_pad, -1, np.int32)
    recv_ids[:E] = recv
    coef = np.zeros(E_pad, np.float32)
    coef[:E] = rng.normal(size=E).astype(np.float32)
    order = np.argsort(senders[:E], kind="stable")
    rev_perm = np.concatenate([order, np.arange(E, E_pad)]).astype(np.int32)
    sss = np.full(E_pad, -1, np.int32)
    sss[:E] = senders[:E][order]
    rpr = np.zeros(N + 1, np.int32)
    rpr[1:] = np.cumsum(np.bincount(senders[:E], minlength=N))
    h = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    args = tuple(jnp.asarray(a) for a in
                 (coef, senders, recv_ids, rowptr, rev_perm, sss, rpr))

    def fused(h):
        return spmm_bidir_csr(h, *args, N, 256)

    def oracle(h):
        msg = h[args[1]] * args[0][:, None]
        msg = jnp.where((args[2] >= 0)[:, None], msg, 0)
        seg = jnp.where(args[2] >= 0, args[2], 0)
        return jax.ops.segment_sum(msg, seg, num_segments=N)

    np.testing.assert_allclose(np.asarray(fused(h)),
                               np.asarray(oracle(h)), atol=1e-5)
    ct = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    g_f = jax.vjp(fused, h)[1](ct)[0]
    g_o = jax.vjp(oracle, h)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o), atol=1e-4)


def test_chunked_forward_matches_segment_sum():
    from dig_tpu.ops.pallas_segment import (choose_chunk_plan, plan_chunks,
                                            segment_sum_sorted_csr_chunked)
    data, seg, rowptr, N = _sorted_problem(seed=4, N=70, E=900, F=24)
    for BN, EB in ((8, 128), (16, 256), (32, 128)):
        meta = jnp.asarray(plan_chunks(np.asarray(rowptr), N, BN, EB))
        out = segment_sum_sorted_csr_chunked(data, seg, meta, N, BN, EB)
        ref = jax.ops.segment_sum(data, seg, num_segments=N)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_chunked_vjp_matches_segment_sum():
    from dig_tpu.ops.pallas_segment import (plan_chunks,
                                            segment_sum_sorted_csr_chunked)
    data, seg, rowptr, N = _sorted_problem(seed=5, N=40, E=500, F=16)
    meta = jnp.asarray(plan_chunks(np.asarray(rowptr), N, 8, 128))

    def loss_k(d):
        return jnp.sum(
            segment_sum_sorted_csr_chunked(d, seg, meta, N, 8, 128) ** 2)

    def loss_r(d):
        return jnp.sum(jax.ops.segment_sum(d, seg, num_segments=N) ** 2)

    gk = jax.grad(loss_k)(data)
    gr = jax.grad(loss_r)(data)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_chunked_skewed_degrees_and_planner():
    """Power-law-ish rows (a few huge, many tiny) — the case the chunked
    grid exists for; also exercises choose_chunk_plan determinism."""
    from dig_tpu.ops.pallas_segment import (choose_chunk_plan,
                                            segment_sum_sorted_csr_chunked)
    rng = np.random.default_rng(6)
    N = 60
    deg = np.where(np.arange(N) % 17 == 0, 200, 3)
    seg = np.repeat(np.arange(N), deg).astype(np.int32)
    E = len(seg)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    data = rng.normal(size=(E, 24)).astype(np.float32)
    BN, EB, meta, dma = choose_chunk_plan(rowptr, N, 24)
    BN2, EB2, meta2, _ = choose_chunk_plan(rowptr, N, 24)
    assert (BN, EB) == (BN2, EB2) and np.array_equal(meta, meta2)
    out = segment_sum_sorted_csr_chunked(
        jnp.asarray(data), jnp.asarray(seg), jnp.asarray(meta), N, BN, EB)
    ref = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(seg),
                              num_segments=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
