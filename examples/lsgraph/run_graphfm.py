"""Scalable GNN with historical embeddings + momentum (reference
examples/lsgraph/GraphFMOB/GraphFMOB.py)."""
import jax, jax.numpy as jnp, numpy as np, optax

from dig_tpu.lsgraph import (EvalSubgraphLoader, ScalableGCN, SubgraphLoader,
                             metis_permute, synthetic_large_graph)

data = synthetic_large_graph(2000, seed=0)
s, r, x, y = data["senders"], data["receivers"], data["x"], data["y"]
N = len(y)
perm, ptr, _ = metis_permute(s, r, N, 16)
loader = SubgraphLoader(s, r, N, ptr, perm, batch_parts=4, shuffle=True)
x_new, y_new = x[perm], y[perm]
model = ScalableGCN(N, x.shape[1], 64, 4, 2, use_momentum=True)
sub0 = next(iter(loader))
params = model.init(jax.random.PRNGKey(0), x_new, sub0)
opt = optax.adam(1e-2); opt_state = opt.init(params)
xg, yg = jnp.asarray(x_new), jnp.asarray(y_new)
tg = jnp.asarray(data["train_mask"][perm])
hist = model.histories

@jax.jit
def step(params, opt_state, hist, sub):
    def loss_fn(p):
        out, nh = model.forward(p, hist, xg, sub)
        n_id = jnp.asarray(sub.n_id)
        mask = jnp.asarray(sub.in_batch_mask) & tg[n_id]
        ls = optax.softmax_cross_entropy_with_integer_labels(out, yg[n_id])
        return jnp.sum(jnp.where(mask, ls, 0.0)) / jnp.maximum(jnp.sum(mask), 1), nh
    (loss, nh), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, up), opt_state, nh, loss

for ep in range(20):
    for sub in loader:
        params, opt_state, hist, loss = step(params, opt_state, hist, sub)
    if ep % 5 == 0:
        print(f"epoch {ep} loss {float(loss):.4f}")

out = model.mini_inference(params, xg, EvalSubgraphLoader(s, r, N, ptr, perm))
pred = np.argmax(np.asarray(out), -1)
test = data["test_mask"][perm]
print("test acc:", float((pred[test] == y_new[test]).mean()))

# ---------------------------------------------------------------------------
# GraphFM-IB: in-batch feature momentum over neighbor-sampled minibatches
# (reference examples/lsgraph/GraphFMIB/reddit_example.py)
# ---------------------------------------------------------------------------
from dig_tpu.lsgraph import GraphFMIB, NeighborSampledLoader

ib_loader = NeighborSampledLoader(s, r, N, data["train_mask"],
                                  sizes=[3, 3], batch_size=64, seed=0)
ib = GraphFMIB(N, x.shape[1], 64, 4, num_layers=2, alpha=0.1).bind(ib_loader)
b0 = next(iter(ib_loader))
ib_params = ib.init(jax.random.PRNGKey(1), x, b0)
ib_opt = optax.adam(1e-2)
ib_os = ib_opt.init(ib_params)
ib_h = ib.histories
xj, yj = jnp.asarray(x), jnp.asarray(data["y"])
B = ib_loader.B

@jax.jit
def ib_step(params, opt_state, hists, b):
    def loss_fn(p):
        out, nh = ib.forward(p, hists, xj, b)
        tgt = yj[b.n_id[:B]]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            out, tgt)), nh
    (loss, nh), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, opt_state = ib_opt.update(grads, opt_state, params)
    return optax.apply_updates(params, up), opt_state, nh, loss

for ep in range(10):
    for b in ib_loader:
        ib_params, ib_os, ib_h, ib_loss = ib_step(ib_params, ib_os, ib_h,
                                                  ib._jb(b))
    if ep % 5 == 0:
        print(f"[IB] epoch {ep} loss {float(ib_loss):.4f}")

ib_out = ib.full_inference(ib_params, xj, jnp.asarray(s), jnp.asarray(r))
ib_pred = np.argmax(np.asarray(ib_out), -1)
print("[IB] test acc:",
      float((ib_pred[data["test_mask"]] == data["y"][data["test_mask"]]).mean()))
