"""Profile the SphereNet energy+force train step on the real chip and
print an op-level time breakdown from the captured trace.

Usage: python scripts/profile_force.py [--energy-only]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(energy_only=False):
    from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
    from dig_tpu.models import SphereNet

    G, n_steps = 96, 10
    mols = synthetic_molecules(G * (n_steps + 1), seed=0, min_atoms=12,
                               max_atoms=29, box=6.0)
    rng = np.random.default_rng(0)
    for m in mols:
        m["force"] = rng.normal(size=m["pos"].shape).astype(np.float32)
    loader = MoleculeLoader(mols, G, slot_size=29, shuffle=True, seed=0)
    model = SphereNet(cutoff=5.0, num_layers=4, hidden_channels=128,
                      num_spherical=3, num_radial=6, nk_degree=16,
                      block_size=29, compute_dtype=jnp.bfloat16,
                      pallas_triplet=True, pallas_fuse_basis=True,
                      pallas_slot=True)
    opt = optax.adam(5e-4)
    it = iter(loader)
    batches = [next(it) for _ in range(n_steps)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])
    opt_state = opt.init(params)

    def train_step(carry, b):
        params, opt_state = carry

        def loss_fn(p):
            if energy_only:
                e = model.apply(p, b)[:, 0]
                return jnp.mean(jnp.abs(e - b.globals["y"][:, 0]))
            def esum(pos):
                g_ = b.replace(nodes={**b.nodes, "pos": pos})
                e = model.apply(p, g_)[:, 0]
                return jnp.sum(jnp.where(b.graph_mask, e, 0.0)), e

            (_, e), gpos = jax.value_and_grad(esum, has_aux=True)(
                b.nodes["pos"])
            num = jnp.sum(jnp.abs(e - b.globals["y"][:, 0]) * b.graph_mask)
            num += 100.0 * jnp.sum(jnp.abs(-gpos - b.nodes["force"])
                                   * b.node_mask[:, None])
            return num / jnp.maximum(jnp.sum(b.graph_mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def epoch(params, opt_state, stacked):
        (params, opt_state), losses = jax.lax.scan(
            train_step, (params, opt_state), stacked)
        return params, opt_state, losses

    return epoch, params, opt_state, stacked, n_steps


def main():
    energy_only = "--energy-only" in sys.argv
    t0 = time.perf_counter()
    epoch, params, opt_state, stacked, n_steps = build(energy_only)
    print(f"build: {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    params, opt_state, losses = epoch(params, opt_state, stacked)
    float(losses[-1])
    print(f"compile+first epoch: {time.perf_counter()-t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    params, opt_state, losses = epoch(params, opt_state, stacked)
    float(losses[-1])
    dt = time.perf_counter() - t0
    print(f"epoch: {dt*1e3:.1f} ms, step: {dt/n_steps*1e3:.2f} ms")

    # fresh dir per run: a stale trace from an earlier capture must never
    # be parsed as this one (ADVICE r4), and mtime — not lexicographic
    # sort — picks the newest file
    import tempfile
    tdir = tempfile.mkdtemp(prefix="force_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        params, opt_state, losses = epoch(params, opt_state, stacked)
        float(losses[-1])
    print(f"trace capture: {time.perf_counter()-t0:.1f} s", flush=True)

    # Parse the trace: sum durations per op name, restricted to 'XLA Ops'
    # tids — TPU exports nest 'XLA Modules'/'Steps' tracks over 'XLA Ops'
    # under the same pid, so summing every tid double-counts (ADVICE r4).
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found under", tdir)
        return
    with gzip.open(max(files, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device pids (TPU/device threads) and their 'XLA Ops' tids
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Axon" in n}
    op_tids = {(p, t) for (p, t), n in tid_names.items()
               if p in dev_pids and "XLA Ops" in n}
    if not op_tids:  # no thread metadata: fall back to every device tid
        op_tids = None
    tot = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and (
                op_tids is None or (e["pid"], e.get("tid")) in op_tids):
            name = e.get("name", "")
            dur = e.get("dur", 0)
            tot[name] = tot.get(name, 0.0) + dur
            total += dur
    print(f"\ndevice pids: { {p: pid_names[p] for p in dev_pids} }"
          f" (XLA Ops tids only: {op_tids is not None})")
    print(f"total device time: {total/1e3:.1f} ms")
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:9.2f} ms  {100*dur/max(total,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
