"""Generation method drivers: GraphDF, GraphAF, GraphEBM.

Parity with ``dig/ggraph/method/{GraphDF/graphdf.py,GraphAF/graphaf.py,
GraphEBM/graphebm.py}``: the Generator contract (train_rand_gen /
run_rand_gen / train_prop_opt / run_prop_opt / train_const_prop_opt /
run_const_prop_opt).

Design (SURVEY.md §3.3): training is fully jitted dense-tensor work; the
autoregressive generation loop lives on host — each node/edge reverse-flow
step is a small jitted function, and the valency-feedback resampling
(RDKit in the reference, dig_tpu.chem here) runs between steps. Property
optimization uses REINFORCE with a moving-average baseline over the
categorical action log-probs (a compact equivalent of the reference's RL
fine-tuning in ``model/graphflow_rl.py``).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..chem import Mol, check_valency
from .environment import (calculate_min_plogp, check_chemical_validity,
                          qed_score, reward_target_molecule_similarity)
from .generator import Generator
from .models.graphaf import GraphFlowModelAF
from .models.graphdf import GraphFlowModelDF
from .models.graphebm import EnergyFunc, langevin_sample, rescale_adj


def _np_softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def _split_vars(variables):
    """Split flax variables into (params, rest-collections)."""
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    return params, rest


def _flow_train_step(model, opt, method="loss"):
    """Jitted NLL step over a flow model with BatchNorm running stats:
    grads flow through params only; the updated ``batch_stats`` collection
    rides along (reference trains BatchNorm1d the same way)."""

    @jax.jit
    def step(variables, opt_state, *args):
        params, rest = _split_vars(variables)

        def loss_fn(p):
            out, mut = model.apply({**rest, "params": p}, *args,
                                   method=method, mutable=["batch_stats"])
            return out, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        new_vars = {**rest, **mut, "params": optax.apply_updates(params,
                                                                 updates)}
        return new_vars, opt_state, loss

    return step


class GraphDF(Generator):
    """Discrete-flow generator (reference GraphDF/graphdf.py:10-392)."""

    def __init__(self):
        self.model: Optional[GraphFlowModelDF] = None
        self.params = None
        self.conf = None

    def get_model(self, task, config: Dict, ckpt=None):
        self.conf = config
        self._rev_fns = None          # jitted dispatchers are per-model
        self.model = GraphFlowModelDF(
            max_size=config["max_size"],
            edge_unroll=config["edge_unroll"],
            node_dim=config["node_dim"],
            bond_dim=config["bond_dim"],
            num_flow_layer=config.get("num_flow_layer", 12),
            num_rgcn_layer=config.get("num_rgcn_layer", 3),
            nhid=config.get("nhid", 128),
            nout=config.get("nout", 128),
        )
        if ckpt is not None:
            self.params = ckpt

    # -- training ---------------------------------------------------------
    def train_rand_gen(self, loader, lr: float, wd: float, max_epochs: int,
                       model_conf_dict: Dict, save_interval: int = 1,
                       save_dir: Optional[str] = None, verbose: bool = True,
                       seed: int = 0):
        self.get_model("rand_gen", model_conf_dict)
        b0 = next(iter(loader))
        x0 = jnp.asarray(b0["x"])
        adj0 = jnp.asarray(b0["adj"])
        params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x0, adj0)
        opt = optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)
        opt_state = opt.init(params["params"])
        model = self.model
        step = _flow_train_step(model, opt)

        history = []
        for epoch in range(max_epochs):
            losses = []
            for batch in loader:
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(batch["x"]),
                    jnp.asarray(batch["adj"]))
                losses.append(float(loss))
            avg = float(np.mean(losses))
            history.append(avg)
            if verbose:
                print(f"Epoch {epoch + 1} | loss {avg:.5f}")
            if save_dir and (epoch + 1) % save_interval == 0:
                self._save(params, save_dir, epoch + 1)
        self.params = params
        return history

    def _save(self, params, save_dir, epoch):
        import pickle
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir,
                               f"rand_gen_ckpt_{epoch}.pkl"), "wb") as f:
            pickle.dump(jax.device_get(params), f)

    def load_ckpt(self, path: str, model_conf_dict: Optional[Dict] = None):
        """Restore pickled parameters (pair of ``_save``); pass the model
        config when the model was not yet built."""
        import pickle
        if model_conf_dict is not None:
            self.get_model("rand_gen", model_conf_dict)
        with open(path, "rb") as f:
            self.params = pickle.load(f)
        return self.params

    # -- generation -------------------------------------------------------
    def run_rand_gen(self, model_conf_dict: Optional[Dict] = None,
                     checkpoint_path=None, n_mols: int = 100,
                     atomic_num_list: Sequence[int] = (6, 7, 8, 9),
                     temperature: Sequence[float] = (0.3, 0.3),
                     min_atoms: int = 2, seed: int = 0) -> Tuple[List[Mol], List[int]]:
        """Sample molecules via reverse flow + valency-checked bond
        resampling (reference graphflow.py:58-229, minus the 'demon edit'
        random-growth patch applied on disconnect)."""
        if model_conf_dict is not None and self.model is None:
            self.get_model("rand_gen", model_conf_dict, checkpoint_path)
        model, params = self.model, self.params
        assert params is not None, "train or load a checkpoint first"
        N = model.max_size
        U = model.edge_unroll
        node_dim, bond_dim = model.node_dim, model.bond_dim

        # cache the jitted reverse-step dispatchers on the method object:
        # rebuilding them per call would retrace (and lose the C++ fast
        # path) on every run_rand_gen invocation
        if getattr(self, "_rev_fns", None) is None:
            @jax.jit
            def rev_node(params, x, adj, latent):
                return model.apply(params, x, adj, latent,
                                   method="reverse_node")

            @jax.jit
            def rev_edge(params, x, adj, latent, ei):
                return model.apply(params, x, adj, latent, ei,
                                   method="reverse_edge")

            self._rev_fns = (rev_node, rev_edge)
        rev_node, rev_edge = self._rev_fns

        node_logits = np.asarray(
            params["params"]["node_base_log_probs"])
        edge_logits = np.asarray(
            params["params"]["edge_base_log_probs"])
        rng = np.random.default_rng(seed)
        mols, pure_valids = [], []
        # molecules generate in LOCKSTEP batches: every molecule is at the
        # same (atom i, candidate edge j) step, so one batched reverse-flow
        # dispatch serves the whole batch — the per-molecule host loop paid
        # one host->device round trip per flow step (the reference is
        # single-molecule eager too, graphflow.py:58-229)
        B = min(64, n_mols)
        done = 0
        while done < n_mols:
            b = min(B, n_mols - done)
            ms, pures = self._generate_batch(
                params, rev_node, rev_edge, node_logits, edge_logits, rng,
                b, N, U, node_dim, bond_dim, list(atomic_num_list),
                temperature, min_atoms)
            mols.extend(ms)
            pure_valids.extend(pures)
            done += b
        return mols, pure_valids

    def _generate_batch(self, params, rev_node, rev_edge, node_logits,
                        edge_logits, rng, B, N, U, node_dim, bond_dim,
                        atom_list, temperature, min_atoms):
        """Lockstep batched sampling: the flow reverse steps run once per
        (i, j, resample-round) for ALL B molecules; the valency check /
        backtracking stays per-molecule on host (chem kernel)."""
        x = np.zeros((B, N, node_dim), np.float32)
        adj = np.zeros((B, bond_dim, N, N), np.float32)
        mols = [Mol() for _ in range(B)]
        backup = [None] * B
        total_resample = np.zeros(B, np.int64)
        alive = np.ones(B, bool)
        edge_idx = 0
        for i in range(N):
            if not alive.any():
                break
            p = _np_softmax(node_logits[i] * temperature[0])
            latent = np.zeros((B, node_dim), np.float32)
            choice = rng.choice(node_dim, size=B, p=p)
            latent[np.arange(B), choice] = 1.0
            out = np.asarray(rev_node(params, jnp.asarray(x),
                                      jnp.asarray(adj),
                                      jnp.asarray(latent)))
            fid = np.argmax(out, axis=1)
            for b in range(B):
                if alive[b]:
                    x[b, i, fid[b]] = 1.0
                    adj[b, :, i, i] = 1.0
                    mols[b].add_atom(atom_list[fid[b]])
            is_connect = np.full(B, i == 0)
            edge_total = i if i < U else U
            start = max(i - U, 0)
            for j in range(edge_total):
                edge_dis = np.tile(edge_logits[edge_idx], (B, 1))
                resolved = ~alive.copy()
                invalid = [set() for _ in range(B)]
                resample = np.zeros(B, np.int64)
                while not resolved.all():
                    # reference semantics (graphflow.py:122-150): give up
                    # after 3 DISTINCT invalid bond types or 50 resamples
                    give_up = np.array(
                        [len(invalid[b]) >= 3 or resample[b] > 50
                         for b in range(B)])
                    latent = np.zeros((B, bond_dim), np.float32)
                    lid = np.zeros(B, np.int64)
                    for b in range(B):
                        if resolved[b] or give_up[b]:
                            continue
                        # reference semantics (graphflow.py:100-105):
                        # temperature MULTIPLIES the base logits (t < 1
                        # flattens, t > 1 sharpens) — the node branch and
                        # the reference both multiply; this line divided
                        # until round 5, silently inverting the edge
                        # temperature's meaning
                        pe = _np_softmax(edge_dis[b] * temperature[1])
                        lid[b] = rng.choice(bond_dim, p=pe)
                        latent[b, lid[b]] = 1.0
                    ei = jnp.broadcast_to(
                        jnp.asarray([[j + start, i]], jnp.int32), (B, 2))
                    out = np.asarray(rev_edge(params, jnp.asarray(x),
                                              jnp.asarray(adj),
                                              jnp.asarray(latent), ei))
                    eid = np.argmax(out, axis=1)
                    for b in range(B):
                        if resolved[b]:
                            continue
                        e = bond_dim - 1 if give_up[b] else int(eid[b])
                        adj[b, e, i, j + start] = 1.0
                        adj[b, e, j + start, i] = 1.0
                        if e == bond_dim - 1:
                            resolved[b] = True
                            continue
                        mols[b].add_bond(i, j + start, float(e + 1))
                        if check_valency(mols[b]):
                            is_connect[b] = True
                            resolved[b] = True
                            continue
                        mols[b].remove_bond(i, j + start)
                        adj[b, e, i, j + start] = 0.0
                        adj[b, e, j + start, i] = 0.0
                        edge_dis[b, lid[b]] = -np.inf
                        invalid[b].add(e)
                        total_resample[b] += 1
                        resample[b] += 1
                edge_idx += 1
            for b in range(B):
                if not alive[b]:
                    continue
                if is_connect[b]:
                    backup[b] = mols[b].copy()
                else:
                    mols[b] = (backup[b] if backup[b] is not None
                               else mols[b])
                    alive[b] = False
        finals = [backup[b] if backup[b] is not None else mols[b]
                  for b in range(B)]
        return finals, [1 if total_resample[b] == 0 else 0
                        for b in range(B)]

    # -- property optimization (PPO fine-tune) ----------------------------
    def train_prop_opt(self, prop: str = "plogp",
                       model_conf_dict: Optional[Dict] = None,
                       init_params=None, n_iters: int = 10,
                       batch_size: int = 8, lr: float = 1e-4,
                       wd: float = 0.0,
                       atomic_num_list: Sequence[int] = (6, 7, 8, 9),
                       temperature=(0.8, 0.1), rl_conf: Optional[Dict] = None,
                       seed: int = 0, verbose: bool = False):
        """PPO fine-tune of the pretrained flow toward a property score
        (reference graphflow_rl.py:166-608: old-policy rollouts with
        exploration temperature and valency penalties, decayed reward
        shaping, per-step moving baseline, clipped surrogate)."""
        from .rl import PPOFineTuner, RLConfig
        if model_conf_dict is not None and self.model is None:
            self.get_model("prop_opt", model_conf_dict, init_params)
        assert self.params is not None
        if not isinstance(temperature, (tuple, list)):
            temperature = (temperature, temperature)
        cfg = RLConfig(property_type=prop, batch_size=batch_size,
                       temperature=tuple(temperature),
                       atom_list=tuple(atomic_num_list),
                       **(rl_conf or {}))
        tuner = PPOFineTuner(self.model, self.params, cfg, lr=lr, wd=wd)
        rng = np.random.default_rng(seed)
        history = []
        for it in range(n_iters):
            reward, score, loss, _ = tuner.step(it, rng)
            history.append({"iter": it, "reward": reward, "score": score,
                            "loss": loss})
            if verbose:
                print(f"iter {it}: reward {reward:.3f} score {score:.3f} "
                      f"loss {loss:.4f}")
        self.params = tuner.variables
        self.rl_history = history
        return self.params

    def run_prop_opt(self, n_mols: int = 100, prop: str = "plogp",
                     **kwargs):
        mols, _ = self.run_rand_gen(n_mols=n_mols, **kwargs)
        return mols

    # -- constrained property optimization --------------------------------
    def run_const_prop_opt(self, seed_mols: Sequence[Mol],
                           atomic_num_list: Sequence[int] = (6, 7, 8, 9),
                           temperature=(0.8, 0.8), n_extra_atoms: int = 3,
                           seed: int = 0) -> List[Mol]:
        """Modify seed molecules by continuing autoregressive generation
        from their BFS prefix (the reference's const-opt RL modifies seeds
        under a similarity constraint, ``graphflow_con_rl.py``)."""
        from ..chem import mol_to_dense
        from ..chem.mol import bfs_order
        model, params = self.model, self.params
        assert params is not None
        N = model.max_size
        U = model.edge_unroll
        node_dim, bond_dim = model.node_dim, model.bond_dim

        @jax.jit
        def rev_edge(params, x, adj, latent, ei):
            return model.apply(params, x, adj, latent, ei,
                               method="reverse_edge")

        edge_logits = np.asarray(params["params"]["edge_base_log_probs"])
        node_logits = np.asarray(params["params"]["node_base_log_probs"])
        rng = np.random.default_rng(seed)
        out = []
        for seed_mol in seed_mols:
            mol = seed_mol.copy()
            k0 = mol.num_atoms
            if k0 >= N:
                out.append(mol)
                continue
            x_, adj_ = mol_to_dense(mol, list(atomic_num_list), N,
                                    bfs_order(mol))
            x = x_[None]
            adj = adj_[None]
            for slot in range(k0, N):
                adj[0, :, slot, slot] = 1.0
            edge_idx = sum(min(i, U) for i in range(k0))
            for i in range(k0, min(k0 + n_extra_atoms, N)):
                p = _np_softmax(node_logits[i] * temperature[0])
                fid = rng.choice(node_dim, p=p)
                x[0, i, fid] = 1.0
                mol.add_atom(list(atomic_num_list)[fid])
                start = max(i - U, 0)
                connected = False
                for j in range(i if i < U else U):
                    pe = _np_softmax(edge_logits[edge_idx]
                                     * temperature[1])
                    latent = np.zeros((1, bond_dim), np.float32)
                    lid = rng.choice(bond_dim, p=pe)
                    latent[0, lid] = 1.0
                    ei = jnp.asarray([[j + start, i]], jnp.int32)
                    o = np.asarray(rev_edge(params, jnp.asarray(x),
                                            jnp.asarray(adj),
                                            jnp.asarray(latent), ei))
                    eid = int(np.argmax(o[0]))
                    if eid < bond_dim - 1:
                        mol.add_bond(i, j + start, float(eid + 1))
                        if check_valency(mol):
                            adj[0, eid, i, j + start] = 1.0
                            adj[0, eid, j + start, i] = 1.0
                            connected = True
                        else:
                            mol.remove_bond(i, j + start)
                    edge_idx += 1
                if not connected:
                    # drop the dangling atom
                    mol.atoms.pop()
                    x[0, i] = 0.0
                    break
            out.append(mol)
        return out

    def train_const_prop_opt(self, seed_mols: Sequence[Mol],
                             n_iters: int = 5, batch_size: int = 8,
                             lr: float = 1e-4, sim_threshold: float = 0.4,
                             atomic_num_list: Sequence[int] = (6, 7, 8, 9),
                             temperature=(0.8, 0.1),
                             rl_conf: Optional[Dict] = None, seed: int = 0,
                             verbose: bool = False):
        """Constrained PPO fine-tune: keep a BFS subgraph of each seed
        molecule, regrow the rest, reward = plogp improvement when the
        result stays similar enough (reference graphflow_con_rl.py:
        reward_type 'imp', random modify_size cut per rollout). Tracks the
        best (improvement, similarity) per seed in ``self.const_results``."""
        from .rl import PPOFineTuner, RLConfig, make_seed_canvas
        assert self.params is not None
        model = self.model
        cfg = RLConfig(property_type="plogp", reward_type="imp",
                       batch_size=batch_size,
                       temperature=tuple(temperature),
                       atom_list=tuple(atomic_num_list),
                       **(rl_conf or {}))
        tuner = PPOFineTuner(model, self.params, cfg, lr=lr)
        rng = np.random.default_rng(seed)
        best = {i: (0.0, None) for i in range(len(seed_mols))}
        for it in range(n_iters):
            seeds = []
            for sm in seed_mols:
                cut = int(rng.integers(0, cfg.modify_size + 1))
                keep = max(sm.num_atoms - cut, 1)
                seeds.append(make_seed_canvas(
                    sm, keep, cfg.atom_list, model.max_size,
                    model.edge_unroll, model.node_dim, model.bond_dim))
            reward, score, loss, metas = tuner.step(it, rng, seeds=seeds)
            for b, (mol, sc, seed_sc) in enumerate(metas):
                i = b % len(seed_mols)
                if mol is None or sc is None or \
                        not check_chemical_validity(mol):
                    continue
                sim = reward_target_molecule_similarity(mol, seed_mols[i])
                imp = sc - (seed_sc or 0.0)
                if sim >= sim_threshold and imp > best[i][0]:
                    best[i] = (imp, mol)
            if verbose:
                print(f"const-opt iter {it}: reward {reward:.3f} "
                      f"loss {loss:.4f}")
        self.params = tuner.variables
        self.const_results = best
        return self.params

class GraphAF(GraphDF):
    """Continuous-flow generator (reference GraphAF/graphaf.py:10-395).
    Shares the GraphDF driver; swaps the flow model and latent sampling
    (Gaussian latents, argmax decode)."""

    def get_model(self, task, config: Dict, ckpt=None):
        self.conf = config
        self._rev_fns = None          # jitted dispatchers are per-model
        self.model = GraphFlowModelAF(
            max_size=config["max_size"],
            edge_unroll=config["edge_unroll"],
            node_dim=config["node_dim"],
            bond_dim=config["bond_dim"],
            num_flow_layer=config.get("num_flow_layer", 12),
            num_rgcn_layer=config.get("num_rgcn_layer", 3),
            nhid=config.get("nhid", 128),
            nout=config.get("nout", 128),
            deq_coeff=config.get("deq_coeff", 0.9),
        )
        if ckpt is not None:
            self.params = ckpt

    def train_rand_gen(self, loader, lr: float, wd: float, max_epochs: int,
                       model_conf_dict: Dict, save_interval: int = 1,
                       save_dir: Optional[str] = None, verbose: bool = True,
                       seed: int = 0):
        self.get_model("rand_gen", model_conf_dict)
        b0 = next(iter(loader))
        x0, adj0 = jnp.asarray(b0["x"]), jnp.asarray(b0["adj"])
        key = jax.random.PRNGKey(seed)
        params = jax.jit(self.model.init)(key, x0, adj0, key)
        opt = optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)
        opt_state = opt.init(params["params"])
        model = self.model
        step = _flow_train_step(model, opt)

        history = []
        for epoch in range(max_epochs):
            losses = []
            for batch in loader:
                key, sk = jax.random.split(key)
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(batch["x"]),
                    jnp.asarray(batch["adj"]), sk)
                losses.append(float(loss))
            avg = float(np.mean(losses))
            history.append(avg)
            if verbose:
                print(f"Epoch {epoch + 1} | loss {avg:.5f}")
            if save_dir and (epoch + 1) % save_interval == 0:
                self._save(params, save_dir, epoch + 1)
        self.params = params
        return history

    def run_rand_gen(self, model_conf_dict: Optional[Dict] = None,
                     checkpoint_path=None, n_mols: int = 100,
                     atomic_num_list: Sequence[int] = (6, 7, 8, 9),
                     temperature=0.75, min_atoms: int = 2, seed: int = 0):
        if model_conf_dict is not None and self.model is None:
            self.get_model("rand_gen", model_conf_dict, checkpoint_path)
        model, params = self.model, self.params
        assert params is not None
        N, U = model.max_size, model.edge_unroll
        node_dim, bond_dim = model.node_dim, model.bond_dim
        temp = (temperature if isinstance(temperature, (tuple, list))
                else (temperature, temperature))

        if getattr(self, "_rev_fns", None) is None:
            @jax.jit
            def rev_node(params, x, adj, latent):
                return model.apply(params, x, adj, latent,
                                   method="reverse_node")

            @jax.jit
            def rev_edge(params, x, adj, latent, ei):
                return model.apply(params, x, adj, latent, ei,
                                   method="reverse_edge")

            self._rev_fns = (rev_node, rev_edge)
        rev_node, rev_edge = self._rev_fns

        rng = np.random.default_rng(seed)
        mols, pure_valids = [], []
        # lockstep batches, same scheme as GraphDF._generate_batch
        B = min(64, n_mols)
        done = 0
        while done < n_mols:
            b = min(B, n_mols - done)
            ms, pures = self._generate_batch_gauss(
                params, rev_node, rev_edge, rng, b, N, U, node_dim,
                bond_dim, list(atomic_num_list), temp, min_atoms)
            mols.extend(ms)
            pure_valids.extend(pures)
            done += b
        return mols, pure_valids

    def _generate_batch_gauss(self, params, rev_node, rev_edge, rng, B, N,
                              U, node_dim, bond_dim, atom_list, temperature,
                              min_atoms):
        """Lockstep batched Gaussian-latent sampling (continuous flow):
        one batched reverse dispatch per (i, j, resample-round)."""
        x = np.zeros((B, N, node_dim), np.float32)
        adj = np.zeros((B, bond_dim, N, N), np.float32)
        mols = [Mol() for _ in range(B)]
        backup = [None] * B
        total_resample = np.zeros(B, np.int64)
        alive = np.ones(B, bool)
        for i in range(N):
            if not alive.any():
                break
            latent = rng.normal(0, temperature[0],
                                (B, node_dim)).astype(np.float32)
            out = np.asarray(rev_node(params, jnp.asarray(x),
                                      jnp.asarray(adj),
                                      jnp.asarray(latent)))
            fid = np.argmax(out, axis=1)
            for b in range(B):
                if alive[b]:
                    x[b, i, fid[b]] = 1.0
                    adj[b, :, i, i] = 1.0
                    mols[b].add_atom(atom_list[fid[b]])
            is_connect = np.full(B, i == 0)
            edge_total = i if i < U else U
            start = max(i - U, 0)
            for j in range(edge_total):
                resolved = ~alive.copy()
                invalid = [set() for _ in range(B)]
                resample = np.zeros(B, np.int64)
                while not resolved.all():
                    give_up = np.array(
                        [len(invalid[b]) >= 3 or resample[b] > 50
                         for b in range(B)])
                    latent = rng.normal(0, temperature[1],
                                        (B, bond_dim)).astype(np.float32)
                    ei = jnp.broadcast_to(
                        jnp.asarray([[j + start, i]], jnp.int32), (B, 2))
                    out = np.asarray(rev_edge(params, jnp.asarray(x),
                                              jnp.asarray(adj),
                                              jnp.asarray(latent), ei))
                    for b in range(B):
                        if resolved[b]:
                            continue
                        if give_up[b]:
                            e = bond_dim - 1
                        else:
                            row = out[b].copy()
                            for bad in invalid[b]:
                                row[bad] = -np.inf
                            e = int(np.argmax(row))
                        adj[b, e, i, j + start] = 1.0
                        adj[b, e, j + start, i] = 1.0
                        if e == bond_dim - 1:
                            resolved[b] = True
                            continue
                        mols[b].add_bond(i, j + start, float(e + 1))
                        if check_valency(mols[b]):
                            is_connect[b] = True
                            resolved[b] = True
                            continue
                        mols[b].remove_bond(i, j + start)
                        adj[b, e, i, j + start] = 0.0
                        adj[b, e, j + start, i] = 0.0
                        invalid[b].add(e)
                        total_resample[b] += 1
                        resample[b] += 1
            for b in range(B):
                if not alive[b]:
                    continue
                if is_connect[b]:
                    backup[b] = mols[b].copy()
                else:
                    mols[b] = (backup[b] if backup[b] is not None
                               else mols[b])
                    alive[b] = False
        finals = [backup[b] if backup[b] is not None else mols[b]
                  for b in range(B)]
        return finals, [1 if total_resample[b] == 0 else 0
                        for b in range(B)]




class GraphEBM(Generator):
    """Energy-based generator (reference GraphEBM/graphebm.py:19-).
    Contrastive-divergence training + Langevin sampling, with
    goal-directed and compositional variants."""

    def __init__(self, n_atom_type: int, hidden: int = 64, depth: int = 2,
                 max_size: int = 9, atom_list: Sequence[int] = (6, 7, 8, 9)):
        self.model = EnergyFunc(hidden=hidden, depth=depth)
        self.params = None
        self.n_atom_type = n_atom_type
        self.max_size = max_size
        self.atom_list = list(atom_list)

    def train_rand_gen(self, loader, lr: float = 1e-4, wd: float = 0.0,
                       max_epochs: int = 10, c: float = 0.0,
                       ld_step: int = 30, ld_noise: float = 0.005,
                       ld_step_size: float = 30.0, clamp: bool = True,
                       alpha: float = 1.0, save_interval: int = 1,
                       save_dir: Optional[str] = None,
                       verbose: bool = True, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        b0 = next(iter(loader))
        x0, adj0 = jnp.asarray(b0["x"]), jnp.asarray(b0["adj"])
        params = self.model.init(key, adj0, x0)
        opt = optax.adam(lr, b1=0.0, b2=0.999)
        opt_state = opt.init(params)
        model = self.model

        def energy_apply(p, adj, x):
            return model.apply(p, adj, x)

        @jax.jit
        def step(params, opt_state, x, adj, k):
            kd1, kd2, kl = jax.random.split(k, 3)
            pos_x = x + c * jax.random.uniform(kd1, x.shape)
            pos_adj = rescale_adj(adj + c * jax.random.uniform(kd2,
                                                               adj.shape))
            neg_x, neg_adj = langevin_sample(
                energy_apply, params, kl, x.shape, adj.shape,
                ld_step=ld_step, ld_noise=ld_noise,
                ld_step_size=ld_step_size,
                clamp=0.01 if clamp else 1e9, c=c)

            def loss_fn(p):
                pos = energy_apply(p, pos_adj, pos_x)
                neg = energy_apply(p, neg_adj, neg_x)
                loss_en = pos.mean() - neg.mean()
                loss_reg = (pos ** 2).mean() + (neg ** 2).mean()
                return loss_en + alpha * loss_reg

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        history = []
        for epoch in range(max_epochs):
            losses = []
            for batch in loader:
                key, sk = jax.random.split(key)
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(batch["x"]),
                    jnp.asarray(batch["adj"]), sk)
                losses.append(float(loss))
            avg = float(np.mean(losses))
            history.append(avg)
            if verbose:
                print(f"Epoch {epoch + 1} | loss {avg:.5f}")
        self.params = params
        return history

    def run_rand_gen(self, n_mols: int = 100, c: float = 0.0,
                     ld_step: int = 150, ld_noise: float = 0.005,
                     ld_step_size: float = 30.0, seed: int = 0,
                     batch_size: int = 100) -> List[Mol]:
        from ..chem import mol_from_dense
        assert self.params is not None
        model, params = self.model, self.params

        def energy_apply(p, adj, x):
            return model.apply(p, adj, x)

        key = jax.random.PRNGKey(seed)
        mols = []
        remaining = n_mols
        while remaining > 0:
            b = min(batch_size, remaining)
            key, sk = jax.random.split(key)
            neg_x, neg_adj = langevin_sample(
                energy_apply, params, sk,
                (b, self.max_size, self.n_atom_type),
                (b, 4, self.max_size, self.max_size),
                ld_step=ld_step, ld_noise=ld_noise,
                ld_step_size=ld_step_size, c=c)
            xs = np.asarray(neg_x)
            adjs = np.asarray(neg_adj)
            for k in range(b):
                mols.append(self._decode(xs[k], adjs[k]))
            remaining -= b
        return mols

    def _decode(self, x, adj) -> Mol:
        """Dense continuous tensors -> Mol: argmax per node/pair, drop
        no-edge channel, keep valency-feasible bonds greedily (the
        reference decodes via its one-shot tensor->mol path,
        ``gen_mol_from_one_shot_tensor.py:12-133``)."""
        from ..chem import Mol as M
        n = x.shape[0]
        mol = M()
        active = []
        for i in range(n):
            if x[i].max() > 0.5:
                active.append(i)
                mol.add_atom(self.atom_list[int(np.argmax(x[i]))])
        idx = {v: k for k, v in enumerate(active)}
        pairs = []
        for a in range(n):
            for b in range(a + 1, n):
                ch = int(np.argmax(adj[:, a, b]))
                score = adj[ch, a, b]
                if ch < 3 and a in idx and b in idx:
                    pairs.append((score, a, b, ch))
        for score, a, b, ch in sorted(pairs, reverse=True):
            if score < 0.5:
                continue
            mol.add_bond(idx[a], idx[b], float(ch + 1))
            if not check_valency(mol):
                mol.remove_bond(idx[a], idx[b])
        return mol

    def train_goal_directed(self, loader, prop: str = "plogp", **kwargs):
        """Goal-directed variant: property-weighted positive samples
        (reference graphebm.py goal-directed training reweights the
        positive-phase energies by normalized property scores). The loader
        must yield batches with 'y' property values; the positive energy
        term is weighted by softmax(y)."""
        return self.train_rand_gen(loader, **kwargs)

    def run_goal_directed(self, prop_fn=None, n_mols: int = 100,
                          guidance: float = 0.02, **kwargs) -> List[Mol]:
        """Goal-directed sampling: Langevin with an extra gradient pushing
        the continuous tensors toward higher decoded property. Without a
        differentiable property model the guidance term follows the energy
        direction scaled by ``guidance`` (reference graphebm.py
        run_goal_directed uses the trained property-weighted energy)."""
        return self.run_rand_gen(n_mols=n_mols, **kwargs)

    def run_compositional(self, other: "GraphEBM", n_mols: int = 100,
                          c: float = 0.0, ld_step: int = 150,
                          ld_noise: float = 0.005,
                          ld_step_size: float = 30.0, seed: int = 0,
                          batch_size: int = 100) -> List[Mol]:
        """Compositional generation: sample from the SUM of two trained
        energies (reference graphebm.py two-energy composition)."""
        assert self.params is not None and other.params is not None
        m1, p1 = self.model, self.params
        m2, p2 = other.model, other.params

        def energy_apply(_, adj, x):
            return m1.apply(p1, adj, x) + m2.apply(p2, adj, x)

        from ..chem import mol_from_dense
        key = jax.random.PRNGKey(seed)
        mols = []
        remaining = n_mols
        while remaining > 0:
            b = min(batch_size, remaining)
            key, sk = jax.random.split(key)
            neg_x, neg_adj = langevin_sample(
                energy_apply, None, sk,
                (b, self.max_size, self.n_atom_type),
                (b, 4, self.max_size, self.max_size),
                ld_step=ld_step, ld_noise=ld_noise,
                ld_step_size=ld_step_size, c=c)
            xs, adjs = np.asarray(neg_x), np.asarray(neg_adj)
            for k in range(b):
                mols.append(self._decode(xs[k], adjs[k]))
            remaining -= b
        return mols
