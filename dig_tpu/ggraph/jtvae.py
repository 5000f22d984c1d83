"""JTVAE — junction-tree variational autoencoder for molecules.

Parity with ``dig/ggraph/method/JTVAE/`` (``jtvae.py:20-293``,
``fast_jtnn/{chemutils.py,jtnn_enc.py,jtnn_dec.py,mpn.py,jtnn_vae.py}``):

* tree decomposition — rings (approximate SSSR) + non-ring bonds as
  cliques, ring merging for bridged systems, spanning junction tree
  (``chemutils.py tree_decomp``);
* fragment vocabulary over canonical clique hashes;
* encoders — GRU message passing over the junction tree (jtnn_enc.py) and
  an atom-level MPN over the molecular graph (mpn.py), both as padded
  masked flax modules;
* VAE — mean/logvar heads on [tree ; graph] embeddings, KL-annealed ELBO;
* decoder — topological expand/backtrack prediction + fragment-label
  prediction, teacher-forced at training time (jtnn_dec.py);
* assembly — decoded fragment trees are stitched greedily at shared atoms
  under valency checks (a compact substitute for the reference's JTMPN
  candidate scorer; documented deviation).

All chemistry runs on the dig_tpu chem kernel (RDKit-free).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..chem import Mol, canonical_hash, check_valency, mol_from_smiles
from ..chem.descriptors import _ring_info
from .generator import Generator

xavier = jax.nn.initializers.glorot_uniform()


# ---------------------------------------------------------------------------
# tree decomposition (chemutils.py:tree_decomp)
# ---------------------------------------------------------------------------

@dataclass
class MolTree:
    mol: Mol
    cliques: List[List[int]]          # atom ids per tree node
    edges: List[Tuple[int, int]]      # tree edges (clique idx pairs)
    labels: List[str]                 # canonical fragment hash per node


def _fragment(mol: Mol, atoms: Sequence[int]) -> Mol:
    idx = {a: i for i, a in enumerate(atoms)}
    frag = Mol()
    for a in atoms:
        at = mol.atoms[a]
        frag.add_atom(at.z, at.charge)
    for (a, b), o in mol.bonds.items():
        if a in idx and b in idx:
            frag.add_bond(idx[a], idx[b], o)
    return frag


def tree_decomp(mol: Mol) -> MolTree:
    """Cliques = rings + non-ring bonds (+ singleton atoms at junctions of
    >= 3 cliques), spanning tree over clique-overlap graph."""
    n = mol.num_atoms
    rings = [sorted(c) for c in _ring_info(mol)]
    ring_atoms = set(a for r in rings for a in r)
    cliques: List[List[int]] = [list(r) for r in rings]
    for (a, b), o in sorted(mol.bonds.items()):
        in_ring = any(a in r and b in r for r in rings)
        if not in_ring:
            cliques.append([a, b])
    if not cliques and n:
        cliques = [[0]]
    # merge rings sharing >= 3 atoms (bridged systems, chemutils.py)
    merged = True
    while merged:
        merged = False
        for i in range(len(cliques)):
            for j in range(i + 1, len(cliques)):
                if (len(cliques[i]) > 2 and len(cliques[j]) > 2 and
                        len(set(cliques[i]) & set(cliques[j])) >= 3):
                    cliques[i] = sorted(set(cliques[i]) | set(cliques[j]))
                    cliques.pop(j)
                    merged = True
                    break
            if merged:
                break
    # spanning tree: connect cliques sharing atoms (max-overlap first)
    K = len(cliques)
    cand = []
    for i in range(K):
        for j in range(i + 1, K):
            ov = len(set(cliques[i]) & set(cliques[j]))
            if ov > 0:
                cand.append((-ov, i, j))
    cand.sort()
    parent = list(range(K))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = []
    for _, i, j in cand:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            edges.append((i, j))
    labels = [canonical_hash(_fragment(mol, c)) for c in cliques]
    return MolTree(mol=mol, cliques=cliques, edges=edges, labels=labels)


class Vocab:
    """Fragment vocabulary over canonical clique hashes (fast_jtnn Vocab)."""

    def __init__(self):
        self.hash_to_id: Dict[str, int] = {}
        self.fragments: List[Mol] = []

    @classmethod
    def build(cls, mols: Sequence[Mol]) -> "Vocab":
        v = cls()
        for mol in mols:
            t = tree_decomp(mol)
            for c, h in zip(t.cliques, t.labels):
                if h not in v.hash_to_id:
                    v.hash_to_id[h] = len(v.fragments)
                    v.fragments.append(_fragment(mol, c))
        return v

    def __len__(self):
        return len(self.fragments)

    def index(self, h: str) -> int:
        return self.hash_to_id.get(h, 0)


# ---------------------------------------------------------------------------
# encoders / decoder networks
# ---------------------------------------------------------------------------

class TreeGRUEncoder(nn.Module):
    """GRU message passing over padded junction trees
    (jtnn_enc.py:8-132). Inputs: node label ids [T, Nn], adjacency
    [T, Nn, Nn], node mask [T, Nn]; returns per-tree root embeddings."""

    vocab_size: int
    hidden: int = 128
    depth: int = 4

    @nn.compact
    def __call__(self, labels, adj, mask):
        x = nn.Embed(self.vocab_size, self.hidden)(labels)   # [T, Nn, h]
        x = jnp.where(mask[..., None], x, 0.0)
        gru = nn.GRUCell(features=self.hidden, kernel_init=xavier)
        h = jnp.zeros_like(x)
        for _ in range(self.depth):
            m = jnp.einsum("tij,tjh->tih", adj, h)           # neighbor sum
            flat_c = h.reshape(-1, self.hidden)
            flat_in = (x + m).reshape(-1, self.hidden)
            new_c, _ = gru(flat_c, flat_in)
            h = new_c.reshape(x.shape)
            h = jnp.where(mask[..., None], h, 0.0)
        root = h[:, 0]                                        # root = node 0
        pooled = jnp.sum(h, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1, keepdims=True), 1)
        return jnp.concatenate([root, pooled], axis=-1)


class GraphMPN(nn.Module):
    """Atom-level message passing (mpn.py:94): bond-message GRU-ish loop
    over dense per-mol adjacency."""

    hidden: int = 128
    depth: int = 3

    @nn.compact
    def __call__(self, z, adj, mask):
        x = nn.Embed(64, self.hidden)(z)                      # [B, Na, h]
        x = jnp.where(mask[..., None], x, 0.0)
        h = jax.nn.relu(nn.Dense(self.hidden, kernel_init=xavier)(x))
        for _ in range(self.depth):
            m = jnp.einsum("bij,bjh->bih", adj, h)
            h = jax.nn.relu(x + nn.Dense(self.hidden,
                                         kernel_init=xavier)(m))
            h = jnp.where(mask[..., None], h, 0.0)
        return jnp.sum(h, axis=1)


class JTVAEModel(nn.Module):
    """Encoder pair + VAE heads + teacher-forced tree decoder
    (jtnn_vae.py:20-258 + jtnn_dec.py). With ``predict_prop=True`` this is
    the property-predicting variant (jtprop_vae.py:49-56 propNN): a
    tanh-MLP head on the latent, trained jointly with MSE."""

    vocab_size: int
    hidden: int = 128
    latent: int = 56
    depth_t: int = 4
    depth_g: int = 3
    predict_prop: bool = False

    def setup(self):
        self.tree_enc = TreeGRUEncoder(self.vocab_size, self.hidden,
                                       self.depth_t)
        self.graph_enc = GraphMPN(self.hidden, self.depth_g)
        half = self.latent // 2
        self.t_mean = nn.Dense(half, kernel_init=xavier)
        self.t_logvar = nn.Dense(half, kernel_init=xavier)
        self.g_mean = nn.Dense(half, kernel_init=xavier)
        self.g_logvar = nn.Dense(half, kernel_init=xavier)
        self.dec_gru = nn.GRUCell(features=self.hidden, kernel_init=xavier)
        self.dec_label = nn.Dense(self.vocab_size, kernel_init=xavier)
        self.dec_topo = nn.Dense(1, kernel_init=xavier)
        self.dec_init = nn.Dense(self.hidden, kernel_init=xavier)
        self.dec_emb = nn.Embed(self.vocab_size, self.hidden)
        if self.predict_prop:
            self.prop_nn1 = nn.Dense(self.hidden, kernel_init=xavier)
            self.prop_nn2 = nn.Dense(1, kernel_init=xavier)

    def predict_property(self, latent):
        """propNN(latent) — jtprop_vae.py:49-53 (Linear→Tanh→Linear)."""
        return self.prop_nn2(jnp.tanh(self.prop_nn1(latent)))[:, 0]

    def encode(self, batch):
        zt = self.tree_enc(batch["labels"], batch["tree_adj"],
                           batch["tree_mask"])
        zg = self.graph_enc(batch["z"], batch["mol_adj"],
                            batch["mol_mask"])
        return (self.t_mean(zt), self.t_logvar(zt),
                self.g_mean(zg), self.g_logvar(zg))

    def decode_train(self, latent, batch):
        """Teacher-forced DFS decoding: at each step predict
        (expand-vs-backtrack, next fragment label)."""
        steps_label = batch["dec_label"]       # [B, S] target labels
        steps_topo = batch["dec_topo"]         # [B, S] 1=expand 0=backtrack
        steps_mask = batch["dec_mask"]         # [B, S]
        prev_label = batch["dec_prev"]         # [B, S] label of current node
        B, S = steps_label.shape
        h = jax.nn.relu(self.dec_init(latent))
        label_ll = 0.0
        topo_ll = 0.0
        for s in range(S):
            inp = self.dec_emb(prev_label[:, s]) + jax.nn.relu(
                self.dec_init(latent))
            h, _ = self.dec_gru(h, inp)
            topo_logit = self.dec_topo(h)[:, 0]
            topo_ll += jnp.where(
                steps_mask[:, s],
                -optax.sigmoid_binary_cross_entropy(
                    topo_logit, steps_topo[:, s].astype(jnp.float32)), 0.0)
            lab_logits = self.dec_label(h)
            lab_lp = jax.nn.log_softmax(lab_logits, -1)
            pick = jnp.take_along_axis(lab_lp, steps_label[:, s][:, None],
                                       1)[:, 0]
            label_ll += jnp.where(steps_mask[:, s] &
                                  (steps_topo[:, s] > 0), pick, 0.0)
        denom = jnp.maximum(jnp.sum(steps_mask, axis=1), 1)
        return (label_ll + topo_ll) / denom

    def __call__(self, batch, rng, beta: float = 0.005):
        tm, tv, gm, gv = self.encode(batch)
        k1, k2 = jax.random.split(rng)
        zt = tm + jnp.exp(0.5 * tv) * jax.random.normal(k1, tm.shape)
        zg = gm + jnp.exp(0.5 * gv) * jax.random.normal(k2, gm.shape)
        latent = jnp.concatenate([zt, zg], axis=-1)
        rec_ll = self.decode_train(latent, batch)
        kl = -0.5 * jnp.sum(1 + tv - tm ** 2 - jnp.exp(tv), -1) \
             - 0.5 * jnp.sum(1 + gv - gm ** 2 - jnp.exp(gv), -1)
        loss = jnp.mean(-rec_ll + beta * kl)
        aux = {"rec": jnp.mean(-rec_ll), "kl": jnp.mean(kl)}
        if self.predict_prop and "props" in batch:
            pred = self.predict_property(latent)
            prop_mse = jnp.mean((pred - batch["props"]) ** 2)
            loss = loss + prop_mse          # jtprop_vae.py forward: + prop_loss
            aux["prop_mse"] = prop_mse
        return loss, aux

    def decode_steps(self, latent, max_steps: int = 12):
        """Greedy decoding: returns (labels, topo) per step."""
        h = jax.nn.relu(self.dec_init(latent))
        labels = []
        topos = []
        prev = jnp.zeros(latent.shape[0], jnp.int32)
        for _ in range(max_steps):
            inp = self.dec_emb(prev) + jax.nn.relu(self.dec_init(latent))
            h, _ = self.dec_gru(h, inp)
            topo = jax.nn.sigmoid(self.dec_topo(h)[:, 0])
            lab = jnp.argmax(self.dec_label(h), -1)
            labels.append(lab)
            topos.append(topo)
            prev = lab
        return jnp.stack(labels, 1), jnp.stack(topos, 1)


# ---------------------------------------------------------------------------
# batching + method driver
# ---------------------------------------------------------------------------

def _dfs_steps(tree: MolTree, vocab: Vocab, max_steps: int):
    """Teacher-forcing DFS trace: (prev_label, target_label, topo)."""
    adj: Dict[int, List[int]] = {i: [] for i in range(len(tree.cliques))}
    for a, b in tree.edges:
        adj[a].append(b)
        adj[b].append(a)
    prev, target, topo = [], [], []
    visited = {0}

    def dfs(u):
        for v in sorted(adj[u]):
            if v in visited:
                continue
            visited.add(v)
            prev.append(vocab.index(tree.labels[u]))
            target.append(vocab.index(tree.labels[v]))
            topo.append(1)
            dfs(v)
        prev.append(vocab.index(tree.labels[u]))
        target.append(0)
        topo.append(0)

    dfs(0)
    return prev[:max_steps], target[:max_steps], topo[:max_steps]


def batch_trees(trees: List[MolTree], vocab: Vocab, max_nodes: int = 12,
                max_atoms: int = 24, max_steps: int = 12) -> Dict:
    B = len(trees)
    labels = np.zeros((B, max_nodes), np.int32)
    tadj = np.zeros((B, max_nodes, max_nodes), np.float32)
    tmask = np.zeros((B, max_nodes), bool)
    z = np.zeros((B, max_atoms), np.int32)
    madj = np.zeros((B, max_atoms, max_atoms), np.float32)
    mmask = np.zeros((B, max_atoms), bool)
    dl = np.zeros((B, max_steps), np.int32)
    dt = np.zeros((B, max_steps), np.int32)
    dm = np.zeros((B, max_steps), bool)
    dp = np.zeros((B, max_steps), np.int32)
    for b, t in enumerate(trees):
        K = min(len(t.cliques), max_nodes)
        for i in range(K):
            labels[b, i] = vocab.index(t.labels[i])
            tmask[b, i] = True
        for a, bb in t.edges:
            if a < max_nodes and bb < max_nodes:
                tadj[b, a, bb] = tadj[b, bb, a] = 1.0
        n = min(t.mol.num_atoms, max_atoms)
        for i in range(n):
            z[b, i] = min(t.mol.atoms[i].z, 63)
            mmask[b, i] = True
        for (a, bb), o in t.mol.bonds.items():
            if a < max_atoms and bb < max_atoms:
                madj[b, a, bb] = madj[b, bb, a] = 1.0
        pv, tg, tp = _dfs_steps(t, vocab, max_steps)
        S = len(pv)
        dp[b, :S] = pv
        dl[b, :S] = tg
        dt[b, :S] = tp
        dm[b, :S] = True
    return {"labels": jnp.asarray(labels), "tree_adj": jnp.asarray(tadj),
            "tree_mask": jnp.asarray(tmask), "z": jnp.asarray(z),
            "mol_adj": jnp.asarray(madj), "mol_mask": jnp.asarray(mmask),
            "dec_label": jnp.asarray(dl), "dec_topo": jnp.asarray(dt),
            "dec_mask": jnp.asarray(dm), "dec_prev": jnp.asarray(dp)}


def assemble(fragments: List[Mol]) -> Optional[Mol]:
    """Greedy stitching of decoded fragments: attach each next fragment at
    the first valency-feasible atom pair (compact substitute for the
    reference's JTMPN candidate scoring)."""
    if not fragments:
        return None
    mol = fragments[0].copy()
    for frag in fragments[1:]:
        base = mol.num_atoms
        attach_done = False
        for a in range(mol.num_atoms):
            for fa in range(frag.num_atoms):
                trial = mol.copy()
                off = {}
                for i, at in enumerate(frag.atoms):
                    off[i] = trial.add_atom(at.z, at.charge)
                for (x, y), o in frag.bonds.items():
                    trial.add_bond(off[x], off[y], o)
                trial.add_bond(a, off[fa], 1.0)
                if check_valency(trial):
                    mol = trial
                    attach_done = True
                    break
            if attach_done:
                break
        if not attach_done:
            break
    return mol


class JTVAE(Generator):
    """Method driver (reference jtvae.py:20-293)."""

    def __init__(self, vocab: Optional[Vocab] = None, hidden: int = 128,
                 latent: int = 56):
        self.vocab = vocab
        self.hidden = hidden
        self.latent = latent
        self.model = None
        self.params = None

    def build_vocab(self, smiles: Sequence[str]):
        mols = []
        for s in smiles:
            try:
                mols.append(mol_from_smiles(s))
            except Exception:
                pass
        self.vocab = Vocab.build(mols)
        self._mols = mols
        return self.vocab

    def _train(self, smiles: Sequence[str], props: Optional[Sequence[float]],
               batch_size: int, epochs: int, lr: float, beta: float,
               seed: int, verbose: bool):
        if self.vocab is None:
            self.build_vocab(smiles)
        mols = getattr(self, "_mols", None) or [
            mol_from_smiles(s) for s in smiles]
        trees = [tree_decomp(m) for m in mols]
        predict_prop = props is not None
        if predict_prop:
            props = np.asarray(props, np.float32)
            assert len(props) == len(trees)
        self.model = JTVAEModel(vocab_size=max(len(self.vocab), 1),
                                hidden=self.hidden, latent=self.latent,
                                predict_prop=predict_prop)
        key = jax.random.PRNGKey(seed)

        def make_batch(idx):
            batch = batch_trees([trees[j] for j in idx], self.vocab)
            if predict_prop:
                batch["props"] = jnp.asarray(props[np.asarray(idx)])
            return batch

        b0 = make_batch(list(range(min(batch_size, len(trees)))))
        key, k0 = jax.random.split(key)
        params = jax.jit(self.model.init)(k0, b0, k0)
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        model = self.model

        @jax.jit
        def step(params, opt_state, batch, k):
            def loss_fn(p):
                return model.apply(p, batch, k, beta)
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, aux

        rng = np.random.default_rng(seed)
        history = []
        for ep in range(epochs):
            order = rng.permutation(len(trees))
            losses = []
            for i in range(0, len(trees) - batch_size + 1, batch_size):
                batch = make_batch(order[i:i + batch_size])
                key, k = jax.random.split(key)
                params, opt_state, loss, aux = step(params, opt_state,
                                                    batch, k)
                losses.append(float(loss))
            avg = float(np.mean(losses)) if losses else float("nan")
            history.append(avg)
            if verbose:
                print(f"Epoch {ep + 1} | elbo-loss {avg:.4f}")
        self.params = params
        return history

    def train_rand_gen(self, smiles: Sequence[str], batch_size: int = 16,
                       epochs: int = 5, lr: float = 1e-3,
                       beta: float = 0.005, seed: int = 0,
                       verbose: bool = True):
        return self._train(smiles, None, batch_size, epochs, lr, beta,
                           seed, verbose)

    def train_prop_opt(self, smiles: Sequence[str],
                       props: Optional[Sequence[float]] = None,
                       batch_size: int = 16, epochs: int = 5,
                       lr: float = 1e-3, beta: float = 0.005,
                       seed: int = 0, verbose: bool = True):
        """Train the property-predicting variant (jtprop_vae.py): joint
        ELBO + MSE(propNN(latent), prop). ``props`` defaults to the
        chem-kernel plogp PROXY of each training molecule."""
        if self.vocab is None:
            self.build_vocab(smiles)
        if props is None:
            from .environment import calculate_min_plogp
            mols = getattr(self, "_mols", None) or [
                mol_from_smiles(s) for s in smiles]
            props = [calculate_min_plogp(m) for m in mols]
        return self._train(smiles, props, batch_size, epochs, lr, beta,
                           seed, verbose)

    def train_assembler(self, smiles: Optional[Sequence[str]] = None,
                        epochs: int = 30, verbose: bool = False):
        """Train the JTMPN candidate scorer on junction fixtures from the
        training molecules (the reference's assm loss; see jtmpn.py)."""
        from .jtmpn import build_assembly_fixtures, train_assembler
        mols = getattr(self, "_mols", None)
        if mols is None:
            mols = [mol_from_smiles(s) for s in (smiles or [])]
        fixtures = build_assembly_fixtures(mols)
        if not fixtures:
            self.scorer = self.scorer_params = None
            return None
        self.scorer, self.scorer_params = train_assembler(
            fixtures, epochs=epochs, verbose=verbose)
        self._assembly_fixtures = fixtures
        return fixtures

    def _assemble(self, frags):
        from .jtmpn import assemble_scored
        return assemble_scored(frags, getattr(self, "scorer", None),
                               getattr(self, "scorer_params", None))

    def _decode_latents(self, latents, max_steps: int = 8,
                        empty_fallback: bool = True) -> List[Optional[Mol]]:
        """Batch-decode latent vectors [B, latent] → host-assembled mols."""
        model, params = self.model, self.params

        @jax.jit
        def dec(params, latent):
            return model.apply(params, latent, max_steps,
                               method="decode_steps")

        labels, topos = dec(params, jnp.asarray(latents))
        labels = np.asarray(labels)
        topos = np.asarray(topos)
        out = []
        for b in range(labels.shape[0]):
            frags = []
            for s in range(max_steps):
                if topos[b, s] < 0.5 and s > 0:
                    break
                frags.append(self.vocab.fragments[int(labels[b, s])])
            mol = self._assemble(frags)
            if mol is None and empty_fallback:
                mol = Mol()
            out.append(mol)
        return out

    def run_rand_gen(self, n_mols: int = 20, seed: int = 0,
                     max_steps: int = 8) -> List[Mol]:
        assert self.params is not None
        key = jax.random.PRNGKey(seed)
        latent = jax.random.normal(key, (n_mols, self.latent))
        return self._decode_latents(latent, max_steps)

    # -- property optimization (jtprop_vae.py:215-263 optimize) ----------

    def encode_latent_mean(self, smiles_list: Sequence[str]):
        """[tree_mean ; graph_mean] per molecule
        (jtprop_vae.py:66-74 encode_latent_mean)."""
        trees = [tree_decomp(mol_from_smiles(s)) for s in smiles_list]
        batch = batch_trees(trees, self.vocab)
        tm, _, gm, _ = self.model.apply(self.params, batch, method="encode")
        return jnp.concatenate([tm, gm], axis=-1)

    def _ascend(self, latents, lr: float, num_iter: int):
        """Gradient ascent on propNN wrt the latent, as one jitted
        lax.scan; returns every visited latent [num_iter, B, latent].

        TPU-first redesign of the reference's per-step host loop
        (jtprop_vae.py:233-239): the whole trajectory is computed
        on-device, then decoded in ONE batched decode instead of the
        reference's sequential decode-per-bisection-probe."""
        assert self.model.predict_prop, "train_prop_opt first"
        model, params = self.model, self.params

        @jax.jit
        def ascend(latent0):
            def body(latent, _):
                g = jax.grad(lambda z: jnp.sum(model.apply(
                    params, z, method="predict_property")))(latent)
                latent = latent + lr * g
                return latent, latent
            _, visited = jax.lax.scan(body, latent0, None, length=num_iter)
            return visited

        return ascend(jnp.asarray(latents))

    def optimize(self, smiles: str, sim_cutoff: float = 0.0,
                 lr: float = 2.0, num_iter: int = 20,
                 max_steps: int = 8) -> Tuple[Optional[Mol], float]:
        """Constrained latent-space optimization of one molecule: ascend
        the property head, return the furthest decodable point whose
        Morgan-Tanimoto similarity to the input is >= ``sim_cutoff``
        (jtprop_vae.py:215-263; similarity is real Morgan-FP, the
        optimized property is the chem-kernel proxy)."""
        from .environment import (morgan_fingerprint, tanimoto_similarity)
        mol_in = mol_from_smiles(smiles)
        fp_in = morgan_fingerprint(mol_in)
        latent0 = self.encode_latent_mean([smiles])[0]
        visited = self._ascend(latent0[None], lr, num_iter)[:, 0]
        mols = self._decode_latents(visited, max_steps, empty_fallback=False)
        # walk from the furthest point back (strictly dominates the
        # reference's bisection: every point is already decoded)
        for m in reversed(mols):
            if m is None or m.num_atoms == 0 or not check_valency(m):
                continue
            sim = tanimoto_similarity(fp_in, morgan_fingerprint(m))
            if sim >= sim_cutoff:
                return m, float(sim)
        return None, 0.0

    def run_prop_opt(self, n_mols: int = 20, seed: int = 0,
                     lr: float = 2.0, num_iter: int = 20,
                     max_steps: int = 8) -> List[Mol]:
        """Unconstrained property optimization: ascend prior samples and
        decode the trajectory tails (Generator.run_prop_opt surface)."""
        assert self.model is not None and self.model.predict_prop, \
            "train_prop_opt first"
        key = jax.random.PRNGKey(seed)
        latent = jax.random.normal(key, (n_mols, self.latent))
        visited = self._ascend(latent, lr, num_iter)
        return self._decode_latents(visited[-1], max_steps)

    def run_const_prop_opt(self, smiles_list: Sequence[str],
                           lr: float = 2.0, num_iter: int = 20) -> Dict:
        """Optimize each input at the four reference similarity cutoffs;
        returns the ConstPropOptEvaluator input_dict
        (jtvae.py run_cons_optim + ConstPropOptEvaluator contract)."""
        out: Dict = {"inp_smiles": list(smiles_list)}
        for key_name, thr in (("mols_0", 0.0), ("mols_2", 0.2),
                              ("mols_4", 0.4), ("mols_6", 0.6)):
            out[key_name] = [self.optimize(s, sim_cutoff=thr, lr=lr,
                                           num_iter=num_iter)[0]
                             for s in smiles_list]
        return out

    def reconstruct(self, smiles: str, seed: int = 0) -> Optional[Mol]:
        """Encode-decode one molecule (jtvae.py reconstruct surface)."""
        mol = mol_from_smiles(smiles)
        tree = tree_decomp(mol)
        batch = batch_trees([tree], self.vocab)
        tm, tv, gm, gv = self.model.apply(self.params, batch,
                                          method="encode")
        latent = jnp.concatenate([tm, gm], axis=-1)
        labels, topos = self.model.apply(self.params, latent, 8,
                                         method="decode_steps")
        labels = np.asarray(labels)[0]
        topos = np.asarray(topos)[0]
        frags = [self.vocab.fragments[int(labels[0])]]
        for l, t in zip(labels[1:], topos[1:]):
            if t < 0.5:
                break
            frags.append(self.vocab.fragments[int(l)])
        return self._assemble(frags)
