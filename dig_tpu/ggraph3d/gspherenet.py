"""G-SphereNet: autoregressive flow for 3D molecular geometry.

Parity with ``dig/ggraph3D/method/G_SphereNet/{gspherenet.py:8-128,
model/sphgen.py:10-203}``: a SphereNet-style encoder embeds the partial
molecule; a focus MLP scores which atom grows next; conditional affine
flows (exp-ST nets) model the new atom's type (dequantized one-hot),
distance to the focus, angle at (focus, c1) and torsion at (focus, c1, c2),
with masked multi-head attention providing global context. Generation
places atoms via the local spherical frame.

TPU design: training steps are flat padded batches of *placement steps*
(each step = one partial molecule), so the whole loss is one jit; the
sequential part (generation) is a host loop over a jitted single-step fn.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..graph import GraphBatch
from ..ops import segment_sum
from ..ops.basis import gaussian_rbf
from ..ops.radius import radius_graph_flat
from ..ops.triplets import edge_distances

xavier = jax.nn.initializers.glorot_uniform()


class SphereEncoder(nn.Module):
    """Compact SchNet/SphereNet-style encoder -> node embeddings [N, d]
    (role of ``model/spherenet.py`` in the reference)."""

    cutoff: float = 5.0
    num_layers: int = 3
    hidden: int = 128
    num_gaussians: int = 32
    max_edges: int = 2048

    @nn.compact
    def __call__(self, g: GraphBatch):
        z = g.nodes["z"]
        pos = g.nodes["pos"]
        N = g.num_nodes
        senders, receivers, edge_mask = radius_graph_flat(
            pos, g.node_graph, g.node_mask, self.cutoff, self.max_edges)
        dist = edge_distances(pos, senders, receivers, edge_mask)
        rbf = gaussian_rbf(dist, 0.0, self.cutoff, self.num_gaussians)
        h = nn.Embed(32, self.hidden)(z)
        h = jnp.where(g.node_mask[:, None], h, 0.0)
        for _ in range(self.num_layers):
            w = nn.Dense(self.hidden, kernel_init=xavier)(rbf)
            w = jax.nn.silu(w)
            msg = h[senders] * w
            agg = segment_sum(msg, receivers, N, mask=edge_mask)
            upd = nn.Dense(self.hidden, kernel_init=xavier)(
                jax.nn.silu(nn.Dense(self.hidden, kernel_init=xavier)(agg)))
            h = h + jnp.where(g.node_mask[:, None], upd, 0.0)
        return h


class MaskedMHA(nn.Module):
    """Multi-head attention of one query per step over its graph's nodes
    (reference att.py MH_ATT with batch masking)."""

    heads: int = 4
    out_dim: int = 128

    @nn.compact
    def __call__(self, q, kv, q_graph, kv_graph, kv_mask):
        d = self.out_dim // self.heads
        Q = nn.Dense(self.heads * d, kernel_init=xavier)(q)
        K = nn.Dense(self.heads * d, kernel_init=xavier)(kv)
        V = nn.Dense(self.heads * d, kernel_init=xavier)(kv)
        S, N = Q.shape[0], K.shape[0]
        Q = Q.reshape(S, self.heads, d)
        K = K.reshape(N, self.heads, d)
        V = V.reshape(N, self.heads, d)
        logits = jnp.einsum("shd,nhd->shn", Q, K) / jnp.sqrt(d)
        valid = (q_graph[:, None] == kv_graph[None, :]) & kv_mask[None, :]
        logits = jnp.where(valid[:, None, :], logits, -1e30)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("shn,nhd->shd", att, V).reshape(S, -1)
        return nn.Dense(self.out_dim, kernel_init=xavier)(out)


class STExp(nn.Module):
    """Affine flow conditioner: (s, t) with s = exp(tanh-bounded)
    (reference net_utils ST_Net_Exp)."""

    out_dim: int
    hid: int = 128

    @nn.compact
    def __call__(self, cond):
        h = jnp.tanh(nn.Dense(self.hid, kernel_init=xavier)(cond))
        out = nn.Dense(self.out_dim * 2,
                       kernel_init=jax.nn.initializers.constant(1e-10))(h)
        s = jnp.tanh(out[..., :self.out_dim])
        t = out[..., self.out_dim:]
        return jnp.exp(s), t


def flow_forward(st_nets, x, cond):
    log_jacob = jnp.zeros(x.shape[0])
    for net in st_nets:
        s, t = net(cond)
        x = (x + t) * s
        log_jacob += jnp.sum(jnp.log(jnp.abs(s) + 1e-12), axis=-1)
    return x, log_jacob


def flow_reverse(st_nets, latent, cond):
    for net in reversed(st_nets):
        s, t = net(cond)
        latent = latent / s - t
    return latent


class SphGenModel(nn.Module):
    """Per-step flows over (type, dist, angle, torsion) (sphgen.py)."""

    num_node_types: int = 4
    cutoff: float = 5.0
    hidden: int = 128
    num_flow_layers: int = 6
    deq_coeff: float = 0.9
    n_att_heads: int = 4

    def setup(self):
        h = self.hidden
        self.encoder = SphereEncoder(self.cutoff, 3, h)
        self.type_emb = nn.Embed(32, h)
        self.focus_mlp = [nn.Dense(h, kernel_init=xavier),
                          nn.Dense(1, kernel_init=xavier)]
        self.node_att = MaskedMHA(self.n_att_heads, h)
        self.dist_att = MaskedMHA(self.n_att_heads, h)
        self.angle_att = MaskedMHA(self.n_att_heads, h)
        self.torsion_att = MaskedMHA(self.n_att_heads, h)
        self.node_flow = [STExp(self.num_node_types, h)
                          for _ in range(self.num_flow_layers)]
        self.dist_flow = [STExp(1, h) for _ in range(self.num_flow_layers)]
        self.angle_flow = [STExp(1, h) for _ in range(self.num_flow_layers)]
        self.torsion_flow = [STExp(1, h)
                             for _ in range(self.num_flow_layers)]

    def _focus_score(self, node_feat):
        h = jax.nn.relu(self.focus_mlp[0](node_feat))
        return self.focus_mlp[1](h)[..., 0]

    def __call__(self, g: GraphBatch, step: Dict, rng):
        """Training forward over a batch of placement steps.

        ``g``: partial molecules (one per step). ``step`` dict:
        focus/c1/c2 [S] node indices (into the flat batch), new_atom_type
        [S], new_dist/new_angle/new_torsion [S], has_angle/has_torsion [S]
        masks, focus_label [N] (1 for the true focus atom rows),
        stop_mask [S] (steps whose graph is complete).
        """
        node_feat = self.encoder(g)
        focus_score = self._focus_score(node_feat)

        S = step["focus"].shape[0]
        x_z = jax.nn.one_hot(step["new_atom_type"], self.num_node_types)
        x_z = x_z + self.deq_coeff * jax.random.uniform(rng, x_z.shape)

        qg = g.node_graph[step["focus"]]
        local_nt = node_feat[step["focus"]]
        global_nt = self.node_att(local_nt, node_feat, qg, g.node_graph,
                                  g.node_mask)
        nt_feat = jnp.concatenate([local_nt, global_nt], -1)
        node_latent, node_lj = flow_forward(self.node_flow, x_z, nt_feat)

        t_emb = self.type_emb(step["new_atom_type"])     # [S, h]
        # node_emb conditioned on the new atom's type per its graph
        node_emb = node_feat * t_emb[g.node_graph]

        local_d = node_emb[step["focus"]]
        global_d = self.dist_att(local_d, node_emb, qg, g.node_graph,
                                 g.node_mask)
        d_feat = jnp.concatenate([local_d, global_d], -1)
        dist_latent, dist_lj = flow_forward(
            self.dist_flow, step["new_dist"][:, None], d_feat)

        local_a = jnp.concatenate([node_emb[step["c1"]],
                                   node_emb[step["focus"]]], -1)
        global_a = self.angle_att(local_a, node_emb, qg, g.node_graph,
                                  g.node_mask)
        a_feat = jnp.concatenate([local_a, global_a], -1)
        angle_latent, angle_lj = flow_forward(
            self.angle_flow, step["new_angle"][:, None], a_feat)

        local_t = jnp.concatenate([node_emb[step["c2"]],
                                   node_emb[step["c1"]],
                                   node_emb[step["focus"]]], -1)
        global_t = self.torsion_att(local_t, node_emb, qg, g.node_graph,
                                    g.node_mask)
        t_feat = jnp.concatenate([local_t, global_t], -1)
        torsion_latent, torsion_lj = flow_forward(
            self.torsion_flow, step["new_torsion"][:, None], t_feat)

        return {"node": (node_latent, node_lj),
                "dist": (dist_latent, dist_lj),
                "angle": (angle_latent, angle_lj),
                "torsion": (torsion_latent, torsion_lj),
                "focus_score": focus_score}

    def loss(self, g: GraphBatch, step: Dict, rng):
        out = self.__call__(g, step, rng)
        sm = step["step_mask"]

        def nll(latent, lj, extra_mask=None):
            ll = -0.5 * (jnp.log(2 * jnp.pi) + latent ** 2).sum(-1) + lj
            m = sm if extra_mask is None else sm & extra_mask
            return -jnp.sum(jnp.where(m, ll, 0.0)) / jnp.maximum(
                jnp.sum(m), 1)

        l_node = nll(*out["node"])
        l_dist = nll(*out["dist"])
        l_angle = nll(*out["angle"], step.get("has_angle"))
        l_torsion = nll(*out["torsion"], step.get("has_torsion"))
        # focus BCE over real nodes
        fl = optax.sigmoid_binary_cross_entropy(
            out["focus_score"], step["focus_label"].astype(jnp.float32))
        l_focus = jnp.sum(jnp.where(g.node_mask, fl, 0.0)) / jnp.maximum(
            jnp.sum(g.node_mask), 1)
        total = l_node + l_dist + l_angle + l_torsion + l_focus
        return total, {"node": l_node, "dist": l_dist, "angle": l_angle,
                       "torsion": l_torsion, "focus": l_focus}

    # -- generation-time single-step conditioners -------------------------
    def step_features(self, g: GraphBatch, focus, c1, c2, new_type):
        node_feat = self.encoder(g)
        focus_score = self._focus_score(node_feat)
        qg = g.node_graph[focus]
        local_nt = node_feat[focus]
        global_nt = self.node_att(local_nt, node_feat, qg, g.node_graph,
                                  g.node_mask)
        nt_feat = jnp.concatenate([local_nt, global_nt], -1)
        t_emb = self.type_emb(new_type)
        node_emb = node_feat * t_emb[g.node_graph]
        local_d = node_emb[focus]
        global_d = self.dist_att(local_d, node_emb, qg, g.node_graph,
                                 g.node_mask)
        d_feat = jnp.concatenate([local_d, global_d], -1)
        local_a = jnp.concatenate([node_emb[c1], node_emb[focus]], -1)
        global_a = self.angle_att(local_a, node_emb, qg, g.node_graph,
                                  g.node_mask)
        a_feat = jnp.concatenate([local_a, global_a], -1)
        local_t = jnp.concatenate([node_emb[c2], node_emb[c1],
                                   node_emb[focus]], -1)
        global_t = self.torsion_att(local_t, node_emb, qg, g.node_graph,
                                    g.node_mask)
        t_feat = jnp.concatenate([local_t, global_t], -1)
        return focus_score, nt_feat, d_feat, a_feat, t_feat

    def reverse_node(self, feat, latent):
        return flow_reverse(self.node_flow, latent, feat)

    def reverse_dist(self, feat, latent):
        return flow_reverse(self.dist_flow, latent, feat)

    def reverse_angle(self, feat, latent):
        return flow_reverse(self.angle_flow, latent, feat)

    def reverse_torsion(self, feat, latent):
        return flow_reverse(self.torsion_flow, latent, feat)


def place_atom(pos_f, pos_c1, pos_c2, d, theta, phi):
    """New atom position from the local frame at the focus
    (reference geometric_computing.py position update)."""
    b1 = pos_c1 - pos_f
    b1 = b1 / max(np.linalg.norm(b1), 1e-9)
    b2 = pos_c2 - pos_c1
    n = np.cross(b1, b2)
    if np.linalg.norm(n) < 1e-6:
        n = np.cross(b1, np.array([1.0, 0.0, 0.0]))
        if np.linalg.norm(n) < 1e-6:
            n = np.cross(b1, np.array([0.0, 1.0, 0.0]))
    n = n / max(np.linalg.norm(n), 1e-9)
    m = np.cross(n, b1)
    # direction at angle theta from b1, rotated phi about b1
    dvec = (np.cos(theta) * b1
            + np.sin(theta) * (np.cos(phi) * m + np.sin(phi) * n))
    return pos_f + d * dvec


def _place_atom_jnp(pos_f, pos_c1, pos_c2, d, theta, phi, eps=1e-9):
    """Batched branchless :func:`place_atom` ([B, 3] inputs, [B] scalars) —
    degenerate normals fall back to cross products with the x then y axes
    via where-chains so the whole placement traces under jit/scan."""
    b1 = pos_c1 - pos_f
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), eps)
    b2 = pos_c2 - pos_c1
    n = jnp.cross(b1, b2)
    small = jnp.linalg.norm(n, axis=-1, keepdims=True) < 1e-6
    n_x = jnp.cross(b1, jnp.array([1.0, 0.0, 0.0]))
    n_y = jnp.cross(b1, jnp.array([0.0, 1.0, 0.0]))
    alt = jnp.where(
        jnp.linalg.norm(n_x, axis=-1, keepdims=True) < 1e-6, n_y, n_x)
    n = jnp.where(small, alt, n)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)
    m = jnp.cross(n, b1)
    ct, st = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    cp, sp = jnp.cos(phi)[:, None], jnp.sin(phi)[:, None]
    dvec = ct * b1 + st * (cp * m + sp * n)
    return pos_f + d[:, None] * dvec


class GSphereNet:
    """Method driver (reference gspherenet.py:8-128)."""

    def __init__(self, num_node_types: int = 4, cutoff: float = 5.0,
                 hidden: int = 64, num_flow_layers: int = 4):
        self.model = SphGenModel(num_node_types=num_node_types,
                                 cutoff=cutoff, hidden=hidden,
                                 num_flow_layers=num_flow_layers)
        self.params = None

    def train(self, loader, lr: float = 1e-3, wd: float = 0.0,
              max_epochs: int = 10, seed: int = 0, verbose: bool = True):
        key = jax.random.PRNGKey(seed)
        g0, step0 = next(iter(loader))
        k0, key = jax.random.split(key)
        params = jax.jit(self.model.init, static_argnames=("method",))(
            k0, g0, step0, k0, method="loss")
        opt = optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)
        opt_state = opt.init(params)
        model = self.model

        @jax.jit
        def train_step(params, opt_state, g, step, k):
            def loss_fn(p):
                return model.apply(p, g, step, k, method="loss")
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        history = []
        for epoch in range(max_epochs):
            losses = []
            for g, step in loader:
                key, k = jax.random.split(key)
                params, opt_state, loss = train_step(params, opt_state, g,
                                                     step, k)
                losses.append(float(loss))
            avg = float(np.mean(losses))
            history.append(avg)
            if verbose:
                print(f"Epoch {epoch + 1} | loss {avg:.4f}")
        self.params = params
        return history

    def generate(self, type_to_atomic_number: Sequence[int],
                 num_gen: int = 10, temperature=(1.0, 1.0, 1.0, 1.0),
                 min_atoms: int = 2, max_atoms: int = 20,
                 focus_th: float = 0.5, seed: int = 0,
                 n_node_pad: Optional[int] = None,
                 batch_size: int = 32):
        """Fully ON-DEVICE lockstep generation: the whole autoregressive
        loop (focus sampling, reference-atom selection, all four reverse
        flows, local-frame placement, stop test) is one jitted
        ``lax.scan`` over atom steps — a single dispatch generates the
        whole batch. The reference loops eagerly per atom per molecule
        (sphgen.py:85-203); unlike 2D generation there is NO host-side
        valency feedback here, so nothing needs to leave the device.
        Latents/sampling use jax.random from ``seed``."""
        from ..graph import GraphBatch
        assert self.params is not None
        model, params = self.model, self.params
        T = len(type_to_atomic_number)
        pad = n_node_pad or max_atoms
        L = max_atoms - 1

        def make_graph(z, pos3, n_atoms, B):
            N = B * pad
            nm = (jnp.arange(pad)[None, :] < n_atoms[:, None])
            return GraphBatch(
                nodes={"z": z.reshape(N), "pos": pos3.reshape(N, 3)},
                edges={},
                senders=jnp.zeros(1, jnp.int32),
                receivers=jnp.zeros(1, jnp.int32),
                globals={},
                node_graph=jnp.repeat(jnp.arange(B, dtype=jnp.int32), pad),
                node_mask=nm.reshape(N),
                edge_mask=jnp.zeros(1, bool),
                graph_mask=jnp.ones(B, bool),
                n_node=n_atoms.astype(jnp.int32),
                n_edge=jnp.zeros(B, jnp.int32))

        def run_batch(B, params, key):
            ks = jax.random.split(key, 5)
            lzs = temperature[0] * jax.random.normal(ks[0], (L, B, T))
            lds = temperature[1] * jax.random.normal(ks[1], (L, B, 1))
            las = temperature[2] * jax.random.normal(ks[2], (L, B, 1))
            lts = temperature[3] * jax.random.normal(ks[3], (L, B, 1))
            gmb = jax.random.gumbel(ks[4], (L, B, pad))
            first = jax.random.randint(jax.random.fold_in(key, 7), (B,),
                                       0, T)
            bb = jnp.arange(B)
            base = bb * pad

            def sf(g, f, c1, c2, nt):
                return model.apply(params, g, f, c1, c2, nt,
                                   method="step_features")

            def body(carry, xs):
                z, pos3, n_atoms, alive = carry
                i, lz, ld, la, lt, gb = xs
                g = make_graph(z, pos3, n_atoms, B)
                zerosB = jnp.zeros(B, jnp.int32)
                nm = (jnp.arange(pad)[None, :] < n_atoms[:, None])

                fs0, *_ = sf(g, zerosB, zerosB, zerosB, zerosB)
                sc = jax.nn.sigmoid(fs0).reshape(B, pad)
                logits = jnp.where(nm, jnp.log(sc + 1e-9), -jnp.inf)
                f_loc = jnp.argmax(logits + gb, axis=1)    # cat. prop. sc

                slots = jnp.arange(pad)[None, :]
                pf = pos3[bb, f_loc]
                d_f = jnp.linalg.norm(pos3 - pf[:, None, :], axis=-1)
                d_f = jnp.where(nm & (slots != f_loc[:, None]), d_f,
                                jnp.inf)
                c1_loc = jnp.argmin(d_f, axis=1)
                p1 = pos3[bb, c1_loc]
                d_c1 = jnp.linalg.norm(pos3 - p1[:, None, :], axis=-1)
                d_c1 = jnp.where(nm & (slots != f_loc[:, None])
                                 & (slots != c1_loc[:, None]), d_c1,
                                 jnp.inf)
                c2_loc = jnp.argmin(d_c1, axis=1)
                # host-version cases: n==1 -> c1=c2=0; n==2 -> c2=f
                c1_loc = jnp.where(n_atoms == 1, 0, c1_loc)
                c2_loc = jnp.where(n_atoms == 1, 0,
                                   jnp.where(n_atoms == 2, f_loc, c2_loc))
                fj = (base + f_loc).astype(jnp.int32)
                c1j = (base + c1_loc).astype(jnp.int32)
                c2j = (base + c2_loc).astype(jnp.int32)

                _, nt_feat, _, _, _ = sf(g, fj, c1j, c2j, zerosB)
                zn = model.apply(params, nt_feat, lz, method="reverse_node")
                new_type = jnp.argmax(zn, axis=-1).astype(jnp.int32)
                fs, _, d_feat, a_feat, t_feat = sf(g, fj, c1j, c2j,
                                                   new_type)
                sc2 = jax.nn.sigmoid(fs).reshape(B, pad)
                mx = jnp.max(jnp.where(nm, sc2, -jnp.inf), axis=1)
                stop = (i >= min_atoms) & (mx < focus_th)
                alive = alive & ~stop

                dd = model.apply(params, d_feat, ld, method="reverse_dist")
                aa = model.apply(params, a_feat, la, method="reverse_angle")
                tt = model.apply(params, t_feat, lt,
                                 method="reverse_torsion")
                d = jnp.abs(dd[:, 0]) + 0.6
                theta = jnp.mod(aa[:, 0], jnp.pi)
                phi = jnp.mod(tt[:, 0], 2 * jnp.pi)
                pf = pos3[bb, f_loc]
                p1 = pos3[bb, c1_loc]
                p2 = pos3[bb, c2_loc]
                np1 = pf + jnp.stack([d, jnp.zeros_like(d),
                                      jnp.zeros_like(d)], -1)
                np2 = _place_atom_jnp(pf, p1,
                                      p1 + jnp.array([0.0, 1.0, 0.0]), d,
                                      theta, jnp.zeros_like(phi))
                np3 = _place_atom_jnp(pf, p1, p2, d, theta, phi)
                new_pos = jnp.where((n_atoms == 1)[:, None], np1,
                                    jnp.where((n_atoms == 2)[:, None],
                                              np2, np3))
                z = z.at[bb, i].set(jnp.where(alive, new_type, z[:, i]))
                pos3 = pos3.at[bb, i].set(
                    jnp.where(alive[:, None], new_pos, pos3[:, i]))
                n_atoms = n_atoms + alive.astype(jnp.int32)
                return (z, pos3, n_atoms, alive), None

            z0 = jnp.zeros((B, pad), jnp.int32).at[:, 0].set(first)
            pos0 = jnp.zeros((B, pad, 3), jnp.float32)
            carry = (z0, pos0, jnp.ones(B, jnp.int32),
                     jnp.ones(B, bool))
            xs = (jnp.arange(1, max_atoms), lzs, lds, las, lts, gmb)
            (z, pos3, n_atoms, _), _ = jax.lax.scan(body, carry, xs)
            return z, pos3, n_atoms

        # one compile per static config, cached across generate() calls
        cfg = (T, pad, max_atoms, min_atoms, float(focus_th),
               tuple(float(t) for t in temperature))
        if getattr(self, "_gen_cfg", None) != cfg:
            self._gen_cfg = cfg
            self._gen_run = jax.jit(run_batch, static_argnums=(0,))
        run = self._gen_run
        key = jax.random.PRNGKey(seed)
        results = []
        done = 0
        while done < num_gen:
            B = min(batch_size, num_gen - done)
            key, k = jax.random.split(key)
            z, pos3, n_atoms = jax.device_get(run(B, params, k))
            for b in range(B):
                n = int(n_atoms[b])
                results.append({
                    "z": np.array([type_to_atomic_number[int(t)]
                                   for t in z[b, :n]]),
                    "pos": np.asarray(pos3[b, :n], np.float32)})
            done += B
        return results
