"""PPO fine-tuning machinery (reference graphflow_rl / graphflow_con_rl):
reward shaping math, seed canvases, end-to-end prop-opt and const-opt
iterations on tiny flows, and BatchNormEmb train/eval semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dig_tpu.chem import Mol, mol_from_smiles
from dig_tpu.ggraph import GraphDF
from dig_tpu.ggraph.rl import RLConfig, _Traj, _shape_rewards, \
    make_seed_canvas

TINY = {"max_size": 8, "edge_unroll": 4, "node_dim": 4, "bond_dim": 4,
        "num_flow_layer": 2, "num_rgcn_layer": 1, "nhid": 16, "nout": 16}


@pytest.fixture(scope="module")
def pretrained_df():
    from dig_tpu.ggraph.dataset import DenseMolDataset, DenseMolLoader
    smiles = ["CCO", "CCC", "CCN", "CO", "CC=O", "C=CC", "CCCO"] * 3
    ds = DenseMolDataset(smiles, atom_list=(6, 7, 8, 9),
                         max_size=TINY["max_size"])
    loader = DenseMolLoader(ds, batch_size=7)
    df = GraphDF()
    df.train_rand_gen(loader, lr=1e-3, wd=0,
                      max_epochs=1, model_conf_dict=TINY, verbose=False)
    return df


def test_shape_rewards_decay():
    traj = _Traj()
    traj.nrew = [1.0, 2.0, 3.0]          # step counters
    traj.erew = [1.0, -1.0, 2.0]         # -1 = penalty record
    _shape_rewards(traj, R=2.0, decay=0.5, T=4)
    # r>0: R * decay^(T-1-t); penalties untouched
    np.testing.assert_allclose(traj.nrew, [2 * 0.25, 2 * 0.5, 2 * 1.0])
    np.testing.assert_allclose(traj.erew, [0.5, -1.0, 1.0])


def test_make_seed_canvas_roundtrip():
    mol = mol_from_smiles("CCO")
    canvas = make_seed_canvas(mol, keep_size=2, atom_list=(6, 7, 8, 9),
                              N=8, U=4, node_dim=4, bond_dim=4)
    x, adj, sub, keep, edge_idx, score = canvas
    assert keep == 2 and sub.num_atoms == 2
    assert x[0, :2].sum() == 2.0 and x[0, 2:].sum() == 0.0
    # one kept bond, symmetric, on the single-bond channel
    assert adj[0, 0, 0, 1] == 1.0 and adj[0, 0, 1, 0] == 1.0
    assert edge_idx == 1  # edge steps consumed by atoms 0,1 = 0 + 1


def test_prop_opt_ppo_iterations(pretrained_df):
    df = pretrained_df
    df.train_prop_opt(prop="plogp", n_iters=3, batch_size=3,
                      temperature=(0.8, 0.3),
                      rl_conf={"update_iters": 2, "no_baseline": False},
                      seed=0)
    hist = df.rl_history
    assert len(hist) == 3
    assert all(np.isfinite(h["loss"]) for h in hist)
    # the fine-tuned model still generates
    mols, _ = df.run_rand_gen(n_mols=2, temperature=(0.5, 0.5))
    assert len(mols) == 2


def test_const_prop_opt_improvement_metric(pretrained_df):
    df = pretrained_df
    seeds = [mol_from_smiles(s) for s in ("CCO", "CCC")]
    df.train_const_prop_opt(seeds, n_iters=2, batch_size=4,
                            sim_threshold=0.0, seed=1,
                            rl_conf={"modify_size": 2})
    assert hasattr(df, "const_results")
    assert set(df.const_results) == {0, 1}
    for imp, mol in df.const_results.values():
        assert np.isfinite(imp)


def test_batchnorm_running_stats():
    from dig_tpu.ggraph.models.graphdf import BatchNormEmb
    bn = BatchNormEmb(momentum=0.5)
    h = jnp.asarray(np.random.default_rng(0).normal(
        3.0, 2.0, (4, 5, 8)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), h)
    assert "batch_stats" in variables
    # train mode: batch statistics, running stats updated
    out, mut = bn.apply(variables, h, mutable=["batch_stats"])
    assert abs(float(out.mean())) < 1e-4
    new_mean = mut["batch_stats"]["mean"]
    assert float(jnp.abs(new_mean).max()) > 0.5   # moved toward ~3
    # eval mode: running averages, no mutation needed
    v2 = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    out_eval = bn.apply(v2, h, use_running_average=True)
    assert float(jnp.abs(out_eval.mean())) > 0.1  # not batch-normalized
