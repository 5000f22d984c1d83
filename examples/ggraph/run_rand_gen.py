"""GraphDF random generation (reference examples/ggraph/GraphDF/run_rand_gen.py,
JSON config surface preserved via dig_tpu.Config)."""
import argparse

from dig_tpu import Config
from dig_tpu.ggraph import (DenseMolLoader, GraphDF, RandGenEvaluator,
                            synthetic_smiles_dataset)

parser = argparse.ArgumentParser()
parser.add_argument("--config", default="")
parser.add_argument("--train", action="store_true")
parser.add_argument("--num_mols", type=int, default=100)
args = parser.parse_args()

conf = (Config.load(args.config) if args.config else Config.from_dict({
    "model": {"max_size": 9, "edge_unroll": 4, "node_dim": 4, "bond_dim": 4,
              "num_flow_layer": 6, "num_rgcn_layer": 3,
              "nhid": 128, "nout": 128},
    "lr": 1e-3, "weight_decay": 0.0, "max_epochs": 10, "batch_size": 32,
    "temperature": [0.3, 0.3], "atom_list": [6, 7, 8, 9],
}))

ds = synthetic_smiles_dataset(repeat=8)
loader = DenseMolLoader(ds, conf.batch_size, shuffle=True)
runner = GraphDF()
runner.train_rand_gen(loader, conf.lr, conf.weight_decay, conf.max_epochs,
                      dict(conf.model))
mols, pure = runner.run_rand_gen(n_mols=args.num_mols,
                                 atomic_num_list=conf.atom_list,
                                 temperature=tuple(conf.temperature))
RandGenEvaluator().eval({"mols": mols, "train_smiles": ds.smiles})
