"""SphereNet on QM9-U0 — the BASELINE flagship config (reference
docs/source/tutorials/threedgraph.rst:33-62). Falls back to synthetic
molecules when the QM9 cache is absent."""
import argparse

from dig_tpu.datasets import MoleculeLoader, synthetic_molecules
from dig_tpu.models import SphereNet
from dig_tpu.threed import Run3D, ThreeDEvaluator

parser = argparse.ArgumentParser()
parser.add_argument("--root", default="dataset/")
parser.add_argument("--target", default="U0")
parser.add_argument("--epochs", type=int, default=20)
parser.add_argument("--batch_size", type=int, default=32)
parser.add_argument("--lr", type=float, default=5e-4)
parser.add_argument("--save_dir", default="")
args = parser.parse_args()

try:
    from dig_tpu.datasets import QM93D
    from dig_tpu.datasets.qm9 import TARGETS
    ds = QM93D(root=args.root)
    split = ds.get_idx_split(len(ds), 110000, 10000, seed=42)
    ti = TARGETS.index(args.target)
    def pick(idx):
        out = []
        for i in idx:
            m = ds[int(i)]
            out.append({"z": m["z"], "pos": m["pos"], "y": m["y"][ti:ti+1]})
        return out
    train, valid, test = pick(split["train"]), pick(split["valid"]), pick(split["test"])
except FileNotFoundError:
    print("QM9 cache missing; using synthetic molecules")
    mols = synthetic_molecules(512, seed=0, num_targets=1)
    train, valid, test = mols[:384], mols[384:448], mols[448:]

model = SphereNet(cutoff=5.0, num_layers=4, hidden_channels=128,
                  num_spherical=3, num_radial=6)
res = Run3D().run(train, valid, test, model, ThreeDEvaluator(),
                  epochs=args.epochs, batch_size=args.batch_size,
                  lr=args.lr, lr_decay_factor=0.5, lr_decay_step_size=15,
                  save_dir=args.save_dir)
print(f"best valid MAE {res['best_valid']:.5f}  test MAE {res['best_test']:.5f}")
