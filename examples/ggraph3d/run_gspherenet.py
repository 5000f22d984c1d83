"""G-SphereNet 3D molecular generation: train the autoregressive flow on
per-step placement supervision, generate molecules as one on-device
lax.scan, evaluate bond-based validity and MMD (reference
examples/ggraph3D/G_SphereNet)."""
from dig_tpu.ggraph3d import (GSphereNet, QM93DGEN, RandGenEvaluator3D)

ds = QM93DGEN(num_steps_per_batch=16)
gs = GSphereNet(num_node_types=4, hidden=48, num_flow_layers=3)
hist = gs.train(ds.loader(), lr=1e-3, max_epochs=5, verbose=True)

samples = gs.generate([6, 7, 8, 9], num_gen=20, max_atoms=9)
ev = RandGenEvaluator3D()
res = ev.eval_validity({"mol_dicts": samples})
print(f"generated {len(samples)} molecules; "
      f"bond-table validity {res['valid_ratio']:.1f}%")
