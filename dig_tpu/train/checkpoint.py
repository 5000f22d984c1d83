"""Unified checkpointing via orbax — replaces the reference's scattered
``torch.save`` dicts (``run.py:87-93``, ``graphdf.py:86-88``,
``contrastive.py:190-217``) with one checkpointer shared by all trainers,
plus partial restore for pretrain->finetune flows
(``graphdf.py:36-41``-style ``load_pretrain_model``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: Any, step: int, metrics: Optional[Dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if template is not None:
            return self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()


def partial_restore(params, restored) -> Any:
    """Copy matching leaves from ``restored`` into ``params`` (key-wise),
    for pretrain->finetune partial loads."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    out = []
    for path, leaf in flat_p:
        cand = flat_r.get(path)
        if cand is not None and getattr(cand, "shape", None) == leaf.shape:
            out.append(cand)
        else:
            out.append(leaf)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, out)
