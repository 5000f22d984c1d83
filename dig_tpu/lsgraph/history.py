"""Historical embedding tables, functional.

Parity with ``dig/lsgraph/method/GraphFMOB/history.py:7-67`` (pinned-CPU
``History.pull/push``) and ``dig/lsgraph/method/FM.py:11-75``
(FeatureMomentum): here tables are device arrays threaded through the
jitted train step — push/pull are gather/scatter, and XLA overlaps them
with compute (the AsyncIOPool role, ``pool.py:14-128``)."""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class History(NamedTuple):
    """emb: [num_nodes, dim] historical embeddings."""

    emb: jnp.ndarray

    @classmethod
    def create(cls, num_embeddings: int, dim: int,
               dtype=jnp.float32) -> "History":
        return cls(emb=jnp.zeros((num_embeddings, dim), dtype))

    def pull(self, n_id: jnp.ndarray) -> jnp.ndarray:
        return self.emb[n_id]

    def push(self, x: jnp.ndarray, n_id: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> "History":
        if mask is not None:
            x = jnp.where(mask[:, None], x, self.emb[n_id])
        return History(emb=self.emb.at[n_id].set(x))


class FeatureMomentum(NamedTuple):
    """GraphFM-OB momentum history (FM.py:67-70): when a fresh boundary
    estimate x~ exists for an out-of-batch node, the stored history becomes
    gamma * x~ + (1 - gamma) * hist."""

    emb: jnp.ndarray
    gamma: float

    @classmethod
    def create(cls, num_embeddings: int, dim: int, gamma: float = 0.9,
               dtype=jnp.float32) -> "FeatureMomentum":
        return cls(emb=jnp.zeros((num_embeddings, dim), dtype), gamma=gamma)

    def pull(self, n_id: jnp.ndarray) -> jnp.ndarray:
        return self.emb[n_id]

    def push(self, x: jnp.ndarray, n_id: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> "FeatureMomentum":
        """In-batch rows overwrite history (exact values)."""
        if mask is not None:
            x = jnp.where(mask[:, None], x, self.emb[n_id])
        return FeatureMomentum(emb=self.emb.at[n_id].set(x),
                               gamma=self.gamma)

    def push_momentum(self, x_tilde: jnp.ndarray, n_id: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None
                      ) -> "FeatureMomentum":
        """Boundary rows blend with momentum (FM.py:67-70)."""
        old = self.emb[n_id]
        new = self.gamma * x_tilde + (1.0 - self.gamma) * old
        if mask is not None:
            new = jnp.where(mask[:, None], new, old)
        return FeatureMomentum(emb=self.emb.at[n_id].set(new),
                               gamma=self.gamma)
